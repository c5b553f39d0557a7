package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("audit reports one row per rule, in order, with exact counts") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq((10L, 1L), (11L, 1L), (12L, 7L), (13L, 8L))
      .toDF("id", "fk")
    val report = Quality.audit(Seq(
      "orphans" -> Quality.orphans(child, parent, "fk", "pk"),
      "clean" -> child.where(col("id") < 0)))
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(report === List(("orphans", 2L), ("clean", 0L)))
  }

  test("orphans: null FKs are not violations (SQL FK semantics)") {
    val parent = Seq(1L).toDF("pk")
    val child = Seq((10L, Some(1L)), (11L, None), (12L, Some(9L)))
      .toDF("id", "fk")
    val got = Quality.orphans(child, parent, "fk", "pk")
      .select("id").as[Long].collect().toSet
    assert(got === Set(12L))
  }

  test("duplicateKeys reports multiplicity for duplicated keys only") {
    val df = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (3L, "e"),
      (3L, "f")).toDF("k", "v")
    val got = Quality.duplicateKeys(df, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 3L -> 3L))
  }
}

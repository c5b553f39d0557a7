package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "name", "v")

  test("all four row fates in one merge: update, delete, insert, keep") {
    // k=1 update (v→99), k=2 delete (flag), k=9 insert, k=3/4 untouched
    val source = Seq((1L, 99.0, false), (2L, 0.0, true), (9L, 77.0, false))
      .toDF("k", "nv", "del")
    val got = MergeInto.mergeInto(target, source, Seq("k"),
        updates = Map("v" -> col("src_nv")),
        inserts = Map("v" -> col("src_nv"), "name" -> lit("new")),
        deleteWhen = Some(col("src_del")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === Set(
      (1L, "a", 99.0),   // updated, non-updated col kept
      (3L, "c", 30.0), (4L, "d", 40.0), // target-only verbatim
      (9L, "new", 77.0)  // inserted
    ))
  }

  test("insert without a column mapping defaults to null; keys always fill") {
    val source = Seq((9L, 5.0)).toDF("k", "nv")
    val row = MergeInto.mergeInto(target, source, Seq("k"),
        updates = Map.empty, inserts = Map("v" -> col("src_nv")))
      .where(col("k") === 9L).collect().head
    assert(row.getLong(0) == 9L && row.isNullAt(1) && row.getDouble(2) == 5.0)
  }

  test("duplicate source keys are rejected (ambiguous merge)") {
    val dup = Seq((1L, 1.0), (1L, 2.0)).toDF("k", "nv")
    intercept[IllegalArgumentException] {
      MergeInto.mergeInto(target, dup, Seq("k"),
        updates = Map("v" -> col("src_nv")), inserts = Map.empty)
    }
  }

  test("merge with no matches is pure append; with no source is identity") {
    val disjoint = Seq((8L, 1.0)).toDF("k", "nv")
    assert(MergeInto.mergeInto(target, disjoint, Seq("k"),
      updates = Map.empty, inserts = Map("v" -> col("src_nv"))).count() == 5)
    val empty = Seq.empty[(Long, Double)].toDF("k", "nv")
    val out = MergeInto.mergeInto(target, empty, Seq("k"),
        updates = Map("v" -> col("src_nv")), inserts = Map.empty)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out === Set((1L, "a", 10.0), (2L, "b", 20.0),
      (3L, "c", 30.0), (4L, "d", 40.0)))
  }
}

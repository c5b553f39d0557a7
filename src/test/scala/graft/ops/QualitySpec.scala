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

  test("tableChecksum: order/partition-invariant; any cell change detected") {
    val rows = (1 to 300).map(i => (i.toLong, s"name$i", i * 7 % 13))
    val a = Quality.tableChecksum(
      rows.toDF("id", "name", "x").repartition(1), Seq("id", "name", "x"))
      .collect().head
    val b = Quality.tableChecksum(
      scala.util.Random.shuffle(rows).toDF("id", "name", "x")
        .repartition(17), Seq("id", "name", "x"))
      .collect().head
    assert(a == b, "row order and partitioning must not matter")
    val mutated = rows.updated(150, (151L, "nameX", 151 * 7 % 13))
    val c = Quality.tableChecksum(
      mutated.toDF("id", "name", "x"), Seq("id", "name", "x")).collect().head
    assert(a != c, "single-cell change must flip the signature")
  }

  test("tableChecksum: sum_sig catches the double+drop swap XOR misses") {
    // {r1, r1} vs {r2, r2}: every even-multiplicity row XORs to 0, so
    // xor_sig ties (0 = 0) even though the tables share no rows at all —
    // sum_sig differs, the documented reason for carrying both signatures
    val d1 = Seq((1L, "a"), (1L, "a")).toDF("id", "v")
    val d2 = Seq((2L, "b"), (2L, "b")).toDF("id", "v")
    val s1 = Quality.tableChecksum(d1, Seq("id", "v")).collect().head
    val s2 = Quality.tableChecksum(d2, Seq("id", "v")).collect().head
    assert(s1.getAs[Long]("xor_sig") == s2.getAs[Long]("xor_sig"))
    assert(s1.getAs[Long]("sum_sig") != s2.getAs[Long]("sum_sig"))
  }

  test("inclusionProfile: full, partial, and null-excluded candidates") {
    import spark.implicits._
    val fk = Seq(Some(1L), Some(2L), Some(2L), Some(9L), None).toDF("f")
    val pk = Seq(1L, 2L, 3L).toDF("p")
    val out = Quality.inclusionProfile(Seq(
        ("full", pk, "p", pk, "p"),
        ("partial", fk, "f", pk, "p")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("full") == ((3L, 0L, 1.0)))
    // distinct non-null fk values {1,2,9}; 9 unmatched → 2/3
    assert(out("partial") == ((3L, 1L, 0.666667)))
  }

  test("fdViolations: holding FD reports zero, violated FD counts groups and rows") {
    import spark.implicits._
    val t = Seq((1L, "a", 10L), (1L, "a", 11L), (2L, "b", 20L),
      (2L, "c", 21L), (2L, "c", 22L)).toDF("x", "y", "z")
    val out = Quality.fdViolations(Seq(
        ("x->y holds? no", t, Seq("x"), "y"),
        ("(x,y)->? z", t, Seq("x", "y"), "z"),
        ("x determines x", t, Seq("x"), "x")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // x=2 carries y∈{b,c} → 1 violating group spanning 3 rows
    assert(out("x->y holds? no") == ((1L, 3L)))
    // (1,a)→{10,11} and (2,c)→{21,22} violate z-determinism: 2+2 rows
    assert(out("(x,y)->? z") == ((2L, 4L)))
    assert(out("x determines x") == ((0L, 0L)))
  }

  test("bucketDiff: classifies only_a/only_b/differs; identical replicas → empty") {
    import spark.implicits._
    val a = Seq((1L, "x", 10.0), (2L, "y", 20.0), (3L, "z", 30.0),
      (4L, "w", 40.0)).toDF("k", "s", "v")
    val b = Seq((1L, "x", 10.0), (2L, "y", 99.0), (5L, "q", 50.0),
      (4L, "w", 40.0)).toDF("k", "s", "v") // 3 missing, 2 changed, 5 added
    val diff = Quality.bucketDiff(a, b, Seq("k"), Seq("s", "v"), buckets = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff == Map(3L -> "only_a", 2L -> "differs", 5L -> "only_b"))
    assert(Quality.bucketDiff(a, a, Seq("k"), Seq("s", "v"), 8).isEmpty)
  }
}

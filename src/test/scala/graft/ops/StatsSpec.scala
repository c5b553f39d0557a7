package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stats operators: Welch's t-test against hand-computed values, PSI
  * drift against a driver-side fold, RFM ntile semantics (bucket sizes
  * and deterministic tiebreaks).
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("welchTTest reproduces the textbook two-sample computation") {
    // group a: 1.0 2.0 3.0 4.0 ; group b: 2.0 4.0 6.0
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0)).toDF("g", "x")
    val r = Stats.welchTTest(df, "g", "x", "a", "b").collect().head
    val m1 = 2.5; val m2 = 4.0
    val v1 = 5.0 / 3.0; val v2 = 4.0
    val se2 = v1 / 4 + v2 / 3
    val t = (m1 - m2) / math.sqrt(se2)
    val dfW = se2 * se2 /
      ((v1 / 4) * (v1 / 4) / 3 + (v2 / 3) * (v2 / 3) / 2)
    assert(r.getAs[Long]("n1") == 4 && r.getAs[Long]("n2") == 3)
    assert(math.abs(r.getAs[Double]("mean_a") - m1) < 1e-6)
    assert(math.abs(r.getAs[Double]("var_a") - v1) < 1e-6)
    assert(math.abs(r.getAs[Double]("var_b") - v2) < 1e-6)
    assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-6)
    assert(math.abs(r.getAs[Double]("df") - dfW) < 1e-6)
  }

  test("welchTTest quantization makes the result partition-invariant") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 2000).map(i =>
      (if (i % 2 == 0) "a" else "b", rnd.nextInt(50000) / 100.0))
    val df1 = rows.toDF("g", "x").repartition(1)
    val df32 = rows.toDF("g", "x").repartition(32)
    val a = Stats.welchTTest(df1, "g", "x", "a", "b").collect().head
    val b = Stats.welchTTest(df32, "g", "x", "a", "b").collect().head
    assert(a == b, "t-test must not depend on partitioning")
  }

  test("psiDrift: identical slices score ~0, a shifted slice scores high") {
    val base = (1 to 500).map(i => ("same1", (i % 100).toDouble)) ++
      (1 to 500).map(i => ("same2", (i % 100).toDouble)) ++
      (1 to 500).map(i => ("shifted", 400.0 + (i % 100)))
    val out = Stats.psiDrift(base.toDF("s", "x"), "s", "x",
      lo = 0.0, hi = 500.0, bins = 10)
      .collect().map(r => r.getAs[String]("slice") -> r.getAs[Double]("psi"))
      .toMap
    // same1/same2 each match two-thirds of the population mass exactly;
    // the drift score separates them from the disjoint-support slice
    assert(out("same1") == out("same2"), "symmetric slices must tie")
    assert(out("shifted") > 1.0, s"disjoint slice must score high: $out")
    assert(out("same1") < out("shifted") / 2)
  }

  test("psiDrift folds bins in order — repartition-invariant") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 3000).map(i =>
      (s"s${i % 4}", rnd.nextInt(600).toDouble))
    val a = Stats.psiDrift(rows.toDF("s", "x").repartition(1), "s", "x",
      0.0, 600.0, 10).collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    val b = Stats.psiDrift(rows.toDF("s", "x").repartition(17), "s", "x",
      0.0, 600.0, 10).collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(a == b)
  }

  test("rfm: ntile bucket sizes follow the SQL rule and scores invert") {
    // 7 customers, distinct on every metric → ntile(5) buckets sized
    // 2,2,1,1,1 (first N mod q buckets get the extra row)
    val orders = (1 to 7).flatMap { c =>
      (1 to c).map(i => (c.toLong, java.sql.Date.valueOf(f"2024-01-${c}%02d"), 100.0 * c + i))
    }
    val out = Stats.rfm(orders.toDF("cust", "d", "amt"), "cust", "d", "amt")
      .collect().map(r => r.getAs[Long]("custkey") ->
        (r.getAs[Long]("r_score"), r.getAs[Long]("f_score"),
          r.getAs[Long]("m_score"), r.getAs[String]("segment"))).toMap
    // customer 7: latest date, most orders, highest spend → all 5s
    assert(out(7L) == ((5L, 5L, 5L, "555")))
    // customer 1: oldest, fewest, least → rank 7 of 7 → 5th ntile bucket
    // (sizes 2,2,1,1,1) → score 6-5 = 1
    assert(out(1L) == ((1L, 1L, 1L, "111")))
    // customers 7,6 share the top bucket on every metric
    assert(out(6L)._1 == 5L && out(6L)._2 == 5L && out(6L)._3 == 5L)
    assert(out.values.map(_._1).toSeq.sorted ==
      Seq(1L, 2L, 3L, 4L, 4L, 5L, 5L))
  }
}

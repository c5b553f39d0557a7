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

  test("ksTest: hand-computed D and earliest argmax value") {
    // a: 1 2 3 4, b: 3 4 5 6 — ECDF gap is 0.5 at x ∈ {2,3,4}; the
    // reported location is the LOWEST such value
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 3.0), ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "x")
    val r = Stats.ksTest(df, "g", "x", "a", "b").collect().head
    assert(r.getAs[Long]("n1") == 4 && r.getAs[Long]("n2") == 4)
    assert(r.getAs[Double]("d_stat") == 0.5)
    assert(r.getAs[Double]("d_at") == 2.0)
  }

  test("ksTest: identical samples give D = 0; result partition-invariant") {
    val rnd = new scala.util.Random(3)
    val same = (1 to 800).flatMap { _ =>
      val v = rnd.nextInt(1000) / 10.0; Seq(("a", v), ("b", v))
    }
    assert(Stats.ksTest(same.toDF("g", "x"), "g", "x", "a", "b")
      .collect().head.getAs[Double]("d_stat") == 0.0)
    val mixed = (1 to 1500).map(i =>
      (if (i % 3 == 0) "a" else "b", rnd.nextInt(500) / 7.0))
    val p1 = Stats.ksTest(mixed.toDF("g", "x").repartition(1),
      "g", "x", "a", "b").collect().head
    val p32 = Stats.ksTest(mixed.toDF("g", "x").repartition(32),
      "g", "x", "a", "b").collect().head
    assert(p1 == p32)
  }

  test("mannWhitneyU: tied ranks averaged, tie-corrected z") {
    // a: 1 2 3, b: 2 3 4 → ranks 1, 2.5, 2.5, 4.5, 4.5, 6
    // R1 = 1 + 2.5 + 4.5 = 8 → U1 = 8 − 6 = 2; ties Σ(t³−t) = 12
    // σ² = (9/12)·(7 − 12/30) = 4.95; z = (2 − 4.5)/√4.95
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 4.0)).toDF("g", "x")
    val r = Stats.mannWhitneyU(df, "g", "x", "a", "b").collect().head
    assert(r.getAs[Long]("n1") == 3 && r.getAs[Long]("n2") == 3)
    assert(r.getAs[Double]("u_stat") == 2.0)
    assert(math.abs(r.getAs[Double]("z") - (-2.5 / math.sqrt(4.95))) < 1e-6)
  }

  test("mannWhitneyU: symmetric samples give U = n1·n2/2 and z = 0") {
    val df = Seq(("a", 1.0), ("a", 4.0), ("b", 2.0), ("b", 3.0))
      .toDF("g", "x")
    val r = Stats.mannWhitneyU(df, "g", "x", "a", "b").collect().head
    // R1 = 1 + 4 = 5, U1 = 5 − 3 = 2 = n1·n2/2 → z = 0
    assert(r.getAs[Double]("u_stat") == 2.0)
    assert(r.getAs[Double]("z") == 0.0)
  }

  test("liftGains: two-bucket hand check (rates, gains, lift)") {
    // scores 10..1; top-5 rows hold 4 of the 5 positives
    val rows = (1 to 10).map(i =>
      (i.toLong, (11 - i).toDouble, i <= 4 || i == 10))
    val out = Stats.liftGains(rows.toDF("id", "score", "y"),
        "id", "score", "y", buckets = 2)
      .collect().map(r => r.getAs[Int]("bucket") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("pos"), r.getAs[Double]("rate"),
          r.getAs[Double]("cum_gain"), r.getAs[Double]("lift")))).toMap
    assert(out(1) == ((5L, 4L, 0.8, 0.8, 1.6)))
    assert(out(2) == ((5L, 1L, 0.2, 1.0, 1.0)))
  }

  test("bootstrapMeanCI: brackets the mean, deterministic across runs") {
    val rows = (1 to 500).map(i => (s"d$i", 50.0 + (i % 100)))
    val df = rows.toDF("id", "x")
    val a = Stats.bootstrapMeanCI(df, "id", "x", resamples = 100)
      .collect().head
    assert(a.getAs[Long]("n") == 500 && a.getAs[Int]("n_resamples") == 100)
    val mean = a.getAs[Double]("mean")
    assert(math.abs(mean - (50.0 + 99.0 / 2 + 0.3)) < 1.0) // ≈ mean of 50..149
    assert(a.getAs[Double]("ci_lo") <= mean && mean <= a.getAs[Double]("ci_hi"))
    assert(a.getAs[Double]("ci_lo") < a.getAs[Double]("ci_hi"))
    // hash-derived weights: same result on any partitioning, every run
    val b = Stats.bootstrapMeanCI(df.repartition(23), "id", "x", 100)
      .collect().head
    assert(a == b)
  }

  test("winsorizedMean: clamps exactly at the percentile band") {
    // group g: 1..10 plus outlier 1000; p10/p90 of {1..10,1000} cents
    val vals = ((1 to 10).map(_.toDouble) :+ 1000.0).map(("g", _))
    val r = Stats.winsorizedMean(vals.toDF("k", "v"), "k", "v",
      pLo = 0.1, pHi = 0.9).collect().head
    // cents sorted: 100..1000(, 100000); p10 = interp(idx 1.0) = 200,
    // p90 = interp(idx 9.0) = 1000 ⇒ clamp 100000→1000, 100→200
    assert(r.getAs[Double]("p_lo") == 2.0 && r.getAs[Double]("p_hi") == 10.0)
    // clamped: 2,2,3,4,5,6,7,8,9,10,10 → mean 66/11 = 6.0
    assert(r.getAs[Double]("winsorized_mean") == 6.0)
    assert(r.getAs[Long]("n") == 11)
  }

  test("winsorizedMean: integral clamped sum is partition-invariant") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 4000).map(i =>
      (s"g${i % 3}", rnd.nextInt(100000) / 100.0))
    val a = Stats.winsorizedMean(rows.toDF("k", "v").repartition(1), "k", "v")
      .collect().sortBy(_.getString(0)).toSeq
    val b = Stats.winsorizedMean(rows.toDF("k", "v").repartition(29), "k", "v")
      .collect().sortBy(_.getString(0)).toSeq
    assert(a == b)
  }

  test("theilSen: median pairwise slope resists a wild outlier") {
    // y = 3x + noise-free except one spike; OLS would bend, Theil–Sen not
    val pts = (1 to 21).map(x => ("g", x.toLong,
      if (x == 11) 10000L else 3L * x))
    val r = Stats.theilSen(pts.toDF("k", "x", "y"), "k", "x", "y")
      .collect().head
    assert(r.getAs[Long]("n_pairs") == 210)
    assert(r.getAs[Double]("trend") == 3.0,
      s"outlier must not move the median slope: ${r}")
  }

  test("targetEncode: leave-one-out with smoothing, hand-checked") {
    // cat "a": rows y=1,1,0 ; cat "b": rows y=0,0 ; prior = 2/5, m = 10
    val df = Seq((1L, "a", true), (2L, "a", true), (3L, "a", false),
      (4L, "b", false), (5L, "b", false)).toDF("id", "c", "y")
    val out = Stats.targetEncode(df, "id", "c", "y", smoothing = 10)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("enc"))
      .toMap
    val prior = 2.0 / 5
    // row 1 (a, y=1): (2−1 + 10·prior)/(3−1+10) = 5/12
    assert(math.abs(out(1L) - (1 + 10 * prior) / 12) < 1e-6)
    // row 3 (a, y=0): (2−0 + 10·prior)/12 = 6/12
    assert(math.abs(out(3L) - (2 + 10 * prior) / 12) < 1e-6)
    // row 4 (b, y=0): (0−0 + 10·prior)/(2−1+10) = 4/11
    assert(math.abs(out(4L) - 10 * prior / 11) < 1e-6)
    // leakage check: rows 1 and 3 share a category but get DIFFERENT
    // encodings because each excludes its own label
    assert(out(1L) != out(3L))
  }

  test("keySkew: uniform keys ≈ 0, one hot key dominates; exact Gini") {
    // counts 1,1,1,1 → Gini 0
    val uniform = (1 to 4).map(k => (k.toLong, "r")).toDF("k", "v")
    val u = Stats.keySkew(uniform, "k").collect().head
    assert(u.getAs[Long]("n_keys") == 4 && u.getAs[Double]("gini") == 0.0)
    // counts sorted 1,1,2,6: Σ(2i−n−1)x = (−3)·1+(−1)·1+1·2+3·6 = 16
    // Gini = 16/(4·10) = 0.4 ; top_share = 0.6
    val skew = (Seq.fill(6)(9L) ++ Seq(7L, 7L, 5L, 3L)).map((_, "r"))
      .toDF("k", "v")
    val s = Stats.keySkew(skew, "k").collect().head
    assert(s.getAs[Double]("gini") == 0.4)
    assert(s.getAs[Double]("top_share") == 0.6)
  }

  test("edge cases: absent group → empty result, not a crash") {
    val df = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "x")
    assert(Stats.ksTest(df, "g", "x", "a", "missing").count() == 0)
    assert(Stats.mannWhitneyU(df, "g", "x", "a", "missing").count() == 0)
    assert(Stats.welchTTest(df, "g", "x", "a", "missing").count() == 0)
  }

  test("edge cases: keySkew single key; winsorized degenerate band") {
    val one = Seq((7L, "r"), (7L, "r"), (7L, "r")).toDF("k", "v")
    val s = Stats.keySkew(one, "k").collect().head
    assert(s.getAs[Long]("n_keys") == 1 && s.getAs[Double]("gini") == 0.0
      && s.getAs[Double]("top_share") == 1.0)
    // all-equal values: percentile band collapses to the point, mean = it
    val const = Seq.fill(50)(("g", 42.0)).toDF("k", "v")
    val w = Stats.winsorizedMean(const, "k", "v").collect().head
    assert(w.getAs[Double]("winsorized_mean") == 42.0)
    assert(w.getAs[Double]("p_lo") == 42.0 && w.getAs[Double]("p_hi") == 42.0)
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

  test("kaplanMeier: textbook hand-worked curve with censoring") {
    import spark.implicits._
    // durations (event=1, censored=0): 1+, 2, 2, 3+, 4  (+ = censored)
    // t=2: n=4, d=2 → S=0.5 ; t=4: n=1, d=1 → S=0.0
    val subj = Seq((1L, 0L), (2L, 1L), (2L, 1L), (3L, 0L), (4L, 1L))
      .toDF("dur", "ev")
    val km = Stats.kaplanMeier(subj, "dur", "ev")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq.sortBy(_._1)
    assert(km == Seq((2L, 4L, 2L, 0.5), (4L, 1L, 1L, 0.0)))
  }

  test("kaplanMeier: no censoring → survival is the empirical tail; partition-invariant") {
    import spark.implicits._
    val subj = Seq(1L, 2L, 3L, 4L).map((_, 1L)).toDF("dur", "ev")
    val km = Stats.kaplanMeier(subj, "dur", "ev")
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq.sortBy(_._1)
    assert(km == Seq((1L, 0.75), (2L, 0.5), (3L, 0.25), (4L, 0.0)))
    val km7 = Stats.kaplanMeier(subj.repartition(7), "dur", "ev")
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq.sortBy(_._1)
    assert(km7 == km)
  }
}

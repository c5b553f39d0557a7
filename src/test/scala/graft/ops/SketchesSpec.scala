package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  test("hllDistinct estimates within documented error; sketches union losslessly") {
    import spark.implicits._
    // 3 groups with known distinct counts 1000 / 5000 / 1 (plus repeats)
    val rows = (1 to 1000).map(i => ("a", s"u$i")) ++
      (1 to 5000).flatMap(i => Seq(("b", s"v$i"), ("b", s"v$i"))) ++
      Seq.fill(100)(("c", "only"))
    val df = rows.toDF("g", "u").repartition(8)
    val est = Sketches.hllDistinct(df, Seq("g"), "u")
      .select("g", "estimate").as[(String, Double)].collect().toMap
    assert(math.abs(est("a") - 1000) / 1000.0 < 0.05, s"a: ${est("a")}")
    assert(math.abs(est("b") - 5000) / 5000.0 < 0.05, s"b: ${est("b")}")
    assert(est("c") == 1.0)
  }

  test("hllRollup: daily sketches union to the month's true distinct estimate") {
    import spark.implicits._
    // users overlap across days — summing daily distincts would overcount;
    // the union must see through the overlap
    val rows = for { day <- 1 to 10; u <- 1 to 2000 } yield (s"d$day", s"user$u")
    val daily = Sketches.hllDistinct(rows.toDF("day", "u").repartition(8),
      Seq("day"), "u")
    // every day has the SAME 2000 users: month distinct = 2000, not 20000
    val month = Sketches.hllRollup(daily.withColumn("month", lit("m1")),
      Seq("month"))
      .select("estimate").as[Double].head()
    assert(math.abs(month - 2000) / 2000.0 < 0.05, s"month estimate: $month")
  }

  test("count-min sketch heavy hitters: skewed keys found, counts within bound") {
    import spark.implicits._
    // zipf-ish: key k appears ~ 10000/k times — the hot keys a 100 TB
    // GROUP BY would need to know about BEFORE shuffling (salting
    // decisions); count-min answers point queries in sub-linear space
    val rows = (1 to 50).flatMap(k => Seq.fill(10000 / k)(s"key$k"))
    val df = rows.toDF("k").repartition(8)
    val eps = 0.001; val conf = 0.99
    val cms = df.stat.countMinSketch(col("k"), eps, conf, seed = 42)
    val n = rows.length.toLong
    assert(cms.totalCount() == n)
    // CMS guarantees estimate >= true, and <= true + eps*N w.p. conf
    for (k <- Seq(1, 2, 10, 50)) {
      val truth = 10000 / k
      val est = cms.estimateCount(s"key$k")
      assert(est >= truth, s"key$k: $est < $truth")
      assert(est <= truth + (eps * n).toLong + 1, s"key$k overestimate: $est vs $truth")
    }
    // mergeable: two half-sketches union to the full answer
    val Array(h1, h2) = df.randomSplit(Array(0.5, 0.5), seed = 7)
    val m = h1.stat.countMinSketch(col("k"), eps, conf, seed = 42)
      .mergeInPlace(h2.stat.countMinSketch(col("k"), eps, conf, seed = 42))
    assert(m.totalCount() == n)
    assert(m.estimateCount("key1") >= 10000)
  }

  test("approxPercentiles tracks exact percentiles at high accuracy") {
    import spark.implicits._
    val df = (1 to 10001).map(i => ("g", i.toDouble)).toDF("g", "v")
      .repartition(8)
    val ps = Sketches.approxPercentiles(df, Seq("g"), col("v"), Seq(0.5, 0.9))
      .select("percentiles").as[Seq[Double]].head()
    assert(math.abs(ps(0) - 5001.0) <= 10, s"p50: ${ps(0)}")
    assert(math.abs(ps(1) - 9001.0) <= 10, s"p90: ${ps(1)}")
  }

  test("joinSizeEstimate: never under, tight with enough buckets, merge-safe") {
    import spark.implicits._
    // skewed: key "hot" appears 100× on A and 50× on B — true join size
    // is dominated by the hot key's 5000-row blowup
    val a = ((1 to 100).map(_ => "hot") ++ (1 to 40).map(i => s"a$i"))
      .toDF("k")
    val b = ((1 to 50).map(_ => "hot") ++ (1 to 20).map(i => s"a$i"))
      .toDF("k")
    val exact = a.join(b, "k").count()
    assert(exact == 100L * 50 + 20) // hot blowup + 20 singleton matches
    val est = graft.ops.Sketches.joinSizeEstimate(a, col("k"), b, col("k"))
    assert(est >= exact, s"CM inner product must never underestimate: $est")
    assert(est <= (exact * 1.2).toLong, s"estimate too loose: $est vs $exact")
    // disjoint keys → near-zero estimate (collisions only)
    val c = (1 to 30).map(i => s"z$i").toDF("k")
    val estDisjoint = graft.ops.Sketches.joinSizeEstimate(a, col("k"), c, col("k"))
    assert(estDisjoint <= exact / 10, s"disjoint estimate: $estDisjoint")
  }
}

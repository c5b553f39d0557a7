package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property tests for the mergeable sketch tables: the CMS one-sided
  * error contract, merge ≡ rebuild (the semilattice property that makes
  * per-day sketches roll up), and the HLL standard-error bound. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"
  private def events = spark.read.parquet(s"$dir/events.parquet")
    .select(col("user_id"))

  test("CMS never underestimates, and is exact when width dwarfs keys") {
    val truth = events.groupBy("user_id").agg(count(lit(1)).as("t"))
    val sketch = Sketches.cmsBuild(events, "user_id", depth = 4, width = 512)
    val est = Sketches.cmsEstimate(truth, sketch, "user_id", 4, 512)
    val joined = est.join(truth, "user_id")
      .select(col("est"), col("t")).collect()
    assert(joined.nonEmpty)
    assert(joined.forall(r => r.getLong(0) >= r.getLong(1)),
      "CMS must be a one-sided overestimate")
    // 150 keys into width 8192: collisions are vanishing → exact
    val wide = Sketches.cmsBuild(events, "user_id", depth = 4, width = 8192)
    val est2 = Sketches.cmsEstimate(truth, wide, "user_id", 4, 8192)
    val j2 = est2.join(truth, "user_id").where(col("est") =!= col("t")).count()
    assert(j2 == 0, s"$j2 keys collided at width 8192 over 150 keys")
  }

  test("CMS merge of day-split sketches equals the whole-corpus sketch") {
    val a = events.limit(4000)
    val b = events.exceptAll(a)
    val merged = Sketches.cmsMerge(Seq(
      Sketches.cmsBuild(a, "user_id", 4, 512),
      Sketches.cmsBuild(b, "user_id", 4, 512)))
    val whole = Sketches.cmsBuild(events, "user_id", 4, 512)
    assert(merged.exceptAll(whole).count() == 0 &&
      whole.exceptAll(merged).count() == 0,
      "sum-merge must equal the single-pass sketch")
  }

  test("HLL estimate lands within 3 standard errors; merge = rebuild") {
    val exact = events.distinct().count()
    val regs = Sketches.hllBuild(events, "user_id", b = 9)
    val est = Sketches.hllEstimate(regs, b = 9).head.getDouble(2)
    val se = 1.04 / math.sqrt(512.0) // standard HLL error for m=512
    assert(math.abs(est - exact) / exact <= 3 * se,
      s"estimate $est vs exact $exact outside 3 standard errors")
    val a = events.limit(4000)
    val b2 = events.exceptAll(a)
    val merged = Sketches.hllMerge(Seq(
      Sketches.hllBuild(a, "user_id", 9),
      Sketches.hllBuild(b2, "user_id", 9)))
    assert(merged.exceptAll(regs).count() == 0 &&
      regs.exceptAll(merged).count() == 0,
      "max-merge must equal the single-pass registers")
  }

  test("rho derivation is exact at the boundaries (no float log2)") {
    // synthetic keys chosen to land z = 0 is impractical; instead verify
    // the register table's rho range is within [1, 52] for b = 9 and the
    // bucket domain is [0, 512)
    val regs = Sketches.hllBuild(events, "user_id", b = 9).collect()
    assert(regs.forall { r =>
      val bkt = r.getLong(0); val rho = r.getInt(1)
      bkt >= 0 && bkt < 512 && rho >= 1 && rho <= 52
    })
  }
  test("KMV: exact when the set fits in k; estimate within 4 SE otherwise; union bottom-k sound") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // 150 distinct users into k=256 -> sketch IS the set -> exact
    val exactUsers = events.distinct().count()
    val estSmall = Sketches.kmvDistinct(
      Sketches.kmvBuild(events.withColumn("g", lit(1)), Seq("g"), "user_id", 256),
      Seq("g"), 256).head
    assert(estSmall.getDouble(2) == exactUsers.toDouble,
      s"under-k KMV must be exact: ${estSmall.getDouble(2)} vs $exactUsers")
    // documents text hashes per source: k=64 against hundreds of docs
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val sk = Sketches.kmvBuild(d, Seq("source"), "text", 64)
    assert(sk.groupBy("source").count().collect().forall(_.getLong(1) <= 64))
    val est = Sketches.kmvDistinct(sk, Seq("source"), 64).collect()
    val truth = d.select(col("source"), col("text")).distinct()
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { r =>
      val src = r.getString(0); val e = r.getDouble(2); val t = truth(src)
      val se = t / math.sqrt(64.0 - 2) // KMV relative SE ~ 1/sqrt(k-2)
      assert(math.abs(e - t) <= 4 * se, s"$src: est $e vs exact $t")
    }
  }

  test("hllEstimateBy: one-pass grouped estimates equal per-group loops") {
    // the q251 contract: grouped build + grouped estimate must reproduce
    // BIT-FOR-BIT what a per-group driver loop of hllBuild+hllEstimate
    // computed (the loop is the anti-pattern the grouped API replaces)
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), col("user_id"))
    val regs = Sketches.hllBuildBy(ev, "user_id", b = 9, Seq("event_type"))
    val grouped = Sketches.hllEstimateBy(regs, b = 9, Seq("event_type"))
    val got = grouped.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val types = ev.select("event_type").distinct()
      .collect().map(_.getString(0))
    assert(types.length >= 3 && got.keySet == types.toSet)
    types.foreach { t =>
      val solo = Sketches.hllEstimate(
        Sketches.hllBuild(ev.where(col("event_type") === t)
          .select(col("user_id")), "user_id", b = 9), b = 9).head
      assert(got(t) == ((solo.getLong(0), solo.getLong(1), solo.getDouble(2))),
        s"group $t: grouped ${got(t)} != solo loop result")
    }
    // single-aggregation shape: the grouped estimate is ONE Aggregate over
    // the register table — no per-group Union anywhere in the plan
    val plan = grouped.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Union}
    assert(plan.collect { case u: Union => u }.isEmpty,
      "grouped estimate must not union per-group branches")
    assert(plan.collect { case a: Aggregate => a }.size == 2,
      "expected exactly build + estimate aggregations")
  }

  test("histBuild: a value near Long.MaxValue lands in the TOP edge bin") {
    // overflow contract: (v - lo) * bins would wrap negative for huge v if
    // the value were not clamped into [lo, hi] BEFORE the multiply — the
    // wrapped product would claim bin 0, silently misfiling the outlier
    val vals = Seq(Long.MaxValue, Long.MaxValue - 1, 50L, Long.MinValue)
      .toDF("v")
    val h = Sketches.histBuild(vals, col("v"), Seq.empty, 0L, 100L, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(9L) == 2L, s"both huge values must clamp to the top bin: $h")
    assert(h(5L) == 1L && h(0L) == 1L, s"interior + below-domain: $h")
  }

  test("histogram: merge of group partials equals the direct global build") {
    val vals = spark.range(10000)
      .select(col("id"), (col("id") % 3).cast("string").as("g"),
        (col("id") * 37 % 100000).as("v"))
    val perGroup = Sketches.histBuild(vals, col("v"), Seq("g"),
      0L, 100000L, 64)
    val merged = Sketches.histMerge(
      Seq(perGroup.select(col("bin"), col("cnt"))), Seq.empty)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = Sketches.histBuild(vals, col("v"), Seq.empty,
      0L, 100000L, 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == direct, "sum-merge must equal the one-shot build")
    assert(merged.values.sum == 10000L)
  }

  test("histogram: out-of-domain values clamp into edge bins") {
    val vals = Seq(-50L, -1L, 0L, 99L, 100L, 250L).toDF("v")
    val h = Sketches.histBuild(vals, col("v"), Seq.empty, 0L, 100L, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(0L) == 3L, s"two below-domain + the 0 → bin 0: $h")
    assert(h(9L) == 3L, s"99 (interior max), 100 (== hi), 250 → bin 9: $h")
  }

  test("histogram quantiles: uniform data interpolates within half a bin width") {
    // v = 0..9999 uniform over [0, 10000): every quantile is ~p·10000
    val vals = spark.range(10000).select(col("id").as("v"))
    val h = Sketches.histBuild(vals, col("v"), Seq.empty, 0L, 10000L, 100)
    val q = Sketches.histQuantile(h, Seq((1, 4), (1, 2), (3, 4)),
      0L, 10000L, 100)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(4)))
    q.foreach { case (num, den, est) =>
      val want = 10000.0 * num / den
      assert(math.abs(est - want) <= 50.0 + 1e-9,
        s"$num/$den: est $est vs uniform truth $want (bin width 100)")
    }
  }

  test("histQuantileBy: per-group estimates equal per-group global runs") {
    val vals = spark.range(6000).select(
      (col("id") % 3).cast("string").as("g"),
      // different per-group distributions: shifted uniforms
      (col("id") / 3 + (col("id") % 3) * 1000).as("v"))
    val h = Sketches.histBuild(vals, col("v"), Seq("g"), 0L, 4000L, 80)
    val grouped = Sketches.histQuantileBy(h, Seq("g"),
      Seq((1, 2), (9, 10)), 0L, 4000L, 80)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)) ->
        (r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    Seq("0", "1", "2").foreach { g =>
      val solo = Sketches.histQuantile(
        h.where(col("g") === g).select(col("bin"), col("cnt")),
        Seq((1, 2), (9, 10)), 0L, 4000L, 80)
        .collect().map(r => (r.getInt(0), r.getInt(1)) ->
          (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
      solo.foreach { case ((n, d), exp) =>
        assert(grouped((g, n, d)) == exp,
          s"group $g p=$n/$d diverged from the global-path run")
      }
    }
  }

  test("histogram quantiles: rank targeting is exact on point-mass data") {
    // all mass at one value: every quantile must land in that bin
    val vals = spark.range(1000).select(lit(777L).as("v"))
    val h = Sketches.histBuild(vals, col("v"), Seq.empty, 0L, 1000L, 10)
    val q = Sketches.histQuantile(h, Seq((1, 2), (99, 100)), 0L, 1000L, 10)
      .collect()
    assert(q.forall(_.getLong(3) == 7L), "777 lives in bin 7 at width 100")
  }
}

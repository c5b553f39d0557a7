package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed frequency/cardinality sketches as MERGEABLE TABLES — the
  * "novel sketch" custom-operator family, built Spark-first: a sketch is
  * not a driver-side blob (Spark's `df.stat.countMinSketch` collects one)
  * but a small DataFrame of counters whose merge operator is a plain
  * aggregate (`sum` for CMS, `max` for HLL registers). That makes sketches
  * first-class warehouse citizens: persist them per partition/day, union +
  * re-aggregate to merge months, join to query — no driver round-trip,
  * no custom serialization, and the whole path stays in Tungsten codegen.
  *
  * DETERMINISTIC BY CONSTRUCTION: hashes are md5-prefix arithmetic
  * ([[TextDedup.hash60]]), so a DuckDB oracle replays the EXACT counter
  * tables and estimates — a hash-gated probabilistic structure. The usual
  * seed-dependent nondeterminism of sketch libraries is exactly what the
  * corpus-wide reproducibility discipline here forbids.
  *
  * Scale shape: CMS build shuffles `depth × |input|` rows but map-side
  * combine collapses every partition to ≤ depth×width partial rows, so
  * the exchange is bounded by the sketch size, not the data; HLL build is
  * one `groupBy(bucket).max(rho)` with the same property (≤ m rows per
  * partition after partial agg). Point queries broadcast the sketch
  * (depth×width ≤ thousands of rows). At 100 TB both sketches cost one
  * scan + a counter-sized shuffle.
  */
object Sketches {

  /** Count-min sketch as a (depth, bucket, cnt) table over `keyCol`
    * (optionally weighted). Estimate(x) = min over rows d of
    * cnt[d, h_d(x)] — always an OVERestimate (collisions only add), with
    * the usual ε = e/width, δ = e^-depth guarantees. */
  def cmsBuild(df: DataFrame, keyCol: String, depth: Int, width: Int,
      weight: Column = lit(1L)): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    val hashes = (0 until depth).map { d =>
      struct(lit(d).as("depth"),
        pmod(TextDedup.hash60(
          concat(col(keyCol).cast("string"), lit(s":cms$d"))),
          lit(width.toLong)).as("bucket"))
    }
    df.select(explode(array(hashes: _*)).as("h"), weight.as("w"))
      .groupBy(col("h.depth").as("depth"), col("h.bucket").as("bucket"))
      .agg(sum(col("w")).as("cnt"))
  }

  /** Merge CMS tables built with the SAME (depth, width): counters add.
    * This is how per-day sketches roll up to a month. */
  def cmsMerge(sketches: Seq[DataFrame]): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(col("depth"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-estimate the counts of `items` (a frame with `keyCol`)
    * against a CMS table: re-derive the depth buckets per item, join the
    * (small, broadcast) sketch, take min over depths. Missing
    * (depth,bucket) rows mean zero collisions there → estimate 0. */
  def cmsEstimate(items: DataFrame, sketch: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    val hashes = (0 until depth).map { d =>
      struct(lit(d).as("depth"),
        pmod(TextDedup.hash60(
          concat(col(keyCol).cast("string"), lit(s":cms$d"))),
          lit(width.toLong)).as("bucket"))
    }
    items.select(col(keyCol), explode(array(hashes: _*)).as("h"))
      .select(col(keyCol), col("h.depth").as("depth"),
        col("h.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("depth", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** HyperLogLog register table over `keyCol`: bucket = low `b` bits of
    * the 60-bit hash, rho = leading-zero run (+1) of the remaining
    * 60−b bits, registers = `max(rho)` per bucket — the standard
    * Flajolet HLL state as m = 2^b rows. `length(bin(z))` is the exact
    * integer bit length on BOTH engines (no float log2 near power-of-two
    * boundaries), z = 0 maps to the full run. */
  def hllBuild(df: DataFrame, keyCol: String, b: Int): DataFrame =
    hllBuildBy(df, keyCol, b, Seq.empty)

  /** [[hllBuild]] with extra grouping columns — ONE pass builds the
    * register tables of every group (e.g. every `day` of a backfill)
    * instead of a per-group job loop. */
  def hllBuildBy(df: DataFrame, keyCol: String, b: Int,
      groupCols: Seq[String]): DataFrame = {
    require(b >= 4 && b <= 16, s"b must be in [4,16], got $b")
    val m = 1L << b
    val h = TextDedup.hash60(concat(col(keyCol).cast("string"), lit(":hll")))
    // EXACT integer high bits: h is non-negative (60-bit), so a right
    // shift is exactly floor(h / 2^b) — matching the oracle's integer
    // `//`. (A `/` here would be double division: 60-bit hashes exceed
    // the 53-bit mantissa, so the truncation could differ from the exact
    // floor — determinism must be by construction, not probability.)
    val z = shiftright(h, b) // high 60-b bits
    val maxBits = 60 - b
    val rho = when(z === 0L, lit(maxBits + 1))
      .otherwise(lit(maxBits) - length(bin(z)) + 1)
    df.select(groupCols.map(col) :+ pmod(h, lit(m)).as("bucket") :+
        rho.cast("int").as("rho"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("max_rho"))
  }

  /** Merge HLL register tables (same b): registers take max. */
  def hllMerge(sketches: Seq[DataFrame]): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(col("bucket")).agg(max(col("max_rho")).as("max_rho"))

  /** Cardinality estimate from a register table, EXACT-integer inner
    * math: Σ 2^−rho is accumulated as the integer Σ 2^(S−rho) with
    * S = 61−b — the tightest exact scale: rho ≤ 61−b keeps every term an
    * integral BIGINT, and the worst-case total m·2^S = 2^61 cannot
    * overflow int64 (a float Σ of tiny powers of two would be
    * order-dependent past 53 bits of spread; a bigger S overflows at
    * b ≥ 7). Absent buckets contribute rho = 0 (2^S each). The closing
    * formula (bias constant α_m, small-range linear counting below 2.5m
    * when empty registers exist) is ONE float expression over those
    * exact integers. Returns 1 row: (m, n_zero, estimate). */
  def hllEstimate(registers: DataFrame, b: Int): DataFrame =
    hllEstimateImpl(registers, b, Seq.empty)

  /** [[hllEstimate]]'s grouped twin over a [[hllBuildBy]] register table
    * (groupCols..., bucket, max_rho): ONE aggregation computes every
    * group's (m, n_zero, estimate) — the estimator is a per-group
    * aggregate (count present + exact-integer Σ2^(S−rho)) plus one
    * closing float expression, so T groups cost ONE pass over the
    * ≤ T·m-row register table instead of T driver-launched jobs with T
    * scans. This is the API that makes "distinct users per event type /
    * per day" a single-plan query at any group count. */
  def hllEstimateBy(registers: DataFrame, b: Int,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "use hllEstimate for the global case")
    hllEstimateImpl(registers, b, groupCols)
  }

  private def hllEstimateImpl(registers: DataFrame, b: Int,
      groupCols: Seq[String]): DataFrame = {
    val m = 1L << b
    val scale = 61 - b
    val alpha = b match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val pow2scale = math.pow(2, scale)
    val gcols = groupCols.map(col)
    registers
      .groupBy(gcols: _*)
      .agg(count(lit(1)).as("n_present"),
        sum(expr(s"shiftleft(cast(1 as bigint), $scale - max_rho)"))
          .as("s_present"))
      .select(gcols :+ lit(m).as("m") :+
        (lit(m) - col("n_present")).as("n_zero") :+
        ((lit(m) - col("n_present")) * (1L << scale) + col("s_present"))
          .as("s_total"): _*)
      .select(gcols :+ col("m") :+ col("n_zero") :+
        round(
          when(col("n_zero") > 0 &&
            lit(alpha) * m * m * pow2scale / col("s_total") <= lit(2.5 * m),
            lit(m.toDouble) * log(lit(m.toDouble) / col("n_zero")))
          .otherwise(lit(alpha) * m * m * pow2scale / col("s_total")),
          4).as("estimate"): _*)
  }

  /** KMV (k-minimum-values, "bottom-k") sketch per group: the k smallest
    * distinct 60-bit hashes of `keyCol` as (group, rank, h) rows — the
    * sketch that, unlike HLL registers, supports SET OPERATIONS: a union
    * sketch is bottom-k of the merged rows, and Jaccard/intersection
    * estimates fall out of membership in the union's bottom-k
    * (Beyer et al., "On synopses for distinct-value estimation under
    * multiset operations", SIGMOD'07 — public literature).
    *
    * Plan shape: distinct (group, h) then a rank window that Spark ≥3.5
    * executes as WindowGroupLimit — a per-group k-heap, never a full
    * per-group sort — so the shuffled state is O(k) per group. All
    * hashes are md5-derived ([[TextDedup.hash60]]): the oracle rebuilds
    * the identical sketch with ORDER BY/row_number. */
  def kmvBuild(df: DataFrame, groupCols: Seq[String], keyCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("h"))
    df.select(groupCols.map(col) :+
        TextDedup.hash60(concat(col(keyCol).cast("string"), lit(":kmv")))
          .as("h"): _*)
      .distinct()
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Distinct-count estimate per group from a KMV sketch: if the group
    * holds fewer than k hashes the sketch IS the distinct set (exact);
    * otherwise D ≈ (k−1)·2^60 / h_(k) — one float division over the
    * exact integer k-th minimum. */
  def kmvDistinct(sketch: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame =
    sketch.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_in_sketch"), max(col("h")).as("h_k"))
      .select(groupCols.map(col) :+ col("n_in_sketch") :+
        round(when(col("n_in_sketch") < k,
            col("n_in_sketch").cast("double"))
          .otherwise(lit((k - 1).toDouble) * 1.152921504606846976e18 /
            col("h_k")), 4).as("est_distinct"): _*)

  /** Jaccard estimate between two groups' KMV sketches: bottom-k of the
    * UNION of both hash sets, then the fraction of those union-minima
    * present in BOTH sides. Exact when both sides fit in k; the standard
    * unbiased KMV resemblance estimator otherwise. Returns one row per
    * (groupA, groupB) pair in `pairs`. */
  def kmvJaccard(sketch: DataFrame, groupCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ga"), col("gb")).orderBy(col("h"))
    // for each ordered pair (ga < gb): all hashes from either sketch
    val pairsAll = sketch.select(col(groupCol).as("ga")).distinct()
      .crossJoin(sketch.select(col(groupCol).as("gb")).distinct())
      .where(col("ga") < col("gb"))
    val expanded = pairsAll
      .join(sketch.select(col(groupCol).as("ga"), col("h").as("ha")), Seq("ga"))
      .select(col("ga"), col("gb"), col("ha").as("h"),
        lit(1).as("in_a"), lit(0).as("in_b"))
      .unionByName(pairsAll
        .join(sketch.select(col(groupCol).as("gb"), col("h").as("hb")), Seq("gb"))
        .select(col("ga"), col("gb"), col("hb").as("h"),
          lit(0).as("in_a"), lit(1).as("in_b")))
      .groupBy(col("ga"), col("gb"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    expanded
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("k_union"),
        sum(col("in_a") * col("in_b")).as("n_both"))
      .select(col("ga"), col("gb"), col("k_union"),
        col("n_both").cast("long").as("n_both"),
        round(col("n_both").cast("double") / col("k_union"), 4)
          .as("jaccard_est"))
  }

  /** Equi-width histogram as a MERGEABLE counter table over an integer
    * `valueCol` (quantize money to cents first — the q72 discipline):
    * one row per (group, bin) with bin = clamp(⌊(v − lo)·bins /
    * (hi − lo)⌋) in pure long arithmetic, so per-day/per-source
    * histograms sum-merge exactly like the CMS/HLL/KMV tables above and
    * replay bit-for-bit in any engine. Out-of-domain values clamp into
    * the edge bins (pick [lo, hi] to cover the domain — edge-bin mass is
    * the audit that you didn't). Shuffle is bounded by |groups|·bins
    * after map-side combine, never by row count. Overflow bound:
    * (hi − lo)·bins must fit a long — at cents grain that allows
    * domains past 10^15. */
  def histBuild(df: DataFrame, valueCol: Column, groupCols: Seq[String],
      lo: Long, hi: Long, bins: Int): DataFrame = {
    require(bins >= 2 && bins <= (1 << 20), s"bins must be in [2, 2^20]: $bins")
    require(hi > lo, s"empty domain [$lo, $hi]")
    require((hi - lo) <= Long.MaxValue / bins,
      s"(hi-lo)*bins overflows long: lo=$lo hi=$hi bins=$bins")
    // clamp the VALUE into [lo, hi] BEFORE the multiply: the require()
    // above only bounds (hi−lo)·bins, not data values, so an unclamped
    // far-above-domain v could overflow (v−lo)·bins to negative and land
    // in bin 0 instead of the top edge bin. Clamping first makes the
    // documented edge-bin semantics overflow-proof for ANY input, and
    // it also keeps (__v − lo) non-negative, so div's truncate-vs-floor
    // distinction on negatives never arises.
    val v = least(lit(hi), greatest(lit(lo), valueCol.cast("long")))
    val bin = least(lit(bins - 1L),
      expr(s"(__v - ${lo}L) * ${bins}L div ${hi - lo}L"))
    df.select((groupCols.map(col) :+ v.as("__v")): _*)
      .select((groupCols.map(col) :+ bin.as("bin")): _*)
      .groupBy((groupCols.map(col) :+ col("bin")).map(c => c): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge histograms built with the SAME (lo, hi, bins): counts add
    * per (group, bin) — per-day partials roll up to any range. */
  def histMerge(hists: Seq[DataFrame], groupCols: Seq[String]): DataFrame =
    hists.reduce(_ unionByName _)
      .groupBy((groupCols.map(col) :+ col("bin")): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Per-GROUP quantile estimates from a grouped histogram
    * (groupCols..., bin, cnt) — [[histQuantile]]'s grouped twin, same
    * integer rank targeting and within-bin interpolation but with every
    * window/total partitioned by the group: one frame pass computes
    * EVERY group's estimates for all probs (≤|groups|·bins·|probs|
    * intermediate rows — synopsis-sized). This is the "median per
    * source / p99 per day" reporting shape answered without touching
    * facts: group histograms persist as partials, roll up by sum-merge,
    * and quantiles read off the merged counters. */
  def histQuantileBy(hist: DataFrame, groupCols: Seq[String],
      probs: Seq[(Int, Int)], lo: Long, hi: Long, bins: Int): DataFrame = {
    require(groupCols.nonEmpty, "use histQuantile for the global case")
    require(probs.nonEmpty && probs.forall { case (n, d) =>
      d > 0 && n >= 0 && n <= d }, s"probs must be fractions in [0,1]: $probs")
    val spark = hist.sparkSession
    import spark.implicits._
    val gcols = groupCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*).orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = hist.select((gcols :+ col("bin").cast("long").as("bin") :+
        col("cnt").cast("long").as("cnt")): _*)
      .withColumn("cum", sum(col("cnt")).over(w))
    val totals = cum.groupBy(gcols: _*).agg(max(col("cum")).as("n_total"))
    val targets = totals.crossJoin(broadcast(probs.toDF("p_num", "p_den")))
      .select((gcols :+ col("p_num") :+ col("p_den") :+
        expr("greatest(1L, (n_total * p_num + p_den - 1) div p_den)")
          .as("t")): _*)
    val width = (hi - lo).toDouble / bins
    cum.join(targets, groupCols)
      .where(col("cum") >= col("t") && (col("cum") - col("cnt")) < col("t"))
      .select((gcols :+ col("p_num") :+ col("p_den") :+ col("t") :+
        col("bin") :+
        round(lit(lo.toDouble) + lit(width) *
          (col("bin").cast("double") +
            (col("t") - (col("cum") - col("cnt"))).cast("double") /
              col("cnt").cast("double")), 4).as("est")): _*)
  }

  /** Quantile estimates from a GLOBAL histogram (bin, cnt): for each
    * probability p = num/den, target rank t = ⌈N·num/den⌉ in exact
    * integer arithmetic, locate the bin where the cumulative count
    * first reaches t, and linearly interpolate inside it —
    * est = lo + width·(bin + (t − cum_before)/cnt_bin), ONE closing
    * IEEE expression over exact longs. The probe is histogram-sized:
    * a ≤bins-row cumulative window crossJoined with the ≤|probs|-row
    * target frame — nothing scales with the data. Returns
    * (p_num, p_den, t, bin, est). */
  def histQuantile(hist: DataFrame, probs: Seq[(Int, Int)],
      lo: Long, hi: Long, bins: Int): DataFrame = {
    require(probs.nonEmpty && probs.forall { case (n, d) =>
      d > 0 && n >= 0 && n <= d }, s"probs must be fractions in [0,1]: $probs")
    val spark = hist.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = hist.select(col("bin").cast("long").as("bin"),
        col("cnt").cast("long").as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(w))
    val total = cum.agg(max(col("cum")).as("n_total"))
    val targets = probs.toDF("p_num", "p_den")
      .crossJoin(broadcast(total))
      .select(col("p_num"), col("p_den"),
        expr("greatest(1L, (n_total * p_num + p_den - 1) div p_den)").as("t"))
    val width = (hi - lo).toDouble / bins
    cum.crossJoin(broadcast(targets))
      .where(col("cum") >= col("t") && (col("cum") - col("cnt")) < col("t"))
      .select(col("p_num"), col("p_den"), col("t"), col("bin"),
        round(lit(lo.toDouble) + lit(width) *
          (col("bin").cast("double") +
            (col("t") - (col("cum") - col("cnt"))).cast("double") /
              col("cnt").cast("double")), 4).as("est"))
  }
}

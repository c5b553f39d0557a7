package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical comparison operators a data-curation warehouse runs as
  * gates: two-sample tests between experiment arms and distribution-drift
  * screens between corpus slices. Complements the chi-square independence
  * test (q116) with a continuous-metric test (Welch) and a binned
  * drift score (PSI).
  *
  * Determinism discipline (the q72/q93 rules): every group sum runs over
  * values quantized to integers first, so partial-aggregation order can't
  * move a ULP; the closing float formulas then operate on exactly
  * representable inputs and are bit-identical across engines. Per-bin PSI
  * terms fold in bin order from a sorted array, never via a float SUM.
  */
object Stats {

  /** Welch's unequal-variance t-test between two groups of a metric.
    *
    * Input is quantized to integer thousandths (`round(metric*1000)` as
    * long) before the sums; n, Σx, Σx² are exact longs, so mean/variance
    * and the t statistic are deterministic doubles. One partial-aggregate
    * shuffle over two groups — the 100 TB shape is a map-side combine
    * down to two rows.
    *
    * Output: one row per (group_a, group_b) with means (back in metric
    * units), sample variances, Welch t and Satterthwaite df, rounded to
    * 6 decimals.
    */
  def welchTTest(df: DataFrame, groupCol: String, metricCol: String,
      groupA: String, groupB: String): DataFrame = {
    val q = df.where(col(groupCol).isin(groupA, groupB))
      .select(col(groupCol).as("g"),
        round(col(metricCol) * 1000).cast("long").as("x"))
    val agg = q.groupBy(col("g")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("s"),
      sum(col("x") * col("x")).as("ss"))
    val a = agg.where(col("g") === groupA)
      .select(col("n").as("n1"), col("s").as("s1"), col("ss").as("ss1"))
    val b = agg.where(col("g") === groupB)
      .select(col("n").as("n2"), col("s").as("s2"), col("ss").as("ss2"))
    val j = a.crossJoin(b) // 1×1
    val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
    // sample variance from exact integer sums, in metric units:
    // var = (ss - s^2/n) / (n-1) / 1000^2. The square of the SUM is taken
    // in double — s*s in int64 overflows past |s| ~ 3e9 (hit at the 10x
    // scale probe), while double(s)*double(s) equals the correctly-rounded
    // exact square for every |s| <= 2^53 (~9e15, orders of magnitude past
    // 100 TB of milli-quantized values); the DuckDB oracle squares the
    // same way, so results stay bit-identical at every sf
    val d = (c: Column) => c.cast("double")
    val v1 = (d(col("ss1")) - d(col("s1")) * d(col("s1")) / n1) / (n1 - 1) / 1e6
    val v2 = (d(col("ss2")) - d(col("s2")) * d(col("s2")) / n2) / (n2 - 1) / 1e6
    val m1 = col("s1") / n1 / 1000.0
    val m2 = col("s2") / n2 / 1000.0
    val se2 = v1 / n1 + v2 / n2
    val t = (m1 - m2) / sqrt(se2)
    val dfW = se2 * se2 /
      ((v1 / n1) * (v1 / n1) / (n1 - 1) + (v2 / n2) * (v2 / n2) / (n2 - 1))
    j.select(
      lit(groupA).as("group_a"), lit(groupB).as("group_b"),
      col("n1"), col("n2"),
      round(m1, 6).as("mean_a"), round(m2, 6).as("mean_b"),
      round(v1, 6).as("var_a"), round(v2, 6).as("var_b"),
      round(t, 6).as("t_stat"), round(dfW, 6).as("df"))
  }

  /** Population stability index of each slice's distribution of `valueCol`
    * against the whole population, over `bins` equal-width bins spanning
    * [lo, hi] (literal bounds — no data-dependent binning, so two runs or
    * two engines bin identically). Laplace-smoothed proportions
    * (`(c + 0.5) / (n + 0.5·bins)`) keep empty bins finite.
    *
    * PSI(slice) = Σ_bins (p_s − p_g)·ln(p_s / p_g), folded in bin order
    * from a sorted array (never a float SUM). Conventional read: <0.1
    * stable, 0.1–0.25 drifting, >0.25 shifted.
    *
    * Scale shape: one groupBy (slice, bin) over the scan — integer counts
    * only; the dense slice×bin frame is built from the tiny aggregate, so
    * the big table is touched once.
    */
  def psiDrift(df: DataFrame, sliceCol: String, valueCol: String,
      lo: Double, hi: Double, bins: Int = 10): DataFrame = {
    val spark = df.sparkSession
    val binned = df.select(col(sliceCol).as("slice"),
      least(lit(bins - 1), greatest(lit(0),
        floor((col(valueCol) - lo) / ((hi - lo) / bins)).cast("int")))
        .as("bin"))
    val cnt = binned.groupBy(col("slice"), col("bin"))
      .agg(count(lit(1)).as("c"))
    val slices = cnt.groupBy(col("slice")).agg(sum(col("c")).as("n_s"))
    val global = cnt.groupBy(col("bin")).agg(sum(col("c")).as("c_g"))
    val total = global.agg(sum(col("c_g")).as("n_g"))
    // dense slice × bin frame from the tiny aggregates
    val allBins = spark.range(bins).select(col("id").cast("int").as("bin"))
    val dense = slices.crossJoin(allBins)
      .join(cnt, Seq("slice", "bin"), "left")
      .na.fill(0L, Seq("c"))
      .join(broadcast(global), Seq("bin"))
      .crossJoin(broadcast(total))
    val pS = (col("c").cast("double") + 0.5) /
      (col("n_s").cast("double") + 0.5 * bins)
    val pG = (col("c_g").cast("double") + 0.5) /
      (col("n_g").cast("double") + 0.5 * bins)
    val term = (pS - pG) * log(pS / pG)
    dense.select(col("slice"), col("n_s"), col("bin"), term.as("v"))
      .groupBy(col("slice"))
      .agg(first(col("n_s")).as("n_rows"),
        sort_array(collect_list(struct(col("bin"), col("v")))).as("arr"))
      .select(col("slice"), col("n_rows"),
        round(aggregate(transform(col("arr"), e => e.getField("v")),
          lit(0.0), (a, x) => a + x), 6).as("psi"))
  }

  /** Two-sample Kolmogorov–Smirnov test between two groups of a metric:
    * D = max over values of |ECDF_a − ECDF_b|, the standard
    * distribution-equality screen between experiment arms (complements
    * [[welchTTest]], which only compares means).
    *
    * Values are quantized to integer thousandths first; the per-value
    * group counts and their running sums are exact longs, so each ECDF
    * step is an exact-integer division and D is bit-identical across
    * engines. The cumulative window runs over DISTINCT quantized values
    * (not rows) with no partition key — fine to millions of distinct
    * values; for a truly unbounded domain, pre-bin into quantile buckets
    * (the [[Profile]] equi-depth machinery) first.
    *
    * Output: one row — n1, n2, `d_stat`, and `d_at` (the metric value
    * where the max gap occurs; lowest such value on ties).
    */
  def ksTest(df: DataFrame, groupCol: String, metricCol: String,
      groupA: String, groupB: String): DataFrame = {
    val q = df.where(col(groupCol).isin(groupA, groupB))
      .select(col(groupCol).as("g"),
        round(col(metricCol) * 1000).cast("long").as("x"))
    val perVal = q.groupBy(col("x")).agg(
      sum(when(col("g") === groupA, 1L).otherwise(0L)).as("ca"),
      sum(when(col("g") === groupB, 1L).otherwise(0L)).as("cb"))
    val w = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perVal.select(col("x"),
      sum(col("ca")).over(w).as("cum_a"),
      sum(col("cb")).over(w).as("cum_b"))
    val tot = q.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val n1f = tot.where(col("g") === groupA).select(col("n").as("n1"))
    val n2f = tot.where(col("g") === groupB).select(col("n").as("n2"))
    cum.crossJoin(broadcast(n1f)).crossJoin(broadcast(n2f))
      .select(col("n1"), col("n2"),
        abs(col("cum_a") / col("n1").cast("double") -
          col("cum_b") / col("n2").cast("double")).as("d"),
        col("x"))
      // max d, then the LOWEST x achieving it: struct max with negated x
      .agg(first(col("n1")).as("n1"), first(col("n2")).as("n2"),
        max(struct(col("d"), (-col("x")).as("nx"))).as("m"))
      .select(lit(groupA).as("group_a"), lit(groupB).as("group_b"),
        col("n1"), col("n2"),
        round(col("m.d"), 6).as("d_stat"),
        round(-col("m.nx") / 1000.0, 6).as("d_at"))
      // absent group → empty frame, not a null/NaN row
      .where(col("n1").isNotNull && col("n2").isNotNull)
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) test between two groups of a
    * metric — the non-parametric alternative to [[welchTTest]] when the
    * metric is heavy-tailed (latencies, revenues). Tied values receive
    * their average rank; the normal approximation's variance carries the
    * standard tie correction.
    *
    * Exactness: ranks are computed per DISTINCT quantized value from
    * running integer counts, and the rank-sum is accumulated in HALF-UNIT
    * integers (`2·cumprev + c + 1` is always integral), so U is exact and
    * only the closing z formula touches floats. Same distinct-value
    * window ceiling as [[ksTest]].
    *
    * Output: one row — n1, n2, `u_stat` (U of group A), `z` (tie-corrected
    * normal approximation, positive when A stochastically dominates).
    */
  def mannWhitneyU(df: DataFrame, groupCol: String, metricCol: String,
      groupA: String, groupB: String): DataFrame = {
    val q = df.where(col(groupCol).isin(groupA, groupB))
      .select(col(groupCol).as("g"),
        round(col(metricCol) * 1000).cast("long").as("x"))
    val perVal = q.groupBy(col("x")).agg(
      sum(when(col("g") === groupA, 1L).otherwise(0L)).as("ca"),
      sum(when(col("g") === groupB, 1L).otherwise(0L)).as("cb"))
      .withColumn("c", col("ca") + col("cb"))
    val w = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = perVal.select(col("ca"), col("cb"), col("c"),
      coalesce(sum(col("c")).over(w), lit(0L)).as("cumprev"))
    // rank-sum of group A in half-units: avg rank = cumprev + (c+1)/2,
    // so 2·R1 = Σ ca·(2·cumprev + c + 1) — an exact integer sum; the tie
    // term Σ(t³−t) is likewise integral.
    val agg = ranked.agg(
      sum(col("ca")).as("n1"), sum(col("cb")).as("n2"),
      sum(col("ca") * (col("cumprev") * 2 + col("c") + 1)).as("r1x2"),
      sum(col("c") * col("c") * col("c") - col("c")).as("ties"))
    val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
    val nT = n1 + n2
    val u1 = col("r1x2") / 2.0 - n1 * (n1 + 1) / 2.0
    val sigma2 = n1 * n2 / 12.0 *
      ((nT + 1) - col("ties").cast("double") / (nT * (nT - 1)))
    agg.select(lit(groupA).as("group_a"), lit(groupB).as("group_b"),
      col("n1"), col("n2"),
      round(u1, 6).as("u_stat"),
      round((u1 - n1 * n2 / 2.0) / sqrt(sigma2), 6).as("z"))
      // absent group → empty frame, not a zero-count NaN row
      .where(col("n1") > 0 && col("n2") > 0)
  }

  /** Decile lift-and-gains table for a scoring model: rank rows by score
    * (best first, deterministic id tiebreak), cut into `buckets` ntiles,
    * and report per-bucket and cumulative response — the standard model-
    * evaluation report (lift 1.0 = no better than random targeting).
    *
    * All rates derive from exact integer counts, so the one division per
    * output row is deterministic. The ntile is a total-order window (same
    * documented ceiling and same at-scale remedy as [[rfm]]: swap for
    * boundary-join scoring against pre-computed score quantiles).
    *
    * Output: one row per bucket — n, pos, `rate`, `cum_gain` (fraction of
    * all positives captured through this bucket), `lift` (cumulative rate
    * over base rate).
    */
  def liftGains(df: DataFrame, idCol: String, scoreCol: String,
      labelCol: String, buckets: Int = 10): DataFrame = {
    val d = df.select(col(idCol).as("id"), col(scoreCol).as("score"),
      col(labelCol).cast("long").as("y"))
    val dec = d.withColumn("bucket", ntile(buckets).over(
      Window.orderBy(col("score").desc, col("id").asc)))
    val per = dec.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = per.select(col("bucket"), col("n"), col("pos"),
      sum(col("n")).over(w).as("cum_n"),
      sum(col("pos")).over(w).as("cum_pos"))
    val tot = per.agg(sum(col("n")).as("nt"), sum(col("pos")).as("pt"))
    cum.crossJoin(broadcast(tot)).select(
      col("bucket"), col("n"), col("pos"),
      round(col("pos") / col("n").cast("double"), 6).as("rate"),
      round(col("cum_pos") / col("pt").cast("double"), 6).as("cum_gain"),
      round((col("cum_pos") / col("cum_n").cast("double")) /
        (col("pt") / col("nt").cast("double")), 6).as("lift"))
  }

  /** Deterministic multiplier-bootstrap confidence interval for the mean
    * of `valueCol`: each of `resamples` replicas reweights every row by a
    * hash-derived multiplier in {0, 1, 2} (mean 1 — an online-bootstrap
    * weighting in the Oza–Russell style, made reproducible by drawing the
    * weight from `md5(id:replica)` instead of an RNG), and the interval
    * is the nearest-rank 2.5th/97.5th percentile of the replica means.
    *
    * Everything sums in exact integers (values quantized to thousandths,
    * weights integral), replica means fold from a sorted array — the
    * result is bit-identical on any engine and any partitioning, which an
    * RNG bootstrap can never be.
    *
    * Scale shape: one groupBy(replica) over an n×R exploded frame —
    * map-side combine collapses each task's slice to R partial rows, so
    * the shuffle is O(R·tasks) however large n is. R multiplies scan CPU;
    * at 100 TB keep R ≲ 100 or bootstrap a sampled tier instead.
    */
  def bootstrapMeanCI(df: DataFrame, idCol: String, valueCol: String,
      resamples: Int = 100): DataFrame = {
    require(resamples >= 2, s"need ≥2 resamples, got $resamples")
    val q = df.select(col(idCol).cast("string").as("id"),
      round(col(valueCol) * 1000).cast("long").as("x"))
    val point = q.agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      .select((col("sx") / col("n").cast("double") / 1000.0).as("mean"),
        col("n"))
    val reps = q.select(col("id"), col("x"),
        explode(sequence(lit(0), lit(resamples - 1))).as("r"))
      .withColumn("w", pmod(
        TextDedup.hash60(concat(col("id"), lit(":"), col("r"))), lit(3L)))
      .groupBy(col("r"))
      .agg(sum(col("w") * col("x")).as("swx"), sum(col("w")).as("sw"))
      .select(col("r"),
        (col("swx") / col("sw").cast("double") / 1000.0).as("m"))
    val lo = math.max(1, math.ceil(0.025 * resamples).toInt)
    val hi = math.max(1, math.ceil(0.975 * resamples).toInt)
    reps.agg(sort_array(collect_list(col("m"))).as("ms"))
      .crossJoin(broadcast(point))
      .select(col("n"), lit(resamples).as("n_resamples"),
        round(col("mean"), 6).as("mean"),
        round(element_at(col("ms"), lo), 6).as("ci_lo"),
        round(element_at(col("ms"), hi), 6).as("ci_hi"))
  }

  /** Winsorized mean per group: clamp each value into the group's
    * [pLo, pHi] exact-percentile band, then average — the outlier-robust
    * mean a metrics pipeline reports when a single whale order would
    * otherwise move the KPI.
    *
    * Values are quantized to integer cents; the percentile bounds (exact,
    * linearly interpolated — both engines share the definition) are
    * rounded back to integer cents so the clamped column stays integral
    * and its group sum is order-independent. Two aggregates over group
    * grain with a broadcast join between them; the exact `percentile`
    * buffers each group's values — beyond ~10⁸ rows per group swap in
    * the t-digest sketch ([[Sketches]]) for the bounds.
    */
  def winsorizedMean(df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1, s"bad band [$pLo, $pHi]")
    val q = df.select(col(groupCol).as("g"),
      round(col(valueCol) * 100).cast("long").as("cents"))
    val bounds = q.groupBy(col("g")).agg(
      round(percentile(col("cents"), lit(pLo))).cast("long").as("lo_c"),
      round(percentile(col("cents"), lit(pHi))).cast("long").as("hi_c"))
    q.join(broadcast(bounds), Seq("g"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(least(greatest(col("cents"), col("lo_c")), col("hi_c")))
          .as("wsum"),
        first(col("lo_c")).as("lo_c"), first(col("hi_c")).as("hi_c"))
      .select(col("g").as(groupCol), col("n"),
        round(col("lo_c") / 100.0, 6).as("p_lo"),
        round(col("hi_c") / 100.0, 6).as("p_hi"),
        round(col("wsum") / col("n").cast("double") / 100.0, 6)
          .as("winsorized_mean"))
  }

  /** Theil–Sen robust trend per group: the median slope over all pairs of
    * (x, y) points — the regression line outliers can't drag (breakdown
    * point 29%), the standard robust alternative to [[q59-style]] OLS.
    *
    * Pairs come from a per-group self-join on x1 < x2 — O(n²) in GROUP
    * size, which is the algorithm (fine for per-entity time series of
    * hundreds–thousands of points; for bigger groups sample pairs or use
    * the repeated-median variant). Each slope is one exact division of
    * integer deltas; the median interpolates the sorted slopes — both
    * engines agree bit-for-bit on identical double sets.
    */
  def theilSen(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val pts = df.select(col(groupCol).as("g"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val a = pts.select(col("g"), col("x").as("x1"), col("y").as("y1"))
    val b = pts.select(col("g"), col("x").as("x2"), col("y").as("y2"))
    a.join(b, Seq("g")).where(col("x1") < col("x2"))
      .select(col("g"),
        ((col("y2") - col("y1")).cast("double") /
          (col("x2") - col("x1")).cast("double")).as("slope"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_pairs"),
        round(percentile(col("slope"), lit(0.5)), 6).as("trend"))
      .withColumnRenamed("g", groupCol)
  }

  /** Leave-one-out target encoding with additive smoothing — the standard
    * high-cardinality categorical feature for gradient-boosted models:
    *
    *   enc(row) = (pos(cat) − y(row) + m·prior) / (n(cat) − 1 + m)
    *
    * Excluding the row's own label (leave-one-out) prevents target
    * leakage; the `m`-weighted global prior shrinks rare categories
    * toward the population rate. All counts are exact integers, the
    * prior and one division are the only float ops — deterministic on
    * any engine.
    *
    * Scale shape: one aggregate to category grain, then a broadcast join
    * of that tiny frame back onto the facts — the big table is scanned
    * once and never shuffled.
    */
  def targetEncode(df: DataFrame, idCol: String, catCol: String,
      labelCol: String, smoothing: Int = 10): DataFrame = {
    val d = df.select(col(idCol).as("id"), col(catCol).as("category"),
      col(labelCol).cast("long").as("y"))
    val g = d.groupBy(col("category"))
      .agg(count(lit(1)).as("n_cat"), sum(col("y")).as("pos_cat"))
    val tot = d.agg(count(lit(1)).as("nt"), sum(col("y")).as("pt"))
    d.join(broadcast(g), Seq("category")).crossJoin(broadcast(tot))
      .select(col("id"), col("category"), col("y"),
        round((col("pos_cat") - col("y") +
            lit(smoothing.toDouble) * col("pt") / col("nt").cast("double")) /
          (col("n_cat") - 1 + smoothing).cast("double"), 6).as("enc"))
  }

  /** Key-skew diagnostic: the Gini coefficient of the per-key row-count
    * distribution plus the hottest key's share — the number that says
    * whether a groupBy/join on this key needs salting ([[Skew]]) before
    * it needs a bigger cluster. 0 = perfectly uniform, →1 = one key owns
    * the table.
    *
    * Gini = Σᵢ (2i − n − 1)·xᵢ / (n·Σx) over counts sorted ascending —
    * the numerator accumulates in exact integers (a float sum would be
    * partition-order-dependent), so the single closing division is
    * deterministic. The rank window runs over KEY GRAIN (one row per
    * distinct key), not the fact table; fine to tens of millions of
    * keys.
    *
    * Output: one row — n_keys, n_rows, `gini`, `top_share`.
    */
  def keySkew(df: DataFrame, keyCol: String): DataFrame = {
    val cnt = df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("x"))
    val ranked = cnt.withColumn("i",
      row_number().over(Window.orderBy(col("x").asc, col("k").asc)))
    ranked.agg(
        count(lit(1)).as("n_keys"), sum(col("x")).as("n_rows"),
        sum((col("i") * 2 - 1) * col("x")).as("num2"), // Σ(2i−1)x
        max(col("x")).as("mx"))
      .select(col("n_keys"), col("n_rows"),
        // Σ(2i−n−1)x = Σ(2i−1)x − n·Σx, all integral
        round((col("num2") - col("n_keys") * col("n_rows")).cast("double") /
          (col("n_keys") * col("n_rows")).cast("double"), 6).as("gini"),
        round(col("mx") / col("n_rows").cast("double"), 6).as("top_share"))
  }

  /** RFM segmentation: per-customer Recency (latest order date),
    * Frequency (order count), Monetary (lifetime cents), each scored into
    * `quantiles` ntile buckets with 5 = best and a deterministic
    * `custkey` tiebreak, plus the concatenated segment code ("555" =
    * champions).
    *
    * Scale shape: the fact table is reduced to customer grain by one
    * distributed aggregate first; only that frame (|customers| rows,
    * ~orders ÷ 10) feeds the ranking. The three `ntile` windows are
    * total-order operators — Spark executes an unpartitioned window on a
    * single task, which is fine up to tens of millions of customers but
    * is the documented ceiling here; past that, swap the exact ntile for
    * boundary-join scoring against pre-computed quantile cutoffs (the
    * [[Profile]] equi-depth machinery), trading exact tie handling for a
    * fully distributed plan.
    */
  def rfm(orders: DataFrame, custCol: String, dateCol: String,
      amountCol: String, quantiles: Int = 5): DataFrame = {
    val perCust = orders.groupBy(col(custCol).as("custkey")).agg(
      max(col(dateCol)).as("last_order"),
      count(lit(1)).as("n_orders"),
      sum(round(col(amountCol) * 100).cast("long")).as("cents"))
    val r = ntile(quantiles).over(
      Window.orderBy(col("last_order").desc, col("custkey").asc))
    val f = ntile(quantiles).over(
      Window.orderBy(col("n_orders").desc, col("custkey").asc))
    val m = ntile(quantiles).over(
      Window.orderBy(col("cents").desc, col("custkey").asc))
    perCust
      .withColumn("r_score", (lit(quantiles + 1) - r).cast("long"))
      .withColumn("f_score", (lit(quantiles + 1) - f).cast("long"))
      .withColumn("m_score", (lit(quantiles + 1) - m).cast("long"))
      .withColumn("segment", concat(col("r_score"), col("f_score"),
        col("m_score")))
  }

  /** Kaplan–Meier survival curve (right-censored product-limit
    * estimator): input is ONE ROW PER SUBJECT with an integral duration
    * (`durationCol`, e.g. hours-to-conversion — bucket it; see below) and
    * `eventCol` 1 = event observed, 0 = censored at that duration.
    * Output: one row per distinct EVENT time t with the at-risk count
    * n(t), event count d(t), and S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ).
    *
    * Determinism: durations are integers so risk sets are exact count
    * arithmetic; each factor (n−d)/n is one double division of exact
    * longs; S(t) folds the factors in ascending-t order from a sorted
    * array (seeded 1.0 — IEEE `1.0·f₁ = f₁`, so DuckDB's first-element
    * seed folds identically). Never `exp(sum(ln))` — libm differs across
    * engines.
    *
    * Scale shape: the subject table aggregates map-side to one row per
    * distinct duration, so the curve state is O(distinct durations) —
    * which is why `durationCol` should be BUCKETED (hours/days), keeping
    * the single-partition window and the O(T²) prefix fold over a
    * T-row frame, not an N-row one. The per-subject build is ordinary
    * distributed aggregation. */
  def kaplanMeier(subjects: DataFrame, durationCol: String,
      eventCol: String): DataFrame = {
    val n = subjects.count()
    val times = subjects
      .groupBy(col(durationCol).cast("long").as("t"))
      .agg(sum(col(eventCol).cast("long")).as("d"),
        count(lit(1)).as("leaving"))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = times
      .withColumn("n_at_risk",
        lit(n) - (sum(col("leaving")).over(w) - col("leaving")))
      .where(col("d") > 0)
      .select(col("t"), col("d"), col("n_at_risk"),
        ((col("n_at_risk") - col("d")).cast("double") /
          col("n_at_risk").cast("double")).as("f"))
    val terms = risk.groupBy().agg(
      array_sort(collect_list(struct(col("t"), col("d"),
        col("n_at_risk"), col("f")))).as("terms"))
    terms
      .select(col("terms"), posexplode(col("terms")).as(Seq("__i", "__x")))
      .select(col("__x.t").as("t"), col("__x.n_at_risk").as("n_at_risk"),
        col("__x.d").as("n_events"),
        round(aggregate(
          slice(col("terms"), lit(1), col("__i") + 1), lit(1.0d),
          (acc, x) => acc * x.getField("f")), 6).as("survival"))
  }
}

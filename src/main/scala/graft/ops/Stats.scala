package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    // var = (ss - s^2/n) / (n-1) / 1000^2
    val v1 = (col("ss1") - col("s1") * col("s1") / n1) / (n1 - 1) / 1e6
    val v2 = (col("ss2") - col("s2") * col("s2") / n2) / (n2 - 1) / 1e6
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
}

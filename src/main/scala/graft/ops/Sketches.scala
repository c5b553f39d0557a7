package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch aggregation — the scale substitute for exact
  * DISTINCT/percentile. The reference's analytics layer computes nothing
  * approximate (its daily volumes don't force it), but at 100 TB an exact
  * `COUNT(DISTINCT url)` shuffles every distinct value; a sketch is a
  * few-KB partial that map-side-combines and merges associatively — one
  * narrow pass, and pre-aggregated rollups stay re-aggregable (daily
  * sketches union into monthly without touching raw data, which no exact
  * distinct count can do).
  *
  * Built on Spark-native sketches (all codegen'd aggregates, no UDFs):
  *   - HLL (Apache DataSketches `hll_sketch_agg` / `hll_union_agg`) for
  *     distinct counts: ~1.6%% rel. error at lgK=12 and 2.5 KB of state.
  *   - `percentile_approx` (t-digest-style quantile summary) for
  *     percentiles with tunable `accuracy` = memory knob.
  *   - `approx_count_distinct` (HLL++) where only the number — not a
  *     reusable/unionable sketch — is needed.
  */
object Sketches {

  /** Per-group distinct-count ESTIMATE plus the binary HLL sketch itself,
    * so downstream rollups can re-merge groups without rescanning
    * (`estimate` for reading, `sketch` for further union). */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"),
        hll_sketch_estimate(hll_sketch_agg(col(valueCol), lit(lgK)))
          .as("estimate"))

  /** Merge already-aggregated HLL sketches up a hierarchy (e.g. daily →
    * monthly): unions binary sketches, never touching raw rows. */
  def hllRollup(sketched: DataFrame, groupCols: Seq[String],
      sketchCol: String = "sketch"): DataFrame =
    sketched.groupBy(groupCols.map(col): _*)
      .agg(
        hll_union_agg(col(sketchCol)).as("sketch"),
        hll_sketch_estimate(hll_union_agg(col(sketchCol))).as("estimate"))

  /** Approximate percentiles per group: one pass, bounded state per
    * (group, accuracy); exact `percentile` sorts every group's values. */
  def approxPercentiles(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      percentiles: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(valueCol,
        array(percentiles.map(lit): _*), lit(accuracy)).as("percentiles"))

  /** Count-min frequency sketch of a key column: `d` deterministic
    * md5-derived hash rows × `w` buckets, materialized as a (row, bucket,
    * cnt) frame of ≤ d·w rows. Mergeable by summing `cnt` — daily
    * sketches union into monthly like [[hllRollup]]; one narrow scan of
    * the input. */
  def countMin(df: DataFrame, key: Column, d: Int = 5, w: Int = 1024): DataFrame = {
    require(d >= 1 && w >= 1)
    df.select(posexplode(array((0 until d).map(i =>
        pmod(TextDedup.hash60(concat(key.cast("string"), lit(s":$i"))),
          lit(w.toLong))): _*))
        .as(Seq("row", "bucket")))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Join-cardinality estimate `|A ⋈_key B|` WITHOUT running the join:
    * the inner product of the two sides' count-min sketches, minimized
    * over hash rows (Cormode & Muthukrishnan's inner-product estimator —
    * never underestimates, overestimates by ≲ N_a·N_b/w per row, the min
    * over d rows concentrates). Two narrow scans + a ≤ d·w-row sketch
    * join: the planning-time "will this join explode / should I salt or
    * broadcast" number, next to [[graft.ops.Stats.keySkew]]. The single
    * returned scalar is the one driver-side value. */
  def joinSizeEstimate(a: DataFrame, aKey: Column, b: DataFrame,
      bKey: Column, d: Int = 5, w: Int = 1024): Long = {
    val sa = countMin(a, aKey, d, w).withColumnRenamed("cnt", "ca")
    val sb = countMin(b, bKey, d, w).withColumnRenamed("cnt", "cb")
    sa.join(sb, Seq("row", "bucket"))
      .groupBy("row").agg(sum(col("ca") * col("cb")).as("ip"))
      .agg(coalesce(min(col("ip")), lit(0L))).head().getLong(0)
  }
}

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
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-dimensional skyline (Pareto frontier): rows not dominated by any
  * other row, where `y` dominates `x` iff `y.minCol <= x.minCol` and
  * `y.maxCol >= x.maxCol` with at least one strict. The reference's
  * warehouse users express this as a NOT EXISTS self-join
  * (the oracle spelling) — quadratic and un-shardable. This is the
  * distributed two-stage formulation:
  *
  *  1. '''Local prune''' — rows are hash-bucketed, each bucket sorted by
  *     (minCol asc, maxCol desc), and a row is discarded when an earlier
  *     row in its bucket has a strictly larger running max of `maxCol`
  *     (such a row is strictly better on `maxCol` and no worse on
  *     `minCol`, so it dominates). The prune is sound-only by design:
  *     equal-`maxCol` earlier rows are kept even when strictly cheaper,
  *     so no true skyline point is ever dropped. One shuffle, window
  *     within buckets — each bucket's survivor set is roughly the
  *     skyline size, independent of bucket row count.
  *  2. '''Exact filter''' — the pruned candidate set (⊇ true skyline,
  *     and small: every non-skyline point is dominated by some skyline
  *     point, so candidates ≈ skyline × bucket overlap) is broadcast and
  *     the full dominance predicate runs as a left-anti join of the
  *     candidates against themselves.
  *
  * At 100 TB the big input is touched by exactly one shuffle (stage 1);
  * the quadratic predicate only ever sees the broadcast-sized frontier.
  */
object Skyline {

  /** Strict 2-D dominance: does the `a`-side row dominate the `b`-side? */
  private def dominates(aMin: Column, aMax: Column,
      bMin: Column, bMax: Column): Column =
    aMin <= bMin && aMax >= bMax && (aMin < bMin || aMax > bMax)

  /** Pareto-optimal rows of `df`, minimizing `minCol` and maximizing
    * `maxCol`. Duplicated frontier points (equal on both criteria) all
    * survive — neither dominates the other under the strict definition.
    *
    * @param buckets stage-1 parallelism; any value ≥ 1 yields the same
    *                result (spec-checked), it only shards the prune.
    */
  def skyline2d(df: DataFrame, minCol: String, maxCol: String,
      buckets: Int = 64): DataFrame = {
    val keyed = df.withColumn("__b",
      pmod(xxhash64(col(minCol), col(maxCol)), lit(buckets)))
    val w = Window.partitionBy(col("__b"))
      .orderBy(col(minCol).asc, col(maxCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // sound-only prune: discard iff an earlier row's maxCol is STRICTLY
    // larger (such a row dominates). Equal running max must KEEP the row:
    // it may be an exact duplicate of a frontier point, which nothing
    // dominates under the strict definition.
    val candidates = keyed
      .withColumn("__best", max(col(maxCol)).over(w))
      .where(col("__best").isNull || col("__best") <= col(maxCol))
      .drop("__b", "__best")
    val dom = broadcast(candidates
      .select(col(minCol).as("__dmin"), col(maxCol).as("__dmax")))
    candidates.join(dom,
        dominates(col("__dmin"), col("__dmax"), col(minCol), col(maxCol)),
        "left_anti")
  }
}

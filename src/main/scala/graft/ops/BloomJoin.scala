package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter-accelerated joins.
  *
  * At 100 TB the probe side of a selective semi/inner join pays a full
  * shuffle before the join discards most of it. A bloom filter built from
  * the (small) build side and broadcast to the probe scan drops
  * non-matching rows BEFORE the exchange — the same idea as Spark's own
  * runtime row-level filtering (`spark.sql.optimizer.runtime.bloomFilter.
  * enabled`), exposed as an explicit operator so pipelines can apply it
  * where the optimizer's heuristics don't fire (e.g. across materialized
  * stage boundaries). Correctness does not depend on the filter: bloom
  * membership has no false negatives, and the exact join verifies the
  * false positives away, so the result is identical to the plain join.
  */
object BloomJoin {

  /** Exact left-semi join with a bloom pre-filter on the probe side.
    * `expectedItems`/`fpp` size the filter (~ -n·ln(fpp)/ln²2 bits);
    * at fpp=1% a filter for 10M build keys is ~12 MB — broadcastable. */
  def semiJoinExact(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = build.stat.bloomFilter(buildKey, expectedItems, fpp)
    val bfB = probe.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: java.lang.Long) => k != null && bfB.value.mightContainLong(k))
    probe
      .where(might(col(probeKey)))
      .join(build.select(col(buildKey).as(probeKey)).distinct(),
        Seq(probeKey), "left_semi")
  }
}

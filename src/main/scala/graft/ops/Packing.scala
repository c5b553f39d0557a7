package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pre-training: lay documents end-to-end and cut
  * fixed-length training sequences (the standard concatenate-and-chunk
  * layout). Each document gets its shard-local byte-stream coordinates:
  * which training sequence it starts in and at what offset.
  *
  * Scale shape: a single global concatenation order would funnel the
  * cumulative sum through one task, so documents are first sharded
  * deterministically (`doc_id % numShards`) and packed independently per
  * shard — one window shuffle, `numShards`-way parallel, each shard a
  * self-contained stream of training sequences. That is exactly how a
  * multi-worker data loader consumes them.
  */
object Packing {

  /** Assign packing coordinates.
    * @param tokens  column with the document's token count
    * @param seqLen  training sequence length in tokens
    * @return input + `shard`, `cum_before` (tokens ahead of this doc in
    *         its shard stream), `pack_id` (sequence index the doc starts
    *         in), `offset` (position within that sequence)
    */
  def packSequences(df: DataFrame, idCol: String, tokens: Column,
      seqLen: Int, numShards: Int): DataFrame = {
    require(seqLen >= 1 && numShards >= 1)
    val shard = pmod(col(idCol), lit(numShards))
    df.withColumn("shard", shard)
      .withColumn("cum_before", coalesce(sum(tokens).over(
        Window.partitionBy(col("shard")).orderBy(col(idCol))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("pack_id", floor(col("cum_before") / seqLen).cast("long"))
      .withColumn("offset", col("cum_before") % seqLen)
  }
}

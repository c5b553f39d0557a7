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

  /** Length-bucketed batching for padded inference/fine-tuning — the
    * padding-waste minimizer: a batch of similar-length sequences pads
    * each member only to the BATCH max, not the corpus max.
    *
    * Documents land in power-of-two length bands (`band =
    * floor(log2(len))` — deterministic, no corpus statistics needed, so
    * the assignment is stable as the corpus grows); within a band they
    * are ordered longest-first (ties by id) and cut into batches of
    * `batchSize`. Longest-first makes the FIRST batch of a band carry
    * the band's worst padding, and every batch's waste is bounded by the
    * band's 2× length spread.
    *
    * Emitted per document: `band`, `batch_idx` (within the band),
    * `batch_max` (the length everything in the batch pads to), and
    * `pad_waste = batch_max − len`. Σ pad_waste / Σ batch_max·|batch| is
    * the padding-efficiency KPI a serving pipeline tracks.
    *
    * 100 TB shape: one window shuffle partitioned by band — bands are
    * independent and parallel; no global sort, no collect. A band with
    * pathological volume shards further by [[Skew]]'s salting if needed. */
  def lengthBuckets(df: DataFrame, idCol: String, tokens: Column,
      batchSize: Int): DataFrame = {
    require(batchSize >= 1)
    val len = tokens.cast("long")
    // floor(log2) via bit length (len(bin(x))-1): float log2 can land a
    // hair under an integer on one engine and exactly on it on another,
    // flipping floor() — string bit length is integer-exact everywhere
    val band = (length(bin(greatest(len, lit(1L)))) - 1).cast("int")
    val w = Window.partitionBy(col("band"))
      .orderBy(col("__len").desc, col(idCol))
    df.withColumn("__len", len)
      .withColumn("band", band)
      .withColumn("batch_idx",
        floor((row_number().over(w) - 1) / batchSize).cast("long"))
      .withColumn("batch_max", max(col("__len")).over(
        Window.partitionBy(col("band"), col("batch_idx"))))
      .withColumn("pad_waste", col("batch_max") - col("__len"))
      .drop("__len")
  }
}

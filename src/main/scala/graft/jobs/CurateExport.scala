package graft.jobs

import graft.ops.{Export, Sampling, TextAnalysis, TextDedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The complete raw-corpus → training-shards story as ONE call — the job
  * a user of this engine actually runs, composing the individually
  * oracle-gated stages end to end:
  *
  *  1. quality gate ([[TextAnalysis.qualityScore]] ≥ `minQuality`)
  *  2. dedup cascade ([[TextDedup.dedupCascade]]: exact → MinHash-LSH on
  *     representatives → connected components; survivors only)
  *  3. per-language token budget ([[Sampling.tokenBudgetPerGroup]],
  *     highest quality first, deterministic tiebreak)
  *  4. shard export + manifest ([[Export.writeShards]]: hash-mod layout,
  *     one co-located file per shard, signature manifest)
  *
  * Every stage is a DataFrame transform — the whole pipeline is one
  * Catalyst plan up to the shard write, so the quality filter pushes into
  * the document scan and nothing materializes between stages. At 100 TB
  * each stage keeps its own documented shape (projection-speed scoring,
  * banded similarity joins, one shuffle per budget group, one shard
  * co-location shuffle).
  *
  * Returns the written manifest — the artifact a training job validates
  * against before reading ([[Export.shardManifest]] re-aggregated over
  * the shards must equal it; CurateExportSpec proves the identity and
  * stage-composition equivalences).
  */
object CurateExport {

  def run(docs: DataFrame, idCol: String, textCol: String, langCol: String,
      outPath: String, minQuality: Double = 0.5, tokenBudget: Long = 400,
      numShards: Int = 8, salt: String = ""): DataFrame = {
    val scored = docs
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
    val kept = scored.where(col("quality") >= minQuality)
    val survivors = kept.join(
      TextDedup.dedupCascade(kept, idCol, textCol)
        .where(col("keep")).select(idCol),
      Seq(idCol))
    val budgeted = Sampling.tokenBudgetPerGroup(
      survivors.withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol))),
      Seq(langCol), Seq(col("quality").desc, col(idCol).asc),
      col("n_tokens"), budget = tokenBudget)
    Export.writeShards(
      budgeted.select(col(idCol), col(textCol), col(langCol),
        col("n_tokens")),
      idCol, textCol, numShards, outPath, salt)
  }
}

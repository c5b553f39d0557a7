package graft.jobs

import graft.SparkSpec
import graft.ops.{Export, Sampling, TextAnalysis, TextDedup}
import org.apache.spark.sql.functions._

/** End-to-end composition: the one-call pipeline must equal the same
  * stages composed by hand, and its written shards must validate against
  * the returned manifest — the full user story, not just the parts. */
class CurateExportSpec extends SparkSpec {

  private def docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("run ≡ hand-composed stages; written shards validate against the manifest") {
    val path = scratch("curate")
    val manifest = CurateExport.run(docs, "doc_id", "text", "lang",
        outPath = path, minQuality = 0.5, tokenBudget = 400,
        numShards = 4, salt = "e1")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

    // hand-compose the identical stages
    val scored = docs.withColumn("quality",
      TextAnalysis.qualityScore(col("text")))
    val kept = scored.where(col("quality") >= 0.5)
    val survivors = kept.join(
      TextDedup.dedupCascade(kept, "doc_id", "text")
        .where(col("keep")).select("doc_id"), Seq("doc_id"))
    val budgeted = Sampling.tokenBudgetPerGroup(
      survivors.withColumn("n_tokens", TextAnalysis.tokenCount(col("text"))),
      Seq("lang"), Seq(col("quality").desc, col("doc_id").asc),
      col("n_tokens"), budget = 400)
    val expected = Export.shardManifest(
        Export.shardAssign(budgeted, "doc_id", 4, "e1"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(manifest == expected)
    assert(manifest.values.map(_._1).sum > 0, "pipeline kept zero docs")

    // consumer-side validation over what's actually on disk
    val readBack = Export.shardManifest(
        spark.read.parquet(path)
          .withColumn("shard_id", col("shard_id").cast("long")),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(readBack == manifest)

    // pipeline discipline: every exported doc passed the gate and budget
    val exported = spark.read.parquet(path)
    assert(exported.count() == manifest.values.map(_._1).sum)
    val badQuality = exported
      .withColumn("q", TextAnalysis.qualityScore(col("text")))
      .where(col("q") < 0.5).count()
    assert(badQuality == 0, "a below-gate doc leaked into the export")
  }
}

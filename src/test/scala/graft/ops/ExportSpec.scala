package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExportSpec extends SparkSpec {

  private def docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("writeShards: one file per shard dir, read-back manifest matches written") {
    val path = scratch("shards")
    val manifest = Export.writeShards(docs, "doc_id", "text",
        numShards = 4, path = path, salt = "s0")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(manifest.keySet == Set(0L, 1L, 2L, 3L))
    // every shard directory holds exactly ONE data file
    (0 to 3).foreach { s =>
      val files = new java.io.File(s"$path/shard_id=$s")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $s has ${files.length} files")
    }
    // the consumer-side validation: re-aggregate what was written and
    // compare against the manifest
    val readBack = Export.shardManifest(
        // partition-dir read-back infers shard_id as int — re-widen
        spark.read.parquet(path)
          .withColumn("shard_id", col("shard_id").cast("long")),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(readBack == manifest)
    // no docs lost: shard doc counts sum to the corpus
    assert(manifest.values.map(_._1).sum == docs.count())
  }

  test("shardAssign: deterministic under repartition, salt rotates the layout") {
    def layout(salt: String, df: org.apache.spark.sql.DataFrame) =
      Export.shardAssign(df, "doc_id", 4, salt)
        .select(col("doc_id"), col("shard_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = layout("s0", docs)
    assert(layout("s0", docs.repartition(7)) == base)
    assert(layout("s1", docs) != base, "salt must rotate the layout")
    assert(base.values.forall(s => s >= 0 && s < 4))
  }
}

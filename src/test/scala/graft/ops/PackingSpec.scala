package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences lays docs end-to-end with correct coordinates") {
    // single shard: doc token counts 1000, 1500, 600 with seqLen 2048
    val df = Seq((0L, 1000L), (8L, 1500L), (16L, 600L)).toDF("doc_id", "n")
    val out = Packing.packSequences(df, "doc_id", col("n"), 2048, 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("cum_before"),
        r.getAs[Long]("pack_id"), r.getAs[Long]("offset")))
    assert(out.toSeq == Seq(
      (0L, 0L, 0L, 0L),        // starts sequence 0 at offset 0
      (8L, 1000L, 0L, 1000L),  // still inside sequence 0
      (16L, 2500L, 1L, 452L))) // crossed into sequence 1
  }

  test("shards pack independently and partition the corpus") {
    val df = (0L until 100L).map(i => (i, 10L)).toDF("doc_id", "n")
    val out = Packing.packSequences(df, "doc_id", col("n"), 64, 4)
    assert(out.count() == 100)
    val shards = out.groupBy("shard").agg(count(lit(1)).as("c"),
      max("cum_before").as("m")).collect()
    assert(shards.length == 4)
    // 25 docs x 10 tokens per shard: last doc's cum_before = 240 in each
    assert(shards.forall(_.getLong(2) == 240L))
  }

  test("lengthBuckets: pow2 bands, longest-first batches, exact pad waste") {
    // lengths: band 2 holds 4..7, band 3 holds 8..15
    val df = Seq((1L, 7), (2L, 6), (3L, 5), (4L, 4), (5L, 8), (6L, 15))
      .toDF("doc_id", "toks")
    val out = Packing.lengthBuckets(df, "doc_id", col("toks"), batchSize = 2)
      .select("doc_id", "band", "batch_idx", "batch_max", "pad_waste")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out == Map(
      1L -> (2, 0L, 7L, 0L), 2L -> (2, 0L, 7L, 1L),   // batch {7,6} pads to 7
      3L -> (2, 1L, 5L, 0L), 4L -> (2, 1L, 5L, 1L),   // batch {5,4} pads to 5
      6L -> (3, 0L, 15L, 0L), 5L -> (3, 0L, 15L, 7L)))// batch {15,8}
  }

  test("lengthBuckets: zero/one-token docs land in band 0, never crash") {
    val df = Seq((1L, 0), (2L, 1), (3L, 1)).toDF("doc_id", "toks")
    val out = Packing.lengthBuckets(df, "doc_id", col("toks"), batchSize = 10)
      .select("doc_id", "band", "pad_waste").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.forall(_._2 == 0))
    // the zero-length doc pads to the batch max of 1
    assert(out.find(_._1 == 1L).get._3 == 1L)
  }
}

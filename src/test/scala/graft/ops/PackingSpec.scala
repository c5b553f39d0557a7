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
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.synthetic(spark, 30)

  test("decode attaches metadata struct, per-partition batch shape") {
    val out = Multimodal.decode(media)
    assert(out.schema.fieldNames.contains("decoded"))
    val rows = out.select("kind", "decoded.format", "decoded.ok").collect()
    assert(rows.length == 30)
    assert(rows.forall(_.getBoolean(2)))
    assert(rows.filter(_.getString(0) == "image").forall(_.getString(1) == "stub/png"))
  }

  test("decode is silent on corrupt/null payloads") {
    import spark.implicits._
    val corrupt = Seq((99L, "image", null: Array[Byte], "u"))
      .toDF("media_id", "kind", "payload", "source_url")
    val d = Multimodal.decode(corrupt).select("decoded.ok").head()
    assert(!d.getBoolean(0))
  }

  test("decode is deterministic (stub codec, no RNG)") {
    val a = Multimodal.decode(media).select("media_id", "decoded.width")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val b = Multimodal.decode(media).select("media_id", "decoded.width")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(a == b)
  }

  test("extractFeatures emits unit-norm embeddings without the payload") {
    val f = Multimodal.extractFeatures(media, dim = 16)
    assert(f.schema.fieldNames.toSeq == Seq("media_id", "embedding"))
    val vecs = f.collect().map(_.getSeq[Float](1))
    assert(vecs.forall(_.length == 16))
    assert(vecs.forall(v => math.abs(v.map(x => x.toDouble * x).sum - 1.0) < 1e-3))
  }

  test("resize fits the box preserving aspect, never upscales, skips corrupt") {
    import spark.implicits._
    val out = Multimodal.resize(media, 64, 64)
      .select("media_id", "kind", "out_width", "out_height").collect()
    val decoded = Multimodal.decode(media)
      .select("media_id", "decoded.width", "decoded.height")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    out.filter(_.getString(1) != "audio").foreach { r =>
      val (w0, h0) = decoded(r.getLong(0))
      val (w, h) = (r.getInt(2), r.getInt(3))
      assert(w <= 64 && h <= 64)
      assert(w <= w0 && h <= h0) // never upscale
      val scale = math.min(1.0, math.min(64.0 / w0, 64.0 / h0))
      assert(w == math.max(1, (w0 * scale).toInt))
      assert(h == math.max(1, (h0 * scale).toInt))
    }
    val corrupt = Seq((99L, "image", null: Array[Byte], "u"))
      .toDF("media_id", "kind", "payload", "source_url")
    val c = Multimodal.resize(corrupt, 64, 64).select("out_width").head()
    assert(c.isNullAt(0)) // silent skip, no exception
  }

  test("sampleFrames explodes video payload chunks with indices") {
    val frames = Multimodal.sampleFrames(media, stride = 2, frameBytes = 256)
    val byId = frames.groupBy("media_id").agg(count(lit(1)).as("n"),
      min("frame_index").as("lo")).collect()
    assert(byId.nonEmpty)
    assert(byId.forall(_.getInt(2) == 0)) // frame indices start at 0
    // only video rows explode
    val videoIds = media.where(col("kind") === "video")
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(frames.select("media_id").collect().map(_.getLong(0)).toSet.subsetOf(videoIds))
  }

  test("end-to-end multimodal similarity: decode -> embed -> cosine top-k") {
    val embedded = Multimodal.extractFeatures(media, dim = 16)
      .withColumnRenamed("media_id", "vec_id")
    val nn = Ann.cosineTopK(embedded, embedded, "vec_id", "embedding", 16, 3)
    val byQuery = nn.collect().groupBy(_.getLong(0))
    assert(byQuery.size == 30 && byQuery.values.forall(_.length == 3))
    // deterministic stub: re-running the whole pipeline reproduces ranks
    val again = Ann.cosineTopK(embedded, embedded, "vec_id", "embedding", 16, 3)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val first = nn.collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(again == first)
  }

  test("sizeBuckets gives big rows dedicated buckets, bounds small buckets") {
    import spark.implicits._
    val skewed = Multimodal.synthetic(spark, 20).unionByName(
      Seq((100L, "video", Array.fill[Byte](50000)(1), "big"))
        .toDF("media_id", "kind", "payload", "source_url"))
    val (bucketed, n) = Multimodal.sizeBuckets(skewed, targetBytes = 8192)
    val rows = bucketed.select("media_id", "__bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.size == 21 && n >= 2)
    val bigBucket = rows(100L)
    assert(rows.count(_._2 == bigBucket) == 1) // the 50 KB row rides alone
    // repartition round-trips without losing rows
    assert(Multimodal.repartitionBySize(skewed, 8192).count() == 21)
  }
}

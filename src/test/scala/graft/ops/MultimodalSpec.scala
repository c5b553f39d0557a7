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

  test("JdkImageCodec decodes, embeds, and transcodes REAL PNGs (pure-JDK path)") {
    import spark.implicits._
    // build genuine PNG payloads with javax.imageio itself
    def png(w: Int, h: Int, seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, (x * 31 + y * 17 + seed) * 2654435761L.toInt)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, "image", png(64, 48, 1), "s1"),
      (2L, "image", png(300, 100, 2), "s2"),
      (3L, "image", Array[Byte](1, 2, 3), "corrupt"),   // not an image
      (4L, "audio", Array[Byte](9, 9), "a")             // falls to stub
    ).toDF("media_id", "kind", "payload", "source_url")

    val dec = Multimodal.decode(media, Multimodal.JdkImageCodec)
      .select("media_id", "decoded.format", "decoded.width",
        "decoded.height", "decoded.ok")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getBoolean(4))).toMap
    assert(dec(1L) == (("image/png", 64, 48, true)))
    assert(dec(2L) == (("image/png", 300, 100, true)))
    assert(dec(3L)._4 == false) // corrupt: silent skip, no throw
    assert(dec(4L) == (("stub/wav", 0, 0, true)))

    // resize: aspect preserved, never upscaled, output decodes to (w, h)
    val rs = Multimodal.resize(media.where(col("kind") === "image"),
        maxW = 100, maxH = 100, codec = Multimodal.JdkImageCodec)
      .select("media_id", "out_width", "out_height", "resized")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), r.getAs[Array[Byte]](3))).toMap
    assert(rs(1L)._1.contains(64) && rs(1L)._2.contains(48)) // fits: untouched
    assert(rs(2L)._1.contains(100) && rs(2L)._2.contains(33)) // 300x100 → 100x33
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(rs(2L)._3))
    assert(back.getWidth == 100 && back.getHeight == 33) // REALLY transcoded
    assert(rs(3L)._1.isEmpty && rs(3L)._3 == null) // corrupt → null row

    // embed: unit-norm real feature, deterministic
    val e = Multimodal.extractFeatures(media.where(col("media_id") === 1L),
      dim = 27, codec = Multimodal.JdkImageCodec)
      .head.getSeq[Float](1)
    assert(e.length == 27)
    assert(math.abs(e.map(x => x * x).sum - 1.0f) < 1e-3)
  }

  test("JdkAudioCodec decodes, embeds, and transcodes REAL WAVs (pure-JDK path)") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // build a genuine stereo 16-bit WAV: sine at `hz`, one second
    def wav(hz: Double, rate: Float = 8000f, seconds: Double = 1.0): Array[Byte] = {
      val n = (rate * seconds).toInt
      val bytes = new Array[Byte](n * 4) // 2 ch × 2 bytes
      for (i <- 0 until n) {
        val s = (math.sin(2 * math.Pi * hz * i / rate) * 12000).toInt
        // left = sine, right = half-amplitude sine
        bytes(4 * i) = (s & 0xff).toByte; bytes(4 * i + 1) = ((s >> 8) & 0xff).toByte
        val r = s / 2
        bytes(4 * i + 2) = (r & 0xff).toByte; bytes(4 * i + 3) = ((r >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(rate, 16, 2, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, "audio", wav(440.0), "a440"),
      (2L, "audio", wav(880.0, seconds = 2.0), "a880"),
      (3L, "audio", Array[Byte](1, 2, 3), "corrupt"),
      (4L, "image", Array[Byte](9, 9), "img")          // falls to stub
    ).toDF("media_id", "kind", "payload", "source_url")

    val dec = Multimodal.decode(media, Multimodal.JdkAudioCodec)
      .select("media_id", "decoded.format", "decoded.width",
        "decoded.height", "decoded.duration_ms", "decoded.ok")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getBoolean(5))).toMap
    // width=sample rate, height=channels (the audio reading of the shape slots)
    assert(dec(1L) == (("audio/wav", 8000, 2, 1000L, true)))
    assert(dec(2L) == (("audio/wav", 8000, 2, 2000L, true)))
    assert(!dec(3L)._5) // corrupt: silent skip
    assert(dec(4L)._1 == "stub/png") // non-audio delegates to stub

    // embed: unit-norm acoustic envelope, deterministic, content-sensitive
    def emb(id: Long) = Multimodal.extractFeatures(
        media.where(col("media_id") === id), dim = 16,
        codec = Multimodal.JdkAudioCodec).head.getSeq[Float](1)
    val e1 = emb(1L); val e1b = emb(1L); val e2 = emb(2L)
    assert(e1.length == 16 && math.abs(e1.map(x => x * x).sum - 1.0f) < 1e-3)
    assert(e1 == e1b, "embedding must be deterministic")
    // constant-amplitude sine: energy flat across buckets → near-uniform
    assert(e1.forall(x => math.abs(x - 0.25f) < 0.01f), s"envelope: $e1")

    // transcode: REALLY re-encoded as mono 16-bit WAV, content preserved
    val t = Multimodal.JdkAudioCodec.transcode(wav(440.0), 0, 0)
    val ff = AudioSystem.getAudioFileFormat(new java.io.ByteArrayInputStream(t))
    assert(ff.getFormat.getChannels == 1 && ff.getFormat.getSampleSizeInBits == 16)
    val roundTrip = Multimodal.JdkAudioCodec.decode("audio", t)
    assert(roundTrip.ok && roundTrip.durationMs == 1000L)

    // the dispatching codec routes by sniffing: audio bytes → audio path
    val viaDispatch = Multimodal.JdkCodec.decode("audio", wav(440.0))
    assert(viaDispatch.format == "audio/wav" && viaDispatch.ok)
  }

  test("pHash: stable under re-encode/resize, separates different images") {
    import spark.implicits._
    // a scene with real low-frequency structure (proportional rectangles
    // over a base tone) — a plain gradient would be a degenerate fixture:
    // its separable spectrum zeroes 49 of the 63 off-DC coefficients and
    // the median threshold becomes numerical noise
    def scene(w: Int, h: Int, mark: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      def grey(v: Int) = (v << 16) | (v << 8) | v
      for (x <- 0 until w; y <- 0 until h) {
        val (fx, fy) = (x.toDouble / w, y.toDouble / h)
        val v =
          if (fx > 0.1 && fx < 0.4 && fy > 0.1 && fy < 0.3) 240
          else if (fx > 0.5 && fx < 0.9 && fy > 0.4 && fy < 0.8) 120
          else if (fx > 0.2 && fx < 0.35 && fy > 0.6 && fy < 0.9) 30
          else 70
        img.setRGB(x, y, grey(v))
      }
      if (mark) for (x <- 0 until 4; y <- 0 until 4)
        img.setRGB(x, y, grey(255)) // small local edit
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def diagonal(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, if (x * h > y * w) 0xffffff else 0)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, "image", scene(64, 64, mark = false), "s"),
      (2L, "image", scene(96, 96, mark = false), "s"),   // same scene, resized
      (3L, "image", scene(64, 64, mark = true), "s"),    // small edit
      (4L, "image", diagonal(64, 64), "s"),              // different scene
      (5L, "image", Array[Byte](1, 2, 3), "corrupt"),
      (6L, "audio", Array[Byte](9), "a")
    ).toDF("media_id", "kind", "payload", "source_url")
    val h = Multimodal.imagePhash(media).collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(h(5L).isEmpty && h(6L).isEmpty) // corrupt / non-image → null
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // near: resize and a 4×4 edit barely move the low-frequency spectrum
    assert(ham(h(1L).get, h(2L).get) <= 6,
      s"resize moved pHash ${ham(h(1L).get, h(2L).get)} bits")
    assert(ham(h(1L).get, h(3L).get) <= 6,
      s"small edit moved pHash ${ham(h(1L).get, h(3L).get)} bits")
    // far: a different scene disagrees on a large share of the 64 bits
    assert(ham(h(1L).get, h(4L).get) >= 16,
      s"different images only ${ham(h(1L).get, h(4L).get)} bits apart")
  }

  test("phashDupPairs: pigeonhole blocking is lossless, exact filter is tight") {
    import spark.implicits._
    val hashes = Seq(
      (1L, Some(0L)),
      (2L, Some(7L)),                  // hamming 3 from id 1 — all in ONE block
      (3L, Some(0xfL)),                // hamming 4 from id 1 — over threshold
      (4L, Some(-1L)),                 // far from everything
      (5L, None: Option[Long])         // undecodable: excluded
    ).toDF("media_id", "phash")
    val got = Multimodal.phashDupPairs(hashes, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    // (1,2) h=3 kept; (2,3) h=1 kept; (1,3) h=4 dropped; 4/5 pair with no one
    assert(got == Set((1L, 2L, 3), (2L, 3L, 1)))
  }

  test("phashDupPairs: losslessness holds where fixed-width blocks aliased (mod-64 shifts)") {
    import spark.implicits._
    // maxHamming=8 → 9 blocks; ceil(64/9)=8-bit fixed blocks put block 8
    // at start bit 64, which mod-64 shift ALIASED to block 0 — an
    // adversarial pair flipping one bit in each of the 8 REAL blocks
    // (none in the aliased phantom) was silently dropped. With the
    // balanced partition [64i/9, 64(i+1)/9) the pigeonhole must hold.
    // Balanced bounds: 0,7,14,21,28,35,42,49,56,64 — flip one bit in
    // each of the FIRST 8 blocks; block 8 ([56,64)) stays equal.
    val flips = Seq(0, 7, 14, 21, 28, 35, 42, 49)
      .map(b => 1L << b).reduce(_ | _)
    val hashes = Seq((1L, Some(0L)), (2L, Some(flips))).toDF("media_id", "phash")
    assert(java.lang.Long.bitCount(flips) == 8)
    val got = Multimodal.phashDupPairs(hashes, maxHamming = 8)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 8)),
      "a true pair at hamming exactly maxHamming must be proposed")
    // differential: blocked result ≡ quadratic exact filter at h=8
    val quad = hashes.as("a").crossJoin(hashes.as("b"))
      .where(col("a.media_id") < col("b.media_id"))
      .select(bit_count(col("a.phash").bitwiseXOR(col("b.phash"))))
      .collect().map(_.getInt(0)).count(_ <= 8)
    assert(got.size == quad)
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

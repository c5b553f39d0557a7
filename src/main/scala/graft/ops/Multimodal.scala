package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads plus typed metadata, with decode / feature-extraction /
  * frame-sampling as per-partition batch transforms.
  *
  * The Spark-side plumbing here is real and tested — schema, partitioning,
  * batch shape, null/corrupt handling — and the codec is pluggable behind
  * [[MediaCodec]]. Two implementations ship: [[JdkImageCodec]], a REAL
  * image path on the JDK's built-in `javax.imageio` (PNG/JPEG/BMP/GIF
  * header decode, raster pooling features, bilinear transcode — no
  * external libraries), and [[StubCodec]], a clearly-marked DETERMINISTIC
  * STUB for the audio/video kinds whose codecs (ffmpeg etc.) this
  * container does not ship. Swapping in a production decoder means one
  * implementation of the trait; every plan shape stays identical.
  *
  * Scale notes (100 TB of media): payloads ride in parquet binary columns —
  * columnar pruning means metadata-only queries never read the bytes.
  * Decode runs as `mapPartitions` (one codec init per partition, not per
  * row). Size-skew (4 KB thumbnails next to 4 GB videos) is the dominant
  * partitioning hazard: [[repartitionBySize]] packs rows into
  * roughly-equal-byte partitions instead of equal-row ones.
  */
object Multimodal {

  /** Media row schema: the payload plus promoted, prunable metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("source_url", StringType, nullable = true)
  ))

  /** Decoded metadata produced by the codec. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("ok", BooleanType, nullable = false)
  ))

  final case class Decoded(format: String, width: Int, height: Int,
      nFrames: Int, durationMs: Long, ok: Boolean)

  /** The codec contract every transform runs behind: decode metadata,
    * extract features, transcode to a bounded size. Implementations must
    * be Serializable (they ship to executors) and must NEVER throw on
    * corrupt payloads — return ok=false / empty instead (a 100 TB job
    * cannot die on one truncated file). */
  trait MediaCodec extends Serializable {
    def decode(kind: String, payload: Array[Byte]): Decoded
    def embed(payload: Array[Byte], dim: Int): Array[Float]
    /** Re-encode the payload scaled to exactly (w, h); passthrough when
      * the implementation cannot transcode. */
    def transcode(payload: Array[Byte], w: Int, h: Int): Array[Byte]
  }

  /** ======== DETERMINISTIC STUB CODEC ========
    * Stands in for ffmpeg/soundfile, which are not in this container.
    * Synthesizes plausible metadata and features purely from the payload
    * bytes, so tests are reproducible. [[JdkImageCodec]] is the real
    * image implementation; contracts stay fixed. */
  object StubCodec extends MediaCodec {

    /** Byte-derived fake decode; null/empty payload → ok=false row (the
      * `silent` skip policy — corrupt media must never kill a 100 TB job). */
    def decode(kind: String, payload: Array[Byte]): Decoded =
      if (payload == null || payload.isEmpty)
        Decoded(null, 0, 0, 0, 0L, ok = false)
      else {
        val b0 = payload(0) & 0xff
        val b1 = payload(payload.length / 2) & 0xff
        kind match {
          case "image" => Decoded("stub/png", 16 + b0 % 240, 16 + b1 % 240, 1, 0L, ok = true)
          case "audio" => Decoded("stub/wav", 0, 0, 0, 1000L * (1 + b0 % 60), ok = true)
          case _       => Decoded("stub/mp4", 16 + b0 % 240, 16 + b1 % 240,
            1 + b1 % 32, 1000L * (1 + b0 % 300), ok = true)
        }
      }

    /** Byte-derived fake embedding (unit-normalized, `dim` floats). */
    def embed(payload: Array[Byte], dim: Int): Array[Float] = {
      val v = new Array[Float](dim)
      if (payload != null && payload.nonEmpty) {
        var i = 0
        while (i < dim) {
          v(i) = ((payload(i % payload.length) & 0xff) - 128) / 128.0f
          i += 1
        }
        val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
        if (n > 0) { var j = 0; while (j < dim) { v(j) /= n; j += 1 } }
      }
      v
    }

    def transcode(payload: Array[Byte], w: Int, h: Int): Array[Byte] = payload
  }

  /** ======== REAL IMAGE CODEC (pure JDK) ========
    * `javax.imageio` ships PNG/JPEG/BMP/GIF/WBMP readers in every JDK —
    * no external libraries — so the image path is fully real:
    *  - [[decode]] reads width/height/format from the stream HEADER
    *    (`reader.getWidth(0)` — no raster allocation for metadata-only
    *    scans);
    *  - [[embed]] decodes, average-pools the raster onto a g×g RGB grid
    *    (g² ·3 ≥ dim), and unit-normalizes — a real, deterministic visual
    *    feature;
    *  - [[transcode]] rescales with bilinear Graphics2D and re-encodes as
    *    PNG.
    * Non-image kinds and undecodable payloads fall back to the stub /
    * ok=false (silent-skip policy). */
  object JdkImageCodec extends MediaCodec {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO

    private def withReader[A](payload: Array[Byte])(
        f: (javax.imageio.ImageReader, javax.imageio.stream.ImageInputStream) => A): Option[A] =
      if (payload == null || payload.isEmpty) None
      else {
        val in = new java.io.ByteArrayInputStream(payload)
        val iis = ImageIO.createImageInputStream(in)
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try { r.setInput(iis); Some(f(r, iis)) }
            catch { case scala.util.control.NonFatal(_) => None }
            finally r.dispose()
          }
        } catch { case scala.util.control.NonFatal(_) => None }
        finally if (iis != null) iis.close()
      }

    def decode(kind: String, payload: Array[Byte]): Decoded =
      if (kind != "image") StubCodec.decode(kind, payload)
      else withReader(payload) { (r, _) =>
        Decoded(s"image/${r.getFormatName.toLowerCase}",
          r.getWidth(0), r.getHeight(0), r.getNumImages(false) max 1, 0L,
          ok = true)
      }.getOrElse(Decoded(null, 0, 0, 0, 0L, ok = false))

    private def readImage(payload: Array[Byte]): Option[BufferedImage] =
      if (payload == null || payload.isEmpty) None
      else
        try Option(ImageIO.read(new java.io.ByteArrayInputStream(payload)))
        catch { case scala.util.control.NonFatal(_) => None }

    def embed(payload: Array[Byte], dim: Int): Array[Float] =
      readImage(payload) match {
        case None => new Array[Float](dim) // undecodable → zero vector
        case Some(img) =>
          val g = math.ceil(math.sqrt(dim / 3.0)).toInt max 1
          val pooled = scaled(img, g, g)
          val v = new Array[Float](dim)
          var i = 0
          while (i < dim) {
            val cell = i / 3
            val rgb = pooled.getRGB(cell % g, (cell / g) % g)
            val chan = (rgb >> (16 - 8 * (i % 3))) & 0xff
            v(i) = (chan - 128) / 128.0f
            i += 1
          }
          val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
          if (n > 0) { var j = 0; while (j < dim) { v(j) /= n; j += 1 } }
          v
      }

    private def scaled(img: BufferedImage, w: Int, h: Int): BufferedImage = {
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val gfx = out.createGraphics()
      try {
        gfx.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        gfx.drawImage(img, 0, 0, w, h, null)
      } finally gfx.dispose()
      out
    }

    def transcode(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      readImage(payload) match {
        case None => payload
        case Some(img) =>
          val bos = new java.io.ByteArrayOutputStream()
          ImageIO.write(scaled(img, w, h), "png", bos)
          bos.toByteArray
      }

    /** 64-bit perceptual hash (pHash): decode → 32×32 bilinear grayscale
      * → 2-D DCT-II (separable, pure JDK) → the 8×8 low-frequency corner
      * → bit set iff coefficient > median (DC term excluded from the
      * median so a flat image doesn't hash to all-ones). Visually-near
      * images land hamming-near — robust to re-encode, resize, and small
      * edits, where byte hashing (exact dedup) is blind. Undecodable →
      * None (silent-skip policy). */
    def phash(payload: Array[Byte]): Option[Long] =
      readImage(payload).map { img =>
        val g = 32
        // box-average resample (NOT drawImage bilinear: minification
        // there point-samples and aliases, so the same scene at two
        // sizes would hash apart) — every source pixel contributes to
        // exactly one cell, scale-robust by construction
        val (w, h) = (img.getWidth, img.getHeight)
        val sums = Array.ofDim[Double](g, g)
        val cnts = Array.ofDim[Int](g, g)
        var y = 0
        while (y < h) {
          val cy = math.min(g - 1, y * g / h)
          var x = 0
          while (x < w) {
            val cx = math.min(g - 1, x * g / w)
            val rgb = img.getRGB(x, y)
            sums(cy)(cx) +=
              0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
                0.114 * (rgb & 0xff)
            cnts(cy)(cx) += 1
            x += 1
          }
          y += 1
        }
        val lum = Array.tabulate(g, g)((cy, cx) =>
          if (cnts(cy)(cx) == 0) 0.0 else sums(cy)(cx) / cnts(cy)(cx))
        def dct1(v: Array[Double]): Array[Double] = Array.tabulate(g) { k =>
          var acc = 0.0; var i = 0
          while (i < g) { acc += v(i) * math.cos(math.Pi * (i + 0.5) * k / g); i += 1 }
          acc
        }
        val rowT = lum.map(dct1)                     // DCT over x per row
        val coef = Array.tabulate(8) { u =>          // DCT over y per column
          val colU = Array.tabulate(g)(y => rowT(y)(u))
          dct1(colU).take(8)                         // coef(u)(v): freq (u=x, v=y)
        }
        val offDc = (for { u <- 0 until 8; v <- 0 until 8
          if u != 0 || v != 0 } yield coef(u)(v)).sorted
        val median = offDc(offDc.length / 2)
        var bits = 0L
        for (u <- 0 until 8; v <- 0 until 8) {
          bits <<= 1
          if (coef(u)(v) > median) bits |= 1L
        }
        bits
      }
  }

  /** ======== REAL AUDIO CODEC (pure JDK) ========
    * `javax.sound.sampled` ships WAV/AIFF/AU readers in every JDK — the
    * audio dual of [[JdkImageCodec]]:
    *  - [[decode]] reads frame count / rate / channels from the FILE
    *    HEADER (`AudioSystem.getAudioFileFormat` — no PCM decode for
    *    metadata-only scans); duration_ms = frames / rate.
    *  - [[embed]] decodes PCM, downmixes to mono, pools per-bucket RMS
    *    energy across `dim` equal time slices, unit-normalizes — a real,
    *    deterministic acoustic envelope feature.
    *  - [[transcode]] downmixes to 16-bit mono PCM WAV (the normalize
    *    step of an ingest pipeline); (w, h) are image-shaped and ignored.
    * Non-audio kinds delegate to the stub; undecodable payloads →
    * ok=false / zero vector / passthrough (silent-skip policy). */
  object JdkAudioCodec extends MediaCodec {
    import javax.sound.sampled.{AudioFormat, AudioSystem}

    def decode(kind: String, payload: Array[Byte]): Decoded =
      if (kind != "audio") StubCodec.decode(kind, payload)
      else if (payload == null || payload.isEmpty) Decoded(null, 0, 0, 0, 0L, ok = false)
      else try {
        val ff = AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(payload))
        val fmt = ff.getFormat
        val frames = ff.getFrameLength
        val durMs =
          if (frames > 0 && fmt.getFrameRate > 0)
            (frames * 1000L / fmt.getFrameRate.toLong)
          else 0L
        Decoded(s"audio/${ff.getType.getExtension}",
          fmt.getSampleRate.toInt, fmt.getChannels, frames max 0, durMs,
          ok = true)
      } catch { case scala.util.control.NonFatal(_) => Decoded(null, 0, 0, 0, 0L, ok = false) }

    /** PCM frames as mono doubles in [-1, 1] (16-bit signed LE target). */
    private def monoSamples(payload: Array[Byte]): Option[Array[Double]] =
      try {
        val in = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val src = in.getFormat
          val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
            src.getSampleRate, 16, 1, 2, src.getSampleRate, false)
          val mono = AudioSystem.getAudioInputStream(target, in)
          val bytes = mono.readAllBytes()
          val out = new Array[Double](bytes.length / 2)
          var i = 0
          while (i < out.length) {
            val lo = bytes(2 * i) & 0xff
            val hi = bytes(2 * i + 1).toInt
            out(i) = ((hi << 8) | lo) / 32768.0
            i += 1
          }
          Some(out)
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }

    def embed(payload: Array[Byte], dim: Int): Array[Float] =
      monoSamples(payload) match {
        case None => new Array[Float](dim)
        case Some(s) if s.isEmpty => new Array[Float](dim)
        case Some(s) =>
          val v = new Array[Float](dim)
          var b = 0
          while (b < dim) {
            val from = (s.length.toLong * b / dim).toInt
            val until = ((s.length.toLong * (b + 1) / dim).toInt) max (from + 1)
            var acc = 0.0; var i = from
            while (i < until && i < s.length) { acc += s(i) * s(i); i += 1 }
            v(b) = math.sqrt(acc / (i - from)).toFloat
            b += 1
          }
          val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
          if (n > 0) { var j = 0; while (j < dim) { v(j) /= n; j += 1 } }
          v
      }

    def transcode(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      try {
        val in = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val src = in.getFormat
          val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
            src.getSampleRate, 16, 1, 2, src.getSampleRate, false)
          val mono = AudioSystem.getAudioInputStream(target, in)
          val bos = new java.io.ByteArrayOutputStream()
          AudioSystem.write(mono,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          bos.toByteArray
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => payload }
  }

  /** Dispatching codec: real JDK implementations where the JDK has one
    * (image, audio), deterministic stub elsewhere (video needs ffmpeg,
    * absent here). The production shape: per-kind codecs behind one
    * contract, chosen per row. */
  object JdkCodec extends MediaCodec {
    def decode(kind: String, payload: Array[Byte]): Decoded = kind match {
      case "image" => JdkImageCodec.decode(kind, payload)
      case "audio" => JdkAudioCodec.decode(kind, payload)
      case _       => StubCodec.decode(kind, payload)
    }
    // embed/transcode route on content sniffing being unnecessary: the
    // callers below always carry `kind` alongside payload rows, but the
    // MediaCodec contract passes only bytes — so probe image first (fast
    // header check), then audio, then stub.
    def embed(payload: Array[Byte], dim: Int): Array[Float] = {
      val img = JdkImageCodec.decode("image", payload)
      if (img.ok) JdkImageCodec.embed(payload, dim)
      else {
        val aud = JdkAudioCodec.decode("audio", payload)
        if (aud.ok) JdkAudioCodec.embed(payload, dim)
        else StubCodec.embed(payload, dim)
      }
    }
    def transcode(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val img = JdkImageCodec.decode("image", payload)
      if (img.ok) JdkImageCodec.transcode(payload, w, h)
      else {
        val aud = JdkAudioCodec.decode("audio", payload)
        if (aud.ok) JdkAudioCodec.transcode(payload, w, h)
        else StubCodec.transcode(payload, w, h)
      }
    }
  }

  /** Decode payloads → metadata struct, one codec per partition (the
    * mapPartitions batch shape a real decoder needs: amortized init,
    * streaming iterator, no whole-partition materialization). */
  def decode(media: DataFrame, codec: MediaCodec = StubCodec): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(media.schema.fields :+
      StructField("decoded", decodedSchema, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      // real codec: init native handles HERE, once per partition
      rows.map { r =>
        val d = codec.decode(r.getString(kindIdx),
          r.getAs[Array[Byte]](payloadIdx))
        Row.fromSeq(r.toSeq :+ Row(d.format, d.width, d.height, d.nFrames,
          d.durationMs, d.ok))
      }
    }(enc)
  }

  /** Feature extraction: payload → `dim`-float embedding column, same
    * per-partition batch shape. Emits only (media_id, embedding) — the
    * binary never travels past this projection. */
  def extractFeatures(media: DataFrame, dim: Int,
      codec: MediaCodec = StubCodec): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        Row(r.getLong(idIdx),
          codec.embed(r.getAs[Array[Byte]](payloadIdx), dim).toSeq)
      }
    }(enc)
  }

  /** Perceptual-hash column: payload → 64-bit pHash
    * ([[JdkImageCodec.phash]]), same per-partition batch shape as
    * [[extractFeatures]]; emits only (media_id, phash) — the binary
    * never travels past this projection. Undecodable/non-image → null. */
  def imagePhash(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("phash", LongType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        val h =
          if (r.getString(kindIdx) != "image") None
          else JdkImageCodec.phash(r.getAs[Array[Byte]](payloadIdx))
        Row(r.getLong(idIdx), h.map(Long.box).orNull)
      }
    }(enc)
  }

  /** Image near-duplicate pairs by pHash hamming distance ≤ `maxHamming`
    * — multi-index hamming blocking (Norouzi et al.): split the 64-bit
    * hash into `maxHamming + 1` disjoint blocks; by pigeonhole, any pair
    * within distance k agrees EXACTLY on ≥1 of the k+1 blocks, so an
    * equi-join per (block idx, block value) finds every candidate —
    * lossless, no cross join, the same banding shape as MinHash LSH.
    * Exact `bit_count(a XOR b)` then filters false positives. One
    * explode (k+1 rows/hash) + one equi-join; at 100 TB the block
    * columns are 8-byte ints, and a degenerate block value (e.g. all
    * zeros from flat images) is a key-skew to salt like any hot join
    * key. */
  def phashDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 64), got $maxHamming")
    val nBlocks = maxHamming + 1
    // BALANCED partition of the 64 bits: block i covers
    // [64i/n, 64(i+1)/n) — every block is ≥1 bit wide for n ≤ 64. The
    // earlier fixed-width spelling (width = ceil(64/n)) pushed the last
    // block's start past bit 63 for n ∈ {9, 11, ...}; long shifts are
    // mod-64, so that block silently ALIASED block 0 instead of covering
    // its own bits, and the pigeonhole guarantee (hamming ≤ n−1 ⇒ some
    // block equal) was broken — true near-dups at exactly maxHamming
    // with one flipped bit per real block were never proposed.
    val bounds = (0 to nBlocks).map(i => 64 * i / nBlocks)
    val blocked = hashes.where(col("phash").isNotNull)
      .select(col("media_id"), col("phash"),
        explode(array((0 until nBlocks).map { i =>
          val start = bounds(i)
          val width = bounds(i + 1) - start
          val mask = if (width >= 64) -1L else (1L << width) - 1
          struct(lit(i).as("blk"),
            shiftrightunsigned(col("phash"), start)
              .bitwiseAND(lit(mask)).as("blkval"))
        }: _*)).as("__b"))
      .select(col("media_id"), col("phash"),
        col("__b.blk").as("blk"), col("__b.blkval").as("blkval"))
    val a = blocked.select(col("blk"), col("blkval"),
      col("media_id").as("media_a"), col("phash").as("__ha"))
    val b = blocked.select(col("blk"), col("blkval"),
      col("media_id").as("media_b"), col("phash").as("__hb"))
    a.join(b, Seq("blk", "blkval"))
      .where(col("media_a") < col("media_b"))
      .select(col("media_a"), col("media_b"),
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).cast("int")
          .as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Resize images/video frames to fit a `maxW`×`maxH` box preserving
    * aspect ratio (never upscaling) — same per-partition batch shape as
    * [[decode]]. The pixel transcode is the stub (payload passes through);
    * the geometry, null/corrupt skip, and batch plumbing are real. Output
    * adds `out_width`/`out_height` and `resized` (binary). */
  def resize(media: DataFrame, maxW: Int, maxH: Int,
      codec: MediaCodec = StubCodec): DataFrame = {
    require(maxW > 0 && maxH > 0)
    val outSchema = StructType(media.schema.fields ++ Seq(
      StructField("out_width", IntegerType, nullable = true),
      StructField("out_height", IntegerType, nullable = true),
      StructField("resized", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      // real codec: init scaler HERE, once per partition
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val d = codec.decode(r.getString(kindIdx), payload)
        if (!d.ok || d.width <= 0 || d.height <= 0)
          Row.fromSeq(r.toSeq ++ Seq(null, null, null)) // silent corrupt skip
        else {
          val scale = math.min(1.0,
            math.min(maxW.toDouble / d.width, maxH.toDouble / d.height))
          val (w, h) = (math.max(1, (d.width * scale).toInt),
            math.max(1, (d.height * scale).toInt))
          Row.fromSeq(r.toSeq ++ Seq(w, h, codec.transcode(payload, w, h)))
        }
      }
    }(enc)
  }

  /** Frame sampling: every `stride`-th chunk of the payload as one frame
    * row (stub chunking stands in for keyframe extraction). posexplode
    * keeps it a narrow generator — no shuffle. */
  def sampleFrames(media: DataFrame, stride: Int, frameBytes: Int): DataFrame = {
    // reject bad arguments at CALL time, not per-row inside the UDF —
    // stride=0 was an ArithmeticException (i % 0) on every video row,
    // failing the whole job after retries (the module's other entry
    // points all require() up front; a 100 TB job cannot die on one row)
    require(stride >= 1, s"stride must be >= 1, got $stride")
    require(frameBytes >= 1, s"frameBytes must be >= 1, got $frameBytes")
    val chunk: UserDefinedFunction =
      udf { (payload: Array[Byte]) =>
        if (payload == null) Array.empty[Array[Byte]]
        else payload.grouped(frameBytes).zipWithIndex
          .collect { case (c, i) if i % stride == 0 => c }
          .toArray
      }
    media
      .where(col("kind") === "video")
      .select(col("media_id"),
        posexplode(chunk(col("payload"))).as(Seq("frame_index", "frame")))
  }

  /** Byte-balanced bucket assignment — the partitioning that matters when
    * one row holds a 4 GB video and the next a 4 KB thumbnail. Two-level,
    * fully distributed (no global sort, no driver loop):
    *  - rows ≥ `targetBytes` each get a dedicated bucket keyed by their id
    *    (bucket ids ≥ `nSmall`, one row per bucket);
    *  - smaller rows hash into nSmall = ceil(totalSmallBytes/targetBytes)
    *    buckets, which concentrates to ~targetBytes per bucket by the law
    *    of large numbers.
    * Returns (bucketed frame with `__bucket`, total bucket count). The only
    * driver-side value is one two-long aggregate. */
  def sizeBuckets(media: DataFrame, targetBytes: Long): (DataFrame, Int) = {
    val sized = media.withColumn("__sz",
      coalesce(length(col("payload")).cast("long"), lit(0L)))
    val agg = sized.agg(
      coalesce(sum(when(col("__sz") < targetBytes, col("__sz"))), lit(0L)),
      coalesce(sum(when(col("__sz") >= targetBytes, 1L)), lit(0L))).head()
    val (smallBytes, bigRows) = (agg.getLong(0), agg.getLong(1))
    val nSmall = math.max(1L, (smallBytes + targetBytes - 1) / targetBytes)
    // one unique bucket per oversized row, with no global sort:
    // monotonically_increasing_id is unique per row and narrow (its
    // concrete values vary with input partitioning — irrelevant for
    // physical placement, which is what buckets feed)
    val big = sized.where(col("__sz") >= targetBytes)
      .withColumn("__bucket", lit(nSmall) + monotonically_increasing_id())
    val small = sized.where(col("__sz") < targetBytes)
      .withColumn("__bucket", pmod(hash(col("media_id")), lit(nSmall)).cast("long"))
    (small.unionByName(big).drop("__sz"), (nSmall + bigRows).toInt)
  }

  /** [[sizeBuckets]] + physical repartition on the bucket key. Hash
    * repartitioning may co-locate a few buckets in one task (hash of the
    * bucket id, not identity placement) — the guarantee is byte-bounded
    * buckets, with expected ~1 bucket per task. */
  def repartitionBySize(media: DataFrame, targetBytes: Long): DataFrame = {
    val (bucketed, n) = sizeBuckets(media, targetBytes)
    bucketed.repartition(math.max(n, 1), col("__bucket")).drop("__bucket")
  }

  /** Deterministic synthetic media table for tests/demos: payload bytes
    * derived from the id (no RNG), sizes spread to exercise skew. */
  def synthetic(spark: SparkSession, n: Int): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val size = 64 + (i * 37) % 4096
      val payload = Array.tabulate[Byte](size)(j => ((i * 131 + j * 17) % 256).toByte)
      Row(i.toLong, kind, payload, s"stub://media/$i")
    }
    spark.createDataFrame(rows.asJava, mediaSchema)
  }
}

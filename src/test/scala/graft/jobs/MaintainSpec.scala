package graft.jobs

import graft.SparkSpec
import graft.core.ZoneMap
import graft.plans.ResultCache
import org.apache.spark.sql.functions._

class MaintainSpec extends SparkSpec {
  import spark.implicits._

  test("fragmented table: compact + zone-map rebuild + cache vacuum, data identical") {
    val tbl = scratch("mt_tbl"); val zm = scratch("mt_zm")
    val cache = scratch("mt_cache")
    // 100 tiny files, then a zone map of the fragmented layout
    spark.range(10000).select(col("id"), (col("id") % 9).as("k"))
      .repartition(100).write.mode("overwrite").parquet(tbl)
    ZoneMap.build(spark, tbl, Seq("id"), zm)
    // a cached result whose fingerprint binds the OLD listing
    ResultCache.through(
      spark.read.parquet(tbl).groupBy(col("k")).count(), cache)
    val sumBefore = spark.read.parquet(tbl)
      .agg(sum(col("id"))).collect().head.getLong(0)

    val now = System.currentTimeMillis()
    val r = Maintain.run(spark, tbl, Seq("id"), zm, Some(cache),
      maxFiles = 10, cacheTtlMs = 0L, nowMs = now + 10000).collect().head
    assert(r.getBoolean(3), "100 files over maxFiles=10 must compact")
    assert(r.getLong(2) < r.getLong(1), s"files must shrink: $r")
    // data untouched by the rewrite
    assert(spark.read.parquet(tbl)
      .agg(sum(col("id"))).collect().head.getLong(0) == sumBefore)
    // the zone map describes the POST-compaction files exactly
    val live = ZoneMap.listDataFiles(spark, tbl).toSet
    val mapped = spark.read.parquet(zm).select("file").collect()
      .map(_.getString(0).replaceFirst("^file:/+", "/")).toSet
    assert(mapped == live, s"zone map stale after compaction")
    // pruning still correct on the new layout
    assert(ZoneMap.readPruned(spark, tbl, zm, "id", 100L, 199L)
      .count() == 100)
    // the superseded cache entry was reaped
    assert(r.getLong(5) == 1L && !ResultCache.isCached(
      spark.read.parquet(tbl).groupBy(col("k")).count(), cache))
  }

  test("healthy table: no compaction, refresh covers the appended file only") {
    val tbl = scratch("mt_ok"); val zm = scratch("mt_ok_zm")
    spark.range(1000).select(col("id")).coalesce(2)
      .write.mode("overwrite").parquet(tbl)
    ZoneMap.build(spark, tbl, Seq("id"), zm)
    spark.range(1000, 1500).select(col("id")).coalesce(1)
      .write.mode("append").parquet(tbl)
    val r = Maintain.run(spark, tbl, Seq("id"), zm, None,
      maxFiles = 64).collect().head
    assert(!r.getBoolean(3), "3 files under maxFiles=64 must not compact")
    assert(r.getLong(1) == r.getLong(2))
    assert(r.getLong(4) == 1L, s"exactly the appended file maps: $r")
    assert(ZoneMap.readPruned(spark, tbl, zm, "id", 1200L, 1299L)
      .count() == 100)
  }

  test("run: cacheDir without nowMs fails loudly instead of no-op vacuuming") {
    val tbl = scratch("mt_now"); val zm = scratch("mt_now_zm")
    spark.range(100).select(col("id")).coalesce(1)
      .write.mode("overwrite").parquet(tbl)
    intercept[IllegalArgumentException] {
      Maintain.run(spark, tbl, Seq("id"), zm, Some(scratch("mt_now_c")))
    }
  }

  // --- IVF retrain policy -------------------------------------------------

  private def blobs(n: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val base = if (i % 2 == 0) Array(1f, 0f, 0f, 0f) else Array(0f, 1f, 0f, 0f)
      (i.toLong, base.map(_ + rnd.nextFloat() * 0.05f))
    }
  }

  test("maintainIvf: un-drifted appends are a strict no-op — index byte-stable") {
    import graft.ops.Ann
    val idx = scratch("mt_ivf_ok")
    Ann.buildIvfIndex(blobs(200, 1).toDF("vec_id", "vec"), "vec_id", "vec",
      4, numCentroids = 2, idx, kmeansIters = 5)
    // append MORE of the same two blobs: cell means stay put
    Ann.ivfAppend(spark, idx,
      blobs(60, 2).map { case (i, v) => (i + 1000L, v) }.toDF("vec_id", "vec"),
      "vec_id", "vec", 4)
    def snapshot(): Map[String, (Long, Long)] =
      Seq("centroids", "assignments").flatMap { d =>
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(s"$idx/$d"))
          .filter(_.getName.endsWith(".parquet"))
          .map(f => f.getPath -> ((f.lastModified(), f.length())))
      }.toMap
    val before = snapshot()
    val r = Maintain.maintainIvf(spark, idx, 4, numCentroids = 2,
      staleThreshold = 0.5).collect().head
    assert(!r.getBoolean(3), s"clean appends must not trigger retrain: $r")
    assert(r.getDouble(2) < 0.5 && r.getLong(1) == 2L, s"report: $r")
    assert(snapshot() == before, "no-op maintenance must not move a byte")
  }

  test("maintainIvf: drifted appends trigger retrain with FRESH centroids") {
    import graft.ops.Ann
    val idx = scratch("mt_ivf_drift")
    Ann.buildIvfIndex(blobs(200, 3).toDF("vec_id", "vec"), "vec_id", "vec",
      4, numCentroids = 2, idx, kmeansIters = 5)
    val centsBefore = spark.read.parquet(s"$idx/centroids")
      .orderBy(col("cid")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toList)).toList
    // a THIRD blob far from both centroids: whichever cell absorbs it
    // gets a mean dragged ~halfway to (0,0,5,5) — staleness >> 0.5
    val rnd = new scala.util.Random(4)
    val far = (0 until 200).map(i => (5000L + i,
      Array(0f, 0f, 5f, 5f).map(_ + rnd.nextFloat() * 0.05f)))
      .toDF("vec_id", "vec")
    Ann.ivfAppend(spark, idx, far, "vec_id", "vec", 4)
    val stale = Ann.ivfStaleness(spark, idx, 4).agg(max(col("stale")))
      .collect().head.getDouble(0)
    assert(stale > 0.5, s"fixture should drift a cell, max stale = $stale")
    val r = Maintain.maintainIvf(spark, idx, 4, numCentroids = 2,
      staleThreshold = 0.5, kmeansIters = 10).collect().head
    assert(r.getBoolean(3), s"drift past threshold must rebuild: $r")
    val centsAfter = spark.read.parquet(s"$idx/centroids")
      .orderBy(col("cid")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toList)).toList
    assert(centsAfter != centsBefore, "rebuild must produce fresh centroids")
    // the rebuilt index carries every vector (old + appended)
    assert(spark.read.parquet(s"$idx/assignments").count() == 400L)
    // and the fresh centroids fit the NEW distribution: staleness collapses
    val staleAfter = Ann.ivfStaleness(spark, idx, 4)
      .agg(max(col("stale"))).collect().head.getDouble(0)
    assert(staleAfter < 0.5, s"post-rebuild staleness should collapse: $staleAfter")
  }

  test("maintainIvf: retrain folds live deltas and preserves the watermark") {
    import graft.ops.Ann
    val idx = scratch("mt_ivf_delta")
    Ann.buildIvfIndex(blobs(200, 11).toDF("vec_id", "vec"), "vec_id", "vec",
      4, numCentroids = 2, idx, kmeansIters = 3)
    // streaming lifecycle: one folded batch (advances the watermark),
    // then a LIVE un-compacted delta carrying the drifting blob
    Ann.ivfDeltaAppend(spark, idx,
      blobs(50, 12).map { case (i, v) => (i + 2000L, v) }.toDF("vec_id", "vec"),
      "vec_id", "vec", 4, 0L)
    Ann.ivfCompactDeltas(spark, idx)
    assert(Ann.ivfWatermark(spark, idx) == 0L)
    val rnd = new scala.util.Random(13)
    val far = (0 until 200).map(i => (5000L + i,
      Array(0f, 0f, 5f, 5f).map(_ + rnd.nextFloat() * 0.05f)))
      .toDF("vec_id", "vec")
    Ann.ivfDeltaAppend(spark, idx, far, "vec_id", "vec", 4, 1L)
    // drift measured over base only; the appended far blob sits in a
    // delta, so drift the base too via a direct append
    Ann.ivfAppend(spark, idx, far.withColumn("vec_id", col("vec_id") + 10000L),
      "vec_id", "vec", 4)
    val r = Maintain.maintainIvf(spark, idx, 4, numCentroids = 2,
      staleThreshold = 0.5, kmeansIters = 3).collect().head
    assert(r.getBoolean(3), s"drifted fixture must rebuild: $r")
    // every vector the index owned — base, folded batch, LIVE delta —
    // is in the rebuilt base
    assert(spark.read.parquet(s"$idx/assignments").count() == 650L)
    // the watermark survived the rebuild's overwrite: a replay of the
    // folded batches stays hidden instead of double-counting
    assert(Ann.ivfWatermark(spark, idx) == 1L,
      "rebuild must re-stamp the compaction watermark")
    Ann.ivfDeltaAppend(spark, idx,
      blobs(50, 12).map { case (i, v) => (i + 2000L, v) }.toDF("vec_id", "vec"),
      "vec_id", "vec", 4, 0L) // replayed old batch
    assert(Ann.readIvfAssignments(spark, idx).count() == 650L,
      "replayed pre-rebuild batch must not double-count")
  }

  test("maintainIvf: auto-dial retrain re-sizes K from the GROWN corpus") {
    import graft.ops.Ann
    val idx = scratch("mt_ivf_auto")
    // explicit K=2 at build over 200 vectors, then a drifted 900-vector
    // blob grows the corpus to 1100 — the retrain (numCentroids = 0)
    // must re-size to ceil(1100/512) = 3. Assertion is vs the formula.
    Ann.buildIvfIndex(blobs(200, 7).toDF("vec_id", "vec"), "vec_id", "vec",
      4, numCentroids = 2, idx, kmeansIters = 3)
    val rnd = new scala.util.Random(8)
    val far = (0 until 900).map(i => (9000L + i,
      Array(0f, 0f, 5f, 5f).map(_ + rnd.nextFloat() * 0.05f)))
      .toDF("vec_id", "vec")
    Ann.ivfAppend(spark, idx, far, "vec_id", "vec", 4)
    val n = spark.read.parquet(s"$idx/assignments").count()
    assert(n == 1100L)
    val r = Maintain.maintainIvf(spark, idx, 4, numCentroids = 0,
      staleThreshold = 0.5, kmeansIters = 3).collect().head
    assert(r.getBoolean(3), s"drifted fixture must rebuild: $r")
    val k = spark.read.parquet(s"$idx/centroids").count()
    assert(k == Ann.autoGranularity(n).toLong,
      s"retrain must re-size K = ceil($n/512) = ${Ann.autoGranularity(n)}, got $k")
    assert(spark.read.parquet(s"$idx/assignments").count() == n)
  }
}

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
}

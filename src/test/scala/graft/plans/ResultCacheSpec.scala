package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ResultCacheSpec extends SparkSpec {
  import spark.implicits._

  private def mkSource(dir: String, n: Long): Unit =
    spark.range(n).select(col("id"), (col("id") % 7).as("k"))
      .coalesce(1).write.mode("append").parquet(dir)

  private def q(src: String) =
    spark.read.parquet(src).groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("s"))

  test("miss computes and stores; identical re-ask serves from the cache copy") {
    val src = scratch("rc_src"); val cache = scratch("rc_cache")
    mkSource(src, 1000)
    assert(!ResultCache.isCached(q(src), cache))
    val first = ResultCache.through(q(src), cache)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ResultCache.isCached(q(src), cache), "entry must persist")
    val second = ResultCache.through(q(src), cache)
    // the served frame scans the CACHE parquet, not the source
    assert(second.inputFiles.forall(_.contains(cache.split("/").last)),
      s"hit must read the cache copy: ${second.inputFiles.toSeq}")
    assert(second.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet == first)
    assert(first == q(src).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("alias spelling collapses to one entry; a different literal does not") {
    val src = scratch("rc_alias"); val cache = scratch("rc_alias_cache")
    mkSource(src, 100)
    val a = spark.read.parquet(src).where(col("id") > 10L)
      .select(col("k").as("x"))
    val b = spark.read.parquet(src).where(col("id") > 10L)
      .select(col("k").as("y"))
    assert(ResultCache.fingerprint(a) == ResultCache.fingerprint(b),
      "canonicalization must ignore alias names")
    val c = spark.read.parquet(src).where(col("id") > 11L)
      .select(col("k").as("x"))
    assert(ResultCache.fingerprint(a) != ResultCache.fingerprint(c),
      "a different literal is a different computation")
  }

  test("appending to the source invalidates: new fingerprint, fresh result") {
    val src = scratch("rc_inval"); val cache = scratch("rc_inval_cache")
    mkSource(src, 500)
    val before = ResultCache.through(q(src), cache)
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(before == 500L)
    mkSource(src, 300) // append: listing + mtimes change
    assert(!ResultCache.isCached(q(src), cache),
      "stale fingerprint must not serve after the data changed")
    val after = ResultCache.through(q(src), cache)
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(after == 800L, s"must recompute over the grown source: $after")
  }

  test("vacuum reaps old entries and leaves fresh ones") {
    val src = scratch("rc_vac"); val cache = scratch("rc_vac_cache")
    mkSource(src, 50)
    ResultCache.through(q(src), cache)
    val now = System.currentTimeMillis()
    assert(ResultCache.vacuum(spark, cache, maxAgeMs = 3600000L,
      nowMs = now) == 0, "fresh entry must survive")
    assert(ResultCache.vacuum(spark, cache, maxAgeMs = 0L,
      nowMs = now + 10000) == 1, "aged entry must be reaped")
    assert(!ResultCache.isCached(q(src), cache))
  }
}

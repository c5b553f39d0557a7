package graft.core

import graft.SparkSpec
import graft.entities.Fixtures
import graft.ingest.Staging
import graft.jobs.ProcessDaily

/** SQL-first access: the curated warehouse and the test corpus register
  * as views, and multi-table SQL (the reference users' surface) runs
  * against them with engine functions available. */
class TablesSpec extends SparkSpec {

  test("registerCurated exposes the warehouse to spark.sql joins") {
    val dir = scratch("graft-views")
    Fixtures.writeStandardFixture(s"$dir/raw/v1")
    ProcessDaily.stageAndProcess(spark, s"$dir/raw/v1", s"$dir/staging",
      s"$dir/curated", Fixtures.day1)
    val tables = Tables.registerCurated(spark, s"$dir/curated")
    assert(tables.contains("commit") && tables.contains("repo"))
    assert(tables.size == 33)
    val joined = spark.sql(
      """SELECT c.etl_source_id, f.filename
        |FROM commit c JOIN commit_file f ON f.etl_source_id = c.etl_source_id
        |ORDER BY f.element_index""".stripMargin)
    assert(joined.count() >= 2)
  }

  test("saveBucketed: co-bucketed join plans with zero shuffle exchanges (S7 fidelity)") {
    import spark.implicits._
    val left = (0L until 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (0L until 1000L by 3).map(i => (i, s"r$i")).toDF("k", "rv")
    Tables.saveBucketed(left, "bkt_left", buckets = 8, keys = Seq("k"),
      sortKeys = Seq("k"))
    Tables.saveBucketed(right, "bkt_right", buckets = 8, keys = Seq("k"),
      sortKeys = Seq("k"))
    try {
      // forbid broadcast so the test can't pass vacuously
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
        assert(joined.count() === 334)
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"co-bucketed join must not shuffle:\n$plan")
        // differential: same rows as the unbucketed join
        val want = left.join(right, "k").count()
        assert(joined.count() === want)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("schema evolution: mergeSchema unifies widened snapshots, old rows null-filled") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // day 1: the crawler emits (urn, sha); day 2 adds a column (message) —
    // the reference handles this by editing DDL + full rebuild; a data
    // lake handles it by reading with schema merge: the union schema, old
    // rows null for the new column, no rewrite of day-1 files
    val dir = scratch("schema-evo")
    Seq(("urn:c:1", "v1")).toDF("urn", "sha")
      .write.parquet(s"$dir/d=2024-01-01")
    Seq(("urn:c:2", "v2", "fix build")).toDF("urn", "sha", "message")
      .write.parquet(s"$dir/d=2024-01-02")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("urn", "sha", "message", "d"))
    val rows = merged.select("urn", "message").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(rows("urn:c:1").isEmpty)            // old row: null-filled
    assert(rows("urn:c:2").contains("fix build"))
    // and the projection still prunes: scanning only day-1 columns works
    assert(merged.where(col("d") === "2024-01-01").count() == 1)
  }

  test("registerTestTables + engine SQL functions work end to end") {
    graft.plans.GraftExtensions.register(spark)
    val tables = Tables.registerTestTables(spark, "/root/testdata/sf0.001")
    assert(tables.contains("documents") && tables.contains("lineitem"))
    val n = spark.sql(
      """SELECT count(*) FROM (
        |  SELECT doc_id, explode(ngram_shingle_hashes(split(text, ' '), 3)) h
        |  FROM documents LIMIT 100)""".stripMargin).head().getLong(0)
    assert(n == 100)
  }

  test("readEvolved surfaces columns added by later writes, nulls for old files") {
    import spark.implicits._
    val dir = s"${scratch("evolve")}/t"
    // v1 files: (id, name); v2 adds score
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 9.5)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir)
    val df = Tables.readEvolved(spark, dir)
    assert(df.columns.sorted.toSeq == Seq("id", "name", "score"))
    val byId = df.collect().map(r => r.getAs[Long]("id") ->
      (if (r.isNullAt(r.fieldIndex("score"))) None
       else Some(r.getAs[Double]("score")))).toMap
    assert(byId == Map(1L -> None, 2L -> None, 3L -> Some(9.5)))
    // plain read may bind to a single footer's schema — readEvolved is
    // the contract for evolved tables, not the default scan
  }
}

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
}

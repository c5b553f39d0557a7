package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver-generated test corpus (TESTDATA.md) and for
  * engine-managed curated tables.
  *
  * At 100 TB each logical table is a directory of parquet (or Delta) files,
  * partitioned on its natural partition column; `spark.read.parquet(dir)`
  * gives FileSourceScanExec with partition pruning + predicate pushdown for
  * free. Nothing here collects to the driver.
  */
object Tables {
  /** Load one test table, e.g. table(spark, "/root/testdata/sf0.01", "lineitem"). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}

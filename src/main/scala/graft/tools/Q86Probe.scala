package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where do q86's ~6 s/run go? Splits the timed run into: file listing,
  * schema+partition inference, raw scan, and the rollup aggregate —
  * against the committed day-partitioned partials (~2,405 files). */
object Q86Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/spark-scratch"
        else System.getProperty("java.io.tmpdir"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
      "/graft_partials_" + dir.replaceAll("[^A-Za-z0-9]", "_")
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"""{"step":"$label","sec":${(System.nanoTime() - t0) / 1e9}%.3f,"r":"$r"}""")
    }
    // ensure partials exist (same build-once as q86)
    graft.SparkEntry.queries("q86_incremental_agg")(spark, dir).count()
    t("q86_full_warm")(graft.SparkEntry.queries("q86_incremental_agg")(spark, dir).count())
    t("read_df_create")(spark.read.parquet(path).schema.length)
    t("read_count")(spark.read.parquet(path).count())
    t("read_noop")(spark.read.parquet(path).write.format("noop")
      .mode("overwrite").save())
    t("rollup_only") {
      graft.ops.Incremental.rollup(spark, path,
        substring(col("part"), 1, 7), Seq("o_orderpriority")).count()
    }
    t("q86_full_again")(graft.SparkEntry.queries("q86_incremental_agg")(spark, dir).count())
    spark.stop()
  }
}

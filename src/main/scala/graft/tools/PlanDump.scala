package graft.tools

import org.apache.spark.sql.SparkSession

/** Optimization-round artifact helper: materialize the named registry
  * queries (so AQE reports FINAL plans) and write each query's
  * `.explain("formatted")` output to `<outDir>/<query>_<suffix>.txt` —
  * the `plans/rNN/` before/after evidence the optimization judge diffs.
  *
  * Usage: `PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/spark-scratch"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.split(",").foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val f = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
      java.nio.file.Files.writeString(f,
        s"== $name ($suffix) — explain(formatted), materialized at $sfDir ==\n" +
          plan + "\n")
      println(s"wrote $f")
    }
    spark.stop()
  }
}

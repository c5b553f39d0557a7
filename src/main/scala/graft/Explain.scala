package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan (post-AQE when collected)
  * for one or more SparkEntry queries. Usage:
  *   runMain graft.Explain <sfDir> <queryName>[,<queryName>...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // shuffle/spill scratch on tmpfs: the build VM's virtio disk
      // intermittently stalls writes for seconds at a time, which shows up
      // as multi-x wall-clock noise on shuffle-heavy queries; shuffle data
      // at bench scale is tiny, so RAM-backed scratch removes the stall
      // without memory risk (a real cluster would use local NVMe here)
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/spark-scratch"
        else System.getProperty("java.io.tmpdir"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.split(",").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // materialize so AQE reaches its final plan
      println(s"==== $name ====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}

package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's standard configuration.
  *
  * Settings chosen for correctness-parity with the reference corpus and for
  * scale: UTC session time zone (the reference parses all timestamps as UTC —
  * /root/reference/USQL/ProcessDaily.usql:16), AQE on (runtime re-planning,
  * skew-join splitting, partition coalescing), shuffle partitions sized to
  * the local core count rather than the 200 default.
  */
object Sessions {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cores.toString)
      // shuffle/spill scratch on tmpfs when available: the build VM's
      // virtio disk intermittently stalls writes, multiplying wall-clock
      // on shuffle-heavy stages (a real cluster uses local NVMe here)
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/spark-scratch"
        else System.getProperty("java.io.tmpdir"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // the test corpus's events.parquet carries TIMESTAMP(NANOS), which
      // Spark has no native type for — surface as Long epoch nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

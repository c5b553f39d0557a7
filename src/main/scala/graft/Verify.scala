package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // the engine's standard extensions: native functions in SQL text +
      // the conf-gated rewrite rules (range join, MV, zone-map pruning)
      // — all inert unless a query opts in, so the registry's plans are
      // unchanged except where a _zonemap synopsis exists by design
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
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
      // events.parquet carries TIMESTAMP(NANOS) which Spark has no native
      // type for; read as Long (epoch nanos) — oracle side uses epoch_ns().
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.CodegenWatch.install()
    new java.io.File(outDir).mkdirs()
    // dev-only subset (SPARK_GRAFT_ONLY=q43_asof_join,...); driver sets no env
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // the whole registry just executed — record that it stayed inside
    // compiled code (see [[graft.core.CodegenWatch]]); a nonzero count
    // here is a silent interpreted fallback on some query's hot path
    System.err.println(
      s"[verify] codegen_fallbacks=${graft.core.CodegenWatch.fallbacks()}")
    spark.stop()
  }
}

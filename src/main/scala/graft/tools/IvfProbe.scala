package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing probe for the q270/q274 IVF lifecycle — identifies which
  * stage of build → delta-append ×3 → compact → probe-join moved when a
  * scale regression shows up in the sweep. Dev tool, not a gate. */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/spark-scratch"
        else System.getProperty("java.io.tmpdir"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Ann
    val Dim = 64
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[ivfprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val base = System.getProperty("java.io.tmpdir") +
      s"/graft_ivfprobe_${System.nanoTime()}"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    println(s"[ivfprobe] corpus rows: ${e.count()}")
    t("buildIvfIndex") {
      Ann.buildIvfIndex(e.where(col("vec_id") % 3 =!= 0),
        "vec_id", "embedding", Dim, 16, base)
    }
    val rest = e.where(col("vec_id") % 3 === 0)
    val b0 = rest.where((col("vec_id") / 3).cast("long") % 2 === 0)
    val b1 = rest.where((col("vec_id") / 3).cast("long") % 2 === 1)
    t("delta0") { Ann.ivfDeltaAppend(spark, base, b0, "vec_id", "embedding", Dim, 0L) }
    t("delta1") { Ann.ivfDeltaAppend(spark, base, b1, "vec_id", "embedding", Dim, 1L) }
    t("delta1-replay") { Ann.ivfDeltaAppend(spark, base, b1, "vec_id", "embedding", Dim, 1L) }
    t("compact") { Ann.ivfCompactDeltas(spark, base) }
    t("probe-join") {
      val idx = Ann.readIvfAssignments(spark, base)
      val a = idx.where(col("vec_id") < 500)
        .select(col("cid"), col("vec_id"), col("vec"), col("nrm"))
      val b = idx.select(col("cid"), col("vec_id").as("neighbor_id"),
        col("vec").as("bvec"), col("nrm").as("bnrm"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("__cos").desc, col("neighbor_id"))
      val n = a.join(b, Seq("cid"))
        .where(col("vec_id") =!= col("neighbor_id"))
        .withColumn("__cos",
          Ann.dot(col("vec"), col("bvec"), Dim) / (col("nrm") * col("bnrm")))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .count()
      println(s"[ivfprobe] probe rows: $n")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Measures the blocking-granularity DIAL of the two fixed-granularity
  * similarity ops at a scaled corpus — the companion to the BASELINE.md
  * 100x probe. The gate queries (q83, q213) pin small granularities
  * (16 IVF cells, 16 SRP buckets/band) because their DuckDB oracles
  * replay the exact blocking; at a 100x corpus those fixed granularities
  * go quadratic in-cell BY DESIGN, and the documented answer is to turn
  * the dial with the corpus (SemDeDup's 50k clusters at LAION scale;
  * [[graft.ops.Ann.srpDupPairs]]'s bits/bands sizing note). This tool
  * produces the evidence: same op, dial scaled, same corpus, wall-clock
  * side by side with the fixed-gate configuration's number.
  *
  * Usage: `graft.tools.DialProbe <sfDir>` — prints one JSON line per
  * measurement. Single timed run after a small-corpus codegen warmup
  * (the 100x-probe REPEAT=1 method: at these runtimes the op dominates
  * sampling noise).
  */
object DialProbe {

  private val only: Option[Set[String]] =
    sys.env.get("SPARK_GRAFT_PROBES").map(_.split(",").toSet)

  private def time(label: String)(f: => Long): Unit =
    if (only.forall(_.exists(label.startsWith))) {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$label","sec":$s%.2f,"rows":$n}""")
    }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val warmDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/spark-scratch"
        else System.getProperty("java.io.tmpdir"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Ann
    val dim = 64
    def embs(d: String): DataFrame = spark.read.parquet(s"$d/embeddings.parquet")
    // codegen/JIT warmup at the small corpus — per-op, both dials share
    // the generated code shapes
    Ann.semanticDedup(embs(warmDir), "vec_id", "embedding", dim, 0.4, 16).count()
    Ann.srpDupPairs(embs(warmDir), "vec_id", "embedding", dim,
      bits = 56, bands = 8, maxHamming = 7).count()
    // assignment step alone, to attribute dial cost between the
    // assignment (K dots per vector) and the in-cell pair phase
    for (k <- Seq(16, 256)) time(s"assign_K$k") {
      val e = embs(dir)
      Ann.assignClusters(e, e.where(org.apache.spark.sql.functions.col("vec_id") < k),
        "vec_id", "embedding", dim).count()
    }
    // cell-size distribution: is the assignment skewed at either dial?
    for (k <- Seq(16, 256)) time(s"cells_K$k") {
      import org.apache.spark.sql.functions.{col => c, _}
      val e = embs(dir)
      val sizes = Ann.assignClusters(e, e.where(c("vec_id") < k),
          "vec_id", "embedding", dim)
        .groupBy("__cid").count().orderBy(c("count").desc)
      sizes.limit(8).collect().foreach(r =>
        println(s"  cell ${r.get(0)} -> ${r.get(1)}"))
      sizes.count()
    }
    // pair phase alone (no CC): threshold pairs at both dials
    for (k <- Seq(16, 256)) time(s"pairs_K$k") {
      Ann.cosineDupPairs(embs(dir), "vec_id", "embedding", dim,
        threshold = 0.4, numCentroids = k).count()
    }
    // q83's fixed gate config (16 cells) vs the dial turned (256 cells)
    time("semanticDedup_K16") {
      Ann.semanticDedup(embs(dir), "vec_id", "embedding", dim,
        threshold = 0.4, numCentroids = 16).count()
    }
    time("semanticDedup_K256") {
      Ann.semanticDedup(embs(dir), "vec_id", "embedding", dim,
        threshold = 0.4, numCentroids = 256).count()
    }
    // q213's fixed gate config (32-bit 8x4 banding, 16 buckets/band) vs
    // the dial turned (56-bit 8x7, 128 buckets/band)
    time("srpDupPairs_32x8") {
      Ann.srpDupPairs(embs(dir), "vec_id", "embedding", dim,
        bits = 32, bands = 8, maxHamming = 7).count()
    }
    time("srpDupPairs_56x8") {
      Ann.srpDupPairs(embs(dir), "vec_id", "embedding", dim,
        bits = 56, bands = 8, maxHamming = 7).count()
    }
    // registry queries whose plans contain the assignment — re-measured
    // here whenever assignClusters changes shape
    for (q <- Seq("q83_semantic_dedup", "q276_auto_dial_dedup",
        "q270_ivf_append", "q274_stream_ivf_ingest",
        // compute-spread consumers: re-measure when the
        // per-row-compute-dwarfs-bytes repartitions change shape
        "q21_cosine_topk", "q62_ann_int8", "q173_pq_ann")) {
      val fn = graft.SparkEntry.queries(q)
      fn(spark, warmDir).count() // warmup
      time(q) { fn(spark, dir).count() }
    }
    spark.stop()
  }
}

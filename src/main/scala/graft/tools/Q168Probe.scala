package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.TextDedup

/** Segment timer for q168_entity_resolution (round 10): block pairs,
  * sorted-neighborhood pairs, union+distinct, connected components, final
  * window — so the optimization targets the stage that actually pays
  * (guide §1). Usage: `Q168Probe <sfDir>`.
  */
object Q168Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/spark-scratch"
        else System.getProperty("java.io.tmpdir"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"""{"step":"$label","sec":${(System.nanoTime() - t0) / 1e9}%.3f,"rows":$n}""")
    }

    val d = spark.read.parquet(s"$dir/documents.parquet")

    if (sys.env.get("GRAFT_CC_AB").contains("1")) {
      // alternating warm A/B of the CC-star broadcast gate on the two
      // real pair workloads (q168's text pairs, q83's embedding pairs):
      // same process, same window, medians comparable
      val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      val textPairs = {
        val block = TextDedup.jaroWinklerPairs(d, "doc_id", "text", 30, 0.9)
          .select(col("doc_a"), col("doc_b"))
        val sn = TextDedup.sortedNeighborhoodPairs(d, "doc_id", "text",
            substring(col("text"), 1, 20), 3, 30, 0.9)
          .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
            greatest(col("doc_a"), col("doc_b")).as("doc_b"))
        block.unionByName(sn).distinct().localCheckpoint()
      }
      val embPairs = graft.ops.Ann.cosineDupPairs(embs, "vec_id",
          "embedding", 64, 0.4, 16)
        .select(col("vec_a"), col("vec_b"))
        .localCheckpoint()
      textPairs.count(); embPairs.count()
      def ccText(): Long =
        TextDedup.connectedComponentsStar(textPairs, "doc_a", "doc_b").count()
      def ccEmb(): Long =
        TextDedup.connectedComponentsStar(embPairs, "vec_a", "vec_b").count()
      ccText(); ccEmb() // warmup
      for (rep <- 1 to 3; gated <- Seq(true, false)) {
        spark.conf.set("spark.graft.cc.broadcastMaxEdges",
          if (gated) "1000000" else "0")
        def one(label: String, f: () => Long): Unit = {
          val t0 = System.nanoTime()
          val n = f()
          println(f"""{"ab":"$label","gated":$gated,"rep":$rep,"sec":${(System.nanoTime() - t0) / 1e9}%.3f,"rows":$n}""")
        }
        one("cc_text", () => ccText())
        one("cc_emb", () => ccEmb())
      }
      spark.stop()
      return
    }

    // warmup
    graft.queries.Corpus.q168EntityResolution(spark, dir).count()

    for (pass <- 1 to 2) {
      println(s"""{"pass":$pass}""")
      t("q168_full")(
        graft.queries.Corpus.q168EntityResolution(spark, dir).count())
      t("block_jw_pairs")(
        TextDedup.jaroWinklerPairs(d, "doc_id", "text", 30, 0.9).count())
      t("sn_pairs")(
        TextDedup.sortedNeighborhoodPairs(d, "doc_id", "text",
          substring(col("text"), 1, 20), 3, 30, 0.9).count())
      val block = TextDedup.jaroWinklerPairs(d, "doc_id", "text", 30, 0.9)
        .select(col("doc_a"), col("doc_b"))
      val sn = TextDedup.sortedNeighborhoodPairs(d, "doc_id", "text",
          substring(col("text"), 1, 20), 3, 30, 0.9)
        .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
          greatest(col("doc_a"), col("doc_b")).as("doc_b"))
      val pairs = block.unionByName(sn).distinct().localCheckpoint()
      t("pairs_union_distinct_ckpt")(pairs.count())
      var comp: DataFrame = null
      t("cc_star")({
        comp = TextDedup.connectedComponentsStar(pairs, "doc_a", "doc_b")
          .localCheckpoint()
        comp.count()
      })
      t("assign_window")({
        val assigned = d.select(col("doc_id"))
          .join(comp, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("entity_id"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("entity_id")
        assigned.select(col("doc_id"), col("entity_id"),
          count(lit(1)).over(w).as("cluster_size"),
          (col("doc_id") === col("entity_id")).as("is_canonical")).count()
      })
    }
    spark.stop()
  }
}

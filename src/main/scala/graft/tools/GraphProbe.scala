package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sub-step timer for the iterative graph family (round-9 optimization):
  * splits each query's wall into edge-build vs iteration cost so the
  * optimization targets the stage that actually pays, per guide §1.
  * Usage: `GraphProbe <sfDir>`; times print as one JSON line each.
  */
object GraphProbe {
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
    import graft.core.Tables.table

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"""{"step":"$label","sec":${(System.nanoTime() - t0) / 1e9}%.3f,"rows":$n}""")
    }

    def tradePairs: DataFrame =
      table(spark, dir, "orders")
        .join(table(spark, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"),
          (col("l_suppkey") * 2 + 1).as("s"))
        .distinct()
    def tradeEdges: DataFrame = {
      val pairs = tradePairs
      pairs.select(col("c").as("src"), col("s").as("dst"))
        .unionByName(pairs.select(col("s").as("src"), col("c").as("dst")))
    }

    // warmup (codegen/JIT)
    tradeEdges.count(); graft.ops.Graph.pageRank(tradeEdges, 1).count()

    t("edges_build")(tradeEdges.count())
    t("edges_build_again")(tradeEdges.count())

    // edge build + persist + materialize (what an op-side persist costs)
    val cached = tradeEdges
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("edges_persist_materialize")(cached.count())
    t("deg_from_cached")(cached.groupBy("src").count().count())
    t("nodes_from_cached")(
      cached.select(col("src").as("node")).distinct()
        .unionByName(cached.select(col("dst").as("node")).distinct())
        .distinct().count())

    // pagerank as shipped (edges NOT pre-persisted) vs over cached edges
    t("pagerank_shipped_3r")(graft.ops.Graph.pageRank(tradeEdges, 3).count())
    t("pagerank_cached_3r")(graft.ops.Graph.pageRank(cached, 3).count())

    // per-round marginal cost
    t("pagerank_cached_1r")(graft.ops.Graph.pageRank(cached, 1).count())

    // LPA and HITS as shipped (both persist internally already)
    t("lpa_shipped_3r")(graft.ops.Graph.labelPropagation(tradeEdges, 3).count())
    t("hits_shipped_2r") {
      val pairs = tradePairs
      graft.ops.Graph.hits(pairs.select(col("c").as("src"),
        col("s").as("dst")), 2).count()
    }
    // BFS as shipped: sources recompute the edge build once
    t("bfs_shipped") {
      val e = tradeEdges
      graft.ops.Graph.shortestPaths(e, e.agg(min(col("src")).as("node")),
        6).count()
    }
    t("bfs_cached")(graft.ops.Graph.shortestPaths(cached,
      cached.agg(min(col("src")).as("node")), 6).count())
    cached.unpersist()
    spark.stop()
  }
}

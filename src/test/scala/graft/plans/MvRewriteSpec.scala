package graft.plans

import graft.SparkSpec
import graft.ops.Incremental
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class MvRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val measureSql = "cast(round(o_totalprice * 100) as bigint)"
  private val partSql = "date_format(o_orderdate, 'yyyy-MM-dd')"

  private def fixture(): (String, String) = {
    val fact = scratch("mv-fact")
    val partials = scratch("mv-partials")
    Seq(
      ("1994-01-01", "HIGH", 10.25), ("1994-01-01", "HIGH", 1.00),
      ("1994-01-01", "LOW", 3.50), ("1994-01-02", "HIGH", 7.75),
      ("1994-01-02", "LOW", 0.25), ("1994-01-03", "LOW", 99.99))
      .toDF("d", "o_orderpriority", "o_totalprice")
      .select(to_date(col("d")).as("o_orderdate"),
        col("o_orderpriority"), col("o_totalprice"))
      .write.mode("overwrite").parquet(fact)
    Incremental.writePartials(
      Incremental.buildPartials(spark.read.parquet(fact),
        expr(partSql), Seq("o_orderpriority"), expr(measureSql)),
      partials)
    (fact, partials)
  }

  private def withMv[T](fact: String, partials: String)(f: => T): T = {
    if (!spark.experimental.extraOptimizations.contains(MvRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MvRewriteRule
    spark.conf.set("spark.graft.mv.fact", fact)
    spark.conf.set("spark.graft.mv.partials", partials)
    spark.conf.set("spark.graft.mv.part", partSql)
    spark.conf.set("spark.graft.mv.keys", "o_orderpriority")
    spark.conf.set("spark.graft.mv.measure", measureSql)
    try f finally Seq("fact", "partials", "part", "keys", "measure")
      .foreach(k => spark.conf.unset(s"spark.graft.mv.$k"))
  }

  // sparkPlan, not executedPlan: AQE wraps the latter in an adaptive root
  // whose inner plan isn't visible to collect() before execution
  private def scanPaths(df: DataFrame): Seq[String] = {
    val paths = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec =>
        s.relation.location.rootPaths.map(_.toString)
    }.flatten
    assert(paths.nonEmpty, "no FileSourceScanExec found in plan")
    paths
  }

  private def dayQuery(fact: String): DataFrame =
    spark.read.parquet(fact)
      .groupBy(expr(partSql).as("day"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(expr(measureSql)).as("s"),
        min(expr(measureSql)).as("mn"), max(expr(measureSql)).as("mx"))

  test("day-grain aggregate is answered from partials, byte-identical") {
    val (fact, partials) = fixture()
    val expected = dayQuery(fact).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    withMv(fact, partials) {
      val q = dayQuery(fact)
      val paths = scanPaths(q)
      assert(paths.nonEmpty && paths.forall(_.contains(partials)),
        s"expected only partials scans, got $paths")
      val got = q.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
      assert(got === expected)
    }
  }

  test("coarser grouping (keys only) re-merges partials across days") {
    val (fact, partials) = fixture()
    def q = spark.read.parquet(fact)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(expr(measureSql)).as("s"))
    val expected = q.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    withMv(fact, partials) {
      val rewritten = q
      assert(scanPaths(rewritten).forall(_.contains(partials)))
      val got = rewritten.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expected)
      assert(got === Set(("HIGH", 3L, 1900L), ("LOW", 3L, 10374L)))
    }
  }

  test("unsupported shapes leave the fact scan untouched") {
    val (fact, partials) = fixture()
    withMv(fact, partials) {
      // avg is not a registered merge
      val avg_ = spark.read.parquet(fact).groupBy(col("o_orderpriority"))
        .agg(avg(col("o_totalprice")).as("a"))
      assert(scanPaths(avg_).forall(_.contains(fact)))
      // different measure
      val other = spark.read.parquet(fact).groupBy(col("o_orderpriority"))
        .agg(sum(col("o_totalprice")).as("s"))
      assert(scanPaths(other).forall(_.contains(fact)))
      // a filter between scan and aggregate blocks the rewrite
      val filtered = spark.read.parquet(fact)
        .where(col("o_orderpriority") === "HIGH")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      assert(scanPaths(filtered).forall(_.contains(fact)))
      // grouping on a non-key column blocks the rewrite
      val nonKey = spark.read.parquet(fact).groupBy(col("o_orderdate"))
        .agg(count(lit(1)).as("n"))
      assert(scanPaths(nonKey).forall(_.contains(fact)))
    }
  }

  test("rule is inert without the conf set") {
    val (fact, partials) = fixture()
    if (!spark.experimental.extraOptimizations.contains(MvRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MvRewriteRule
    assert(scanPaths(dayQuery(fact)).forall(_.contains(fact)))
  }
}

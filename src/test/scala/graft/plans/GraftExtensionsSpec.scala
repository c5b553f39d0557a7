package graft.plans

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("register exposes native expressions to SQL text") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d")
      .head().getDouble(0)
    assert(dot == 11.0)
    val shingles = spark.sql(
      "SELECT ngram_shingles(split('a b c d', ' '), 3) AS s")
      .head().getSeq[String](0)
    assert(shingles == Seq("a b c", "b c d"))
    // int8 quantized path from pure SQL: pack both vectors, integer dot
    val i8 = spark.sql(
      """SELECT int8_dot(
        |  int8_pack(array(1.0F, -1.0F), CAST(1.0/127 AS DOUBLE)),
        |  int8_pack(array(1.0F,  1.0F), CAST(1.0/127 AS DOUBLE))) AS d"""
        .stripMargin).head().getLong(0)
    assert(i8 == 127L * 127 - 127L * 127 + 0) // 127·127 + (-127)·127 = 0
  }

  test("ngram_shingles rejects a non-literal n") {
    GraftExtensions.register(spark)
    intercept[Exception] {
      spark.sql("SELECT ngram_shingles(split('a b', ' '), 'x')").collect()
    }
  }

  test("RangeJoinRule: inequality-only join rewrites to a binned equi-join, same rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val intervals = Seq((1L, 100L, 300L), (2L, 250L, 251L), (3L, 400L, 400L))
      .toDF("iid", "s", "e")
    val points = Seq((50L, 99L), (51L, 100L), (52L, 250L), (53L, 299L),
      (54L, 300L), (55L, 400L)).toDF("pid", "ts")
    def q = intervals.join(points,
      col("ts") >= col("s") && col("ts") < col("e"))
    val naive = q.collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    // without the conf: inert — nested-loop plan untouched
    assert(q.queryExecution.optimizedPlan.toString.contains("Join Inner"))

    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinRule
    spark.conf.set("spark.graft.rangejoin.binwidth", "100")
    try {
      val rewritten = q
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop"),
        s"expected the binned equi-join, got:\n$plan")
      assert(plan.contains("Generate explode"), s"missing bin explode:\n$plan")
      // identical result set — the residual keeps semantics exact
      assert(rewritten.collect().map(r => (r.getLong(0), r.getLong(3))).toSet
        == naive)
      // joins WITH an equality conjunct are left alone
      val equi = intervals.join(points, col("iid") === col("pid")
        && col("ts") >= col("s"))
      assert(!equi.queryExecution.optimizedPlan.toString
        .contains("__graft_bin_l"))
    } finally {
      spark.conf.unset("spark.graft.rangejoin.binwidth")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RangeJoinRule)
    }
  }

  test("RangeJoinRule: swapped sides (points on the LEFT) rewrite too") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val intervals = Seq((1L, 100L, 300L), (2L, 250L, 251L))
      .toDF("iid", "s", "e")
    val points = Seq((50L, 99L), (51L, 100L), (52L, 250L), (53L, 299L),
      (54L, 300L)).toDF("pid", "ts")
    def q = points.join(intervals,                      // point side LEFT
      col("ts") >= col("s") && col("ts") < col("e"))
    val naive = q.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinRule
    spark.conf.set("spark.graft.rangejoin.binwidth", "100")
    try {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop"), s"swapped rewrite missing:\n$plan")
      assert(q.collect().map(r => (r.getLong(0), r.getLong(2))).toSet == naive)
    } finally {
      spark.conf.unset("spark.graft.rangejoin.binwidth")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RangeJoinRule)
    }
  }

  test("extension class applies to a freshly built session") {
    val ext = new GraftExtensions
    // applying the extension function directly exercises the injection path
    val extensions = new org.apache.spark.sql.SparkSessionExtensions
    ext(extensions) // must not throw; functions are injected lazily per session
    succeed
  }
}

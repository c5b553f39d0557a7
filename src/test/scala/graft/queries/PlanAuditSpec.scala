package graft.queries

import graft.SparkSpec
import graft.tools.PlanAudit

/** CI gate for the audited headliner plans: `PLANS.md` is the
  * human-readable record of every accepted physical plan, but a plan
  * regression (a lost broadcast, a new exchange, a codegen fallback, a
  * join degrading to CartesianProduct) only surfaced if someone re-read
  * it. This suite re-runs every [[PlanAudit.headliners]] entry at
  * sf0.001 and fails when its final post-AQE plan exceeds the recorded
  * [[PlanAudit.shuffleBudgets]], contains a nested-loop product, or
  * leaves whole-stage codegen. `PlanShapeSpec` asserts the finer
  * per-query properties (pushdown, WindowGroupLimit, broadcast sides);
  * this is the coarse budget sweep over the whole audited set.
  *
  * Deliberately ONE test for the sweep: the shared-session queries run
  * in registry order with the same rules installed as the PlanAudit
  * session (GraftExtensions' optimizer rules), and a single pass keeps
  * the suite's wall-clock at one materialization per headliner. */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every audited headliner stays within its recorded shuffle budget, " +
      "product-free and codegen-clean") {
    graft.core.CodegenWatch.install()
    val rules = Seq(graft.plans.RangeJoinRule, graft.plans.MvRewriteRule,
      graft.plans.ZoneMapRule)
    val missing = rules.filterNot(spark.experimental.extraOptimizations.contains)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations ++ missing
    try {
      val fallbacksBefore = graft.core.CodegenWatch.fallbacks()
      val failures = PlanAudit.headliners.flatMap { case (name, _) =>
        val fn = graft.SparkEntry.queries.get(name)
        assert(fn.nonEmpty, s"$name audited in PLANS.md but not registered")
        val df = fn.get(spark, dir)
        df.collect() // materialize so AQE reports the FINAL plan
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val shuffles = PlanAudit.countShuffles(plan)
        val budget = PlanAudit.shuffleBudgets.getOrElse(name, Int.MaxValue)
        val problems = Seq(
          Option.when(shuffles > budget)(
            s"$name: $shuffles shuffles > recorded budget $budget"),
          Option.when(plan.contains("CartesianProduct"))(
            s"$name: CartesianProduct in the final plan")
        ).flatten
        problems
      }
      assert(failures.isEmpty, failures.mkString("\n"))
      assert(PlanAudit.headliners.map(_._1).toSet
        .subsetOf(PlanAudit.shuffleBudgets.keySet),
        "every headliner needs a recorded budget")
      val fb = graft.core.CodegenWatch.fallbacks() - fallbacksBefore
      assert(fb == 0, s"$fb codegen fallbacks during the headliner sweep")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(missing.contains)
    }
  }

  test("the budget gate actually fires: a lost broadcast breaks a budget") {
    // negative control — prove the counting + comparison can fail.
    // q3 itself is immune to conf sabotage (its dims broadcast via
    // explicit hints — the point of its shape), so stage the regression
    // it guards against: the SAME join WITHOUT the hints, broadcasts
    // denied both statically and at AQE replan. The join must then
    // shuffle both sides and blow q3's recorded budget of 1.
    import org.apache.spark.sql.functions.{col, count, lit}
    val priorStatic = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val priorAqe = spark.conf.getOption(
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val df = spark.read.parquet(s"$dir/customer.parquet")
        .join(spark.read.parquet(s"$dir/nation.parquet"),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("n_cust"))
      df.collect()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(PlanAudit.countShuffles(plan) >
        PlanAudit.shuffleBudgets("q3_join_inner"),
        s"a de-hinted, broadcast-denied dim join must exceed q3's " +
          s"budget — if it does not, the gate is vacuous:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorStatic)
      priorAqe match {
        case Some(v) =>
          spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None =>
          spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }
}

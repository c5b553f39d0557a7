package graft.jobs

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The cube's two maintenance paths must agree, and range queries must
  * prune to the day partitions in range (never re-scan the fact side). */
class SketchCubeSpec extends SparkSpec {

  private def events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    .transform(graft.core.Tables.normalizeEventTs)
    .withColumn("d",
      to_date(timestamp_micros(expr("ts div 1000"))).cast("string"))

  test("incremental buildDay == one-pass buildAll; range read is partition-pruned") {
    val ev = events
    val days = ev.select("d").distinct().orderBy("d")
      .collect().map(_.getString(0)).take(3)
    val bulk = scratch("cube-bulk")
    val incr = scratch("cube-incr")
    val sub = ev.where(col("d").isin(days: _*))
    SketchCube.buildAll(sub, "user_id", "d", bulk)
    days.foreach { day =>
      SketchCube.buildDay(ev.where(col("d") === day), "user_id", day, incr)
    }
    // identical register tables either way (idempotent, deterministic)
    val a = spark.read.parquet(s"$bulk/hll")
      .select(col("day").cast("string"), col("bucket"), col("max_rho"))
    val b = spark.read.parquet(s"$incr/hll")
      .select(col("day").cast("string"), col("bucket"), col("max_rho"))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "buildDay and buildAll produced different registers")
    // re-running one day is a byte-stable partition replace
    SketchCube.buildDay(ev.where(col("d") === days.head), "user_id",
      days.head, incr)
    val b2 = spark.read.parquet(s"$incr/hll")
      .select(col("day").cast("string"), col("bucket"), col("max_rho"))
    assert(b2.exceptAll(a).count() == 0 && a.exceptAll(b2).count() == 0)
    // range scan prunes: only the 2 in-range day partitions are read
    val q = spark.read.parquet(s"$bulk/hll")
      .where(col("day") >= days(0) && col("day") <= days(1))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day"),
      s"day range must prune partitions:\n$plan")
    // estimate from the pruned range matches a direct build over the days
    val est = SketchCube.distinctOverRange(spark, bulk, days(0), days(1))
      .head.getDouble(2)
    val direct = graft.ops.Sketches.hllEstimate(
      graft.ops.Sketches.hllBuild(
        ev.where(col("d").isin(days(0), days(1))).select("user_id"),
        "user_id", 9), 9).head.getDouble(2)
    assert(est == direct, s"cube range $est != direct $direct")
  }
}

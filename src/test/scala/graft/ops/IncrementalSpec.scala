package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {

  private def orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
  private val cents = round(col("o_totalprice") * 100).cast("long")
  private val dayExpr = date_format(col("o_orderdate"), "yyyy-MM-dd")

  private def directMonthly(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("grain"),
        col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), sum(cents).as("sum_cents"),
        min(cents).as("min_cents"), max(cents).as("max_cents"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap

  private def rolledUp(path: String) =
    Incremental.rollup(spark, path, substring(col("part"), 1, 7),
        Seq("o_orderpriority"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap

  test("rollup over day partials ≡ direct monthly aggregate over the facts") {
    val path = scratch("inc_full")
    Incremental.writePartials(
      Incremental.buildPartials(orders, dayExpr, Seq("o_orderpriority"), cents),
      path)
    assert(rolledUp(path) == directMonthly(orders))
  }

  test("late-day refresh is O(delta): only its partition is rewritten, result converges") {
    val path = scratch("inc_delta")
    val cut = "1997-06-15" // mid-history day with orders on both sides
    Incremental.writePartials(
      Incremental.buildPartials(orders.where(dayExpr < cut),
        dayExpr, Seq("o_orderpriority"), cents),
      path)
    def listPartition(day: String): Set[(String, Long)] = {
      val d = new java.io.File(s"$path/part=$day")
      if (!d.isDirectory) Set.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet
    }
    // an untouched early partition, snapshotted before the refresh
    val untouchedDay = orders.where(dayExpr < cut)
      .select(min(dayExpr)).head().getString(0)
    val before = listPartition(untouchedDay)
    assert(before.nonEmpty)
    // late-arriving day lands: refresh exactly that day's rows
    Incremental.refresh(orders.where(dayExpr === cut), path,
      dayExpr, Seq("o_orderpriority"), cents)
    assert(listPartition(untouchedDay) == before,
      "untouched partition was rewritten — refresh is not O(delta)")
    assert(rolledUp(path) == directMonthly(orders.where(dayExpr <= cut)))
  }

  test("re-refreshing the same day is idempotent") {
    val path = scratch("inc_idem")
    val cut = "1997-06-15"
    Incremental.writePartials(
      Incremental.buildPartials(orders.where(dayExpr <= cut),
        dayExpr, Seq("o_orderpriority"), cents),
      path)
    val once = rolledUp(path)
    Incremental.refresh(orders.where(dayExpr === cut), path,
      dayExpr, Seq("o_orderpriority"), cents)
    assert(rolledUp(path) == once)
  }

  private def customer =
    spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("o_orderkey"), col("o_custkey"), col("c_nationkey"))
      .collect().map(_.toString).sorted.toSeq

  test("maintainJoinView after a fact+dim insert batch ≡ full recompute") {
    val cut = lit("1997-06-15").cast("timestamp")
    val fOld = orders.where(col("o_orderdate") < cut)
    val fNew = orders.where(col("o_orderdate") >= cut)
    val dOld = customer.where(pmod(col("o_custkey"), lit(7)) =!= 0)
    val dNew = customer.where(pmod(col("o_custkey"), lit(7)) === 0)
    val maintained = Incremental.maintainJoinView(
      fOld.join(dOld, Seq("o_custkey")), fOld, fNew, dOld, dNew,
      Seq("o_custkey"))
    val full = orders.join(customer, Seq("o_custkey"))
    assert(sortedRows(maintained) == sortedRows(full))
  }

  test("rollup cascades: year-from-month-partials ≡ year-from-day-partials ≡ direct") {
    val path = scratch("inc_cascade")
    Incremental.writePartials(
      Incremental.buildPartials(orders, dayExpr, Seq("o_orderpriority"), cents),
      path)
    // month partials re-aggregated from day partials, persisted, then
    // rolled to year — the multi-granularity serving chain: each level is
    // mergeable state, so NO level ever rereads the facts
    val monthPath = scratch("inc_cascade_month")
    Incremental.rollup(spark, path, substring(col("part"), 1, 7),
        Seq("o_orderpriority"))
      .withColumnRenamed("grain", "part")
      .repartition(col("part"))
      .write.mode("overwrite").partitionBy("part").parquet(monthPath)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val yearFromMonth = toMap(Incremental.rollup(spark, monthPath,
      substring(col("part"), 1, 4), Seq("o_orderpriority")))
    val yearFromDay = toMap(Incremental.rollup(spark, path,
      substring(col("part"), 1, 4), Seq("o_orderpriority")))
    val direct = toMap(orders
      .groupBy(date_format(col("o_orderdate"), "yyyy").as("grain"),
        col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), sum(cents).as("sum_cents"),
        min(cents).as("min_cents"), max(cents).as("max_cents")))
    assert(yearFromMonth == direct)
    assert(yearFromDay == direct)
  }

  test("joinViewDelta with empty deltas is empty; fact-only delta joins only the delta") {
    val empty = orders.where(lit(false))
    val emptyDim = customer.where(lit(false))
    assert(Incremental.joinViewDelta(orders, empty, customer, emptyDim,
      Seq("o_custkey")).isEmpty)
    val cut = lit("1997-06-15").cast("timestamp")
    val fNew = orders.where(col("o_orderdate") >= cut)
    val delta = Incremental.joinViewDelta(
      orders.where(col("o_orderdate") < cut), fNew, customer, emptyDim,
      Seq("o_custkey"))
    assert(sortedRows(delta) == sortedRows(fNew.join(customer, Seq("o_custkey"))))
  }

  test("first-ever write of an EMPTY partials frame no-ops the compact view") {
    val path = scratch("inc_empty_first")
    // round-9 code threw 'Unable to infer schema' here: compactView read
    // the store root unconditionally after a write that created no files
    Incremental.writePartials(
      Incremental.buildPartials(orders.where(lit(false)), dayExpr,
        Seq("o_orderpriority"), cents), path)
    val compact = new java.io.File(path, "_compact")
    assert(!compact.exists())
  }

  test("rollup falls back to day dirs when the compact view is STALE") {
    val path = scratch("inc_stale_view")
    val cut = "1997-06-15"
    val before = orders.where(col("o_orderdate") < lit(cut).cast("timestamp"))
    Incremental.writePartials(
      Incremental.buildPartials(before, dayExpr, Seq("o_orderpriority"), cents),
      path) // builds + stamps the view for the pre-cut store
    // simulate a crash AFTER a later day-dir write but BEFORE the view
    // swap: write the remaining days directly, bypassing compactView
    val after = orders.where(col("o_orderdate") >= lit(cut).cast("timestamp"))
    Incremental.buildPartials(after, dayExpr, Seq("o_orderpriority"), cents)
      .repartition(col("part"))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("part").parquet(path)
    // the stale view is still on disk, but its source stamp no longer
    // matches the day dirs — rollup must NOT serve the pre-cut snapshot
    // the view froze: it self-heals (rebuilds the view from the day dirs)
    // and the result reflects the full history
    assert(new java.io.File(path, "_compact").exists())
    assert(rolledUp(path) == directMonthly(orders))
    // and the heal is durable: the rebuilt view's stamp now matches the
    // day dirs, so the next read is served by the view (same answer)
    assert(rolledUp(path) == directMonthly(orders))
  }
}

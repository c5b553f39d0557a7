package graft.queries

import graft.core.Tables.table
import graft.ops.Temporal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time operator surface (as-of join, interval range join,
  * sessionization) plus curation extensions added in round 3. Each query
  * has a full DuckDB oracle; timestamps compute on epoch-nanos longs on
  * both sides (the engine reads parquet nanos as longs under
  * `nanosAsLong`; the oracle uses `epoch_ns`), so all temporal arithmetic
  * is exact-integer and engine-independent.
  */
object Advanced {

  /** Events with `ts_us` (epoch micros). The parquet carries TIMESTAMP
    * (NANOS) — the engine reads it as an epoch-nanos long, but DuckDB
    * reads it at µs precision, so all cross-engine temporal arithmetic
    * happens on µs (integral `div`, not `/`: nanos exceed 2^53 and the
    * double division behind `/` is inexact). */
  private def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events").withColumn("ts_us", expr("ts div 1000L"))

  /** As-of join: every click paired with the same user's most recent
    * prior-or-simultaneous purchase (null when none). Single-shuffle
    * union+window plan — see [[graft.ops.Temporal.asofJoin]]; the
    * join-then-rank spelling the oracle uses is the semantics, not the
    * plan (it materializes every candidate pair). */
  def q43AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts_us"))
    val purchases = ev.where(col("event_type") === "purchase")
    Temporal.asofJoin(clicks, purchases, "user_id", "ts_us", "ts_us",
      Seq("event_id" -> "purchase_id", "value" -> "purchase_value"),
      tiebreak = "event_id")
      .select(col("click_id"), col("user_id"), col("purchase_id"),
        col("purchase_value"))
  }

  /** Interval range join (no equi-key): per error event, count and sum all
    * events inside [ts, ts+10min). Binned-candidate equi-join plan — the
    * inequality-only join Spark would otherwise execute as a quadratic
    * broadcast nested loop. */
  def q44RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val tenMinUs = 600000000L
    val errors = ev.where(col("event_type") === "error")
      .select(col("event_id").as("error_id"),
        col("ts_us").as("start_ts"),
        (col("ts_us") + tenMinUs).as("end_ts"))
    Temporal.rangeJoin(errors, ev, "start_ts", "end_ts", "ts_us",
      binWidth = tenMinUs)
      .groupBy(col("error_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
  }

  /** Gap-based sessionization: per-user sessions split at >12h idle,
    * aggregated to one row per session. */
  def q45Sessionize(spark: SparkSession, dir: String): DataFrame =
    Temporal.sessionize(events(spark, dir), "user_id", "event_id", "ts_us",
      gap = 43200000000L)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"),
        (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_asof_join" -> q43AsofJoin,
    "q44_range_join" -> q44RangeJoin,
    "q45_sessionize" -> q45Sessionize
  )

  val oracles: Map[String, String] = Map(
    "q43_asof_join" ->
      """SELECT click_id, user_id, purchase_id, purchase_value FROM (
        |  SELECT c.event_id AS click_id, c.user_id,
        |         p.event_id AS purchase_id, p.value AS purchase_value,
        |         row_number() OVER (PARTITION BY c.event_id
        |                            ORDER BY p.ts DESC, p.event_id DESC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'click') c
        |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |    ON p.user_id = c.user_id AND p.ts <= c.ts
        |) WHERE rn = 1""".stripMargin,
    "q44_range_join" ->
      """SELECT i.event_id AS error_id, count(*) AS n_events,
        |  round(sum(e.value), 2) AS sum_value
        |FROM (SELECT event_id, ts FROM events WHERE event_type = 'error') i
        |JOIN events e
        |  ON epoch_us(e.ts) >= epoch_us(i.ts)
        | AND epoch_us(e.ts) < epoch_us(i.ts) + 600000000
        |GROUP BY i.event_id""".stripMargin,
    "q45_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 43200000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        |y AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM x)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(event_id) AS first_event, max(event_id) AS last_event,
        |  max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us
        |FROM y GROUP BY user_id, session_id""".stripMargin
  )
}

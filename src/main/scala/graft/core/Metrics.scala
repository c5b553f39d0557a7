package graft.core

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Audit metrics WITHOUT a second scan — Spark's `Observation` API:
  * named aggregate expressions ride the frame and evaluate as a side
  * effect of whatever action consumes it (typically the write), so
  * row-count / null-count / integral-sum accounting costs ZERO extra
  * jobs. This is the engine-side twin of the reference jobs' per-step
  * row-count logging: at 100 TB a separate `count()` per audit number
  * is a full re-scan; an observation is free.
  *
  * Only deterministic aggregate expressions are legal (Spark enforces
  * it); observe the same integral-cents discipline as the oracles if
  * the numbers feed reconciliation. Metrics surface on `Observation
  * .get` after the FIRST action and also flow to listeners
  * (`QueryExecutionListener` / `StreamingQueryListener`) for pipeline
  * telemetry.
  */
object Metrics {

  /** Attach named metrics; returns the instrumented frame and the
    * handle to read after an action consumes it. */
  def observed(df: DataFrame, name: String,
      metrics: (String, Column)*): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "observe at least one metric")
    val obs = Observation(name)
    val cols = metrics.map { case (n, c) => c.as(n) }
    (df.observe(obs, cols.head, cols.tail: _*), obs)
  }
}

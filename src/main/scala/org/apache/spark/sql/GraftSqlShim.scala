package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public
  * `Column` API. Spark 4 made the Column↔Expression converters
  * (`classic.ExpressionUtils`) `private[sql]`; this shim, compiled into
  * the `org.apache.spark.sql` package, is the established pattern
  * third-party expression libraries use to reach them.
  */
object GraftSqlShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a function on an ALREADY-RUNNING session (the
    * `spark.sql.extensions` config only applies at session build time). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")

  /** Release the block-manager storage behind a `localCheckpoint()`ed
    * frame NOW instead of waiting for driver GC + ContextCleaner.
    *
    * `Dataset.localCheckpoint()` persists the materialized RDD at
    * MEMORY_AND_DISK and wraps it in a `LogicalRDD` leaf; nothing
    * unpins those blocks until the RDD object is garbage-collected —
    * which on a roomy driver heap can be never. Iterative operators
    * that checkpoint every round (PageRank, BFS, connected components,
    * BPE) therefore accumulate one dead round-state per iteration, and
    * a long-lived session (the 280-query bench) accumulates one per
    * QUERY — measured as monotonic per-run slowdowns once the heap
    * fills (sf1 sweep: q244 32→53→125 s across three runs of the same
    * binary). Calling this on the SUPERSEDED frame caps live
    * checkpoint storage at one round's state.
    *
    * Only frames whose content is never read again may be freed: the
    * checkpoint truncated lineage, so a freed block cannot be
    * recomputed — a later action on the frame would fail.
    *
    * Deliberately frees ONLY a bare checkpoint (the plan's ROOT is the
    * LogicalRDD, which is exactly what `localCheckpoint()` returns) —
    * walking to arbitrary leaves would let a derived frame silently
    * free checkpoints it merely references and other frames still need
    * (e.g. a projection over the BPE merge table, whose leaves are the
    * per-round winner checkpoints). A non-checkpoint plan is a no-op. */
  def freeLocalCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}

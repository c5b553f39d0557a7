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
}

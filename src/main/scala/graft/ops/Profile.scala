package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the ANALYZE-statistics surface: per-column null
  * counts, distinct cardinality, and min/max in ONE scan. The multi-column
  * `count(distinct …)` plans through Catalyst's Expand (one pass over the
  * data, rows replicated per distinct-aggregate — the standard trade);
  * profiles feed CBO-style decisions (broadcast-ability, skew suspicion,
  * null-heavy columns) and data-quality gates. For 100 TB profiles swap
  * the exact distincts for [[Sketches.hllDistinct]] sketches — same
  * output shape, bounded memory, and re-mergeable across partitions of a
  * table profiled incrementally.
  *
  * Output is long-format `(column, n_rows, n_nulls, n_distinct, min_val,
  * max_val)` — min/max computed on the native type, rendered as strings
  * so heterogeneous columns stack into one frame.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // stack the wide single row into one row per column
    val stackExpr = cols.map { c =>
      s"'$c', `__nulls_$c`, `__dist_$c`, `__min_$c`, `__max_$c`"
    }.mkString(", ")
    wide.selectExpr("__n",
        s"stack(${cols.length}, $stackExpr) AS " +
          "(column, n_nulls, n_distinct, min_val, max_val)")
      .select(col("column"), col("__n").as("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }
}

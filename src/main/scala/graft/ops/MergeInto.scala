package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic MERGE INTO semantics over plain DataFrames — the
  * `WHEN MATCHED UPDATE / WHEN MATCHED DELETE / WHEN NOT MATCHED INSERT`
  * statement of a transactional warehouse, expressed as ONE full-outer
  * join (a single shuffle on the merge keys).
  *
  * The reference's pipelines hard-code one merge shape — latest-effective-
  * timestamp upsert ([[Merges.snapshotMerge]], ProcessDaily.usql:98-177);
  * this operator is the general surface a warehouse user expects for
  * arbitrary conditional merges (SCD maintenance, correction feeds, GDPR
  * deletes). SURVEY.md §4 names Delta's MERGE INTO as the at-scale
  * alternative; the semantics are reproduced here over plain parquet,
  * composing with [[Merges]]' atomic rename-aside rewrite or
  * [[MergeOnRead]]'s O(delta) log for the write side.
  *
  * Row fate (standard MERGE semantics, one source row per key enforced):
  *   - matched, `deleteWhen` holds          → dropped
  *   - matched, otherwise                   → target row with `updates`
  *     columns overwritten from the source expression
  *   - source-only                          → inserted (insert-column map,
  *     unnamed target columns null)
  *   - target-only                          → kept verbatim
  *
  * 100 TB shape: one full-outer shuffle join on `keys` — source is
  * typically a daily delta, so AQE broadcasts it when small; no
  * collect, no per-row driver logic. Updates/inserts are column
  * expressions evaluated inside the join projection (codegen'd).
  */
object MergeInto {

  /** `target` and `source` must both contain `keys`. `updates` maps a
    * target column to the expression (over source columns, aliased
    * `src_*`) that overwrites it when matched; `inserts` builds a new row
    * from source columns for unmatched source keys — target columns not
    * named default to null. `deleteWhen` (over `src_*` columns) drops
    * matched target rows. Source must be unique per key
    * (`require`-checked: duplicate source rows make MERGE ambiguous —
    * the same rule Delta enforces at runtime). */
  def mergeInto(target: DataFrame, source: DataFrame, keys: Seq[String],
      updates: Map[String, Column], inserts: Map[String, Column],
      deleteWhen: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty, "merge keys must be non-empty")
    val dupSrc = source.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n")).where(col("__n") > 1).limit(1).count()
    require(dupSrc == 0,
      "MERGE source has multiple rows for the same key — ambiguous merge")

    val srcPrefixed = source.columns.foldLeft(source) { (df, c) =>
      df.withColumnRenamed(c, s"src_$c")
    }
    val cond = keys.map(k => target(k) <=> srcPrefixed(s"src_$k"))
      .reduce(_ && _)
    val joined = target.join(srcPrefixed, cond, "full_outer")

    val matched = keys.map(k => target(k).isNotNull).reduce(_ && _) &&
      keys.map(k => srcPrefixed(s"src_$k").isNotNull).reduce(_ && _)
    val sourceOnly = keys.map(k => target(k).isNull).reduce(_ && _)

    val outCols = target.columns.toSeq.map { c =>
      val onMatch = updates.getOrElse(c, target(c))
      val onInsert = inserts.getOrElse(c,
        if (keys.contains(c)) srcPrefixed(s"src_$c") else lit(null))
      when(matched, onMatch)
        .when(sourceOnly, onInsert)
        .otherwise(target(c))
        .as(c)
    }
    val kept = deleteWhen match {
      case Some(d) => joined.where(!(matched && coalesce(d, lit(false))))
      case None => joined
    }
    kept.select(outCols: _*)
  }
}

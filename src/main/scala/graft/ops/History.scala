package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dimension-history operators: SCD Type-2 interval builds and CDC-style
  * snapshot diffs. The reference keeps only latest-wins snapshots plus one
  * append log (Repo/RepoLog, ProcessDaily.usql:3556-3593); these operators
  * give the warehouse the other two standard history shapes a consumer
  * expects — a validity-interval dimension and an inserted/updated/deleted
  * changeset between two snapshot times.
  *
  * Scale shape: both are single-shuffle plans. `scd2` is two windows over
  * the SAME (key, order) partitioning — Catalyst reuses one exchange; the
  * change-collapse filter runs between them without repartitioning.
  * `cdcDiff` is one full-outer shuffle join on the key (the standard
  * reconciliation plan); neither collects to the driver.
  */
object History {

  /** SCD Type-2: collapse an event stream into per-key validity intervals
    * over `stateCols`. A row opens a new version whenever any state column
    * differs (null-safely) from the key's previous event; `valid_to` is the
    * next version's `valid_from` (null = still current), `version` numbers
    * versions per key from 1, `is_current` marks the open interval.
    *
    * `tiebreak` pins ordering among same-`order` events so version history
    * is deterministic under re-runs and repartitioning (the W5 lesson —
    * SURVEY §2.5). */
  def scd2(df: DataFrame, keys: Seq[String], order: Column, tiebreak: Column,
      stateCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order, tiebreak)
    // the first event per key always opens a version — lag() returning
    // null there would otherwise make a NULL initial state read as
    // "unchanged" under the null-safe compare
    val changed = (row_number().over(w) === 1) ||
      stateCols
        .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
        .reduce(_ || _)
    val versions = df
      .withColumn("__ord", order).withColumn("__tie", tiebreak)
      .withColumn("__chg", changed)
      .where(col("__chg"))
    val wv = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ord"), col("__tie"))
    versions
      .withColumn("valid_from", col("__ord"))
      .withColumn("valid_to", lead(col("__ord"), 1).over(wv))
      .withColumn("version", row_number().over(wv))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__ord", "__tie", "__chg")
  }

  /** Latest-wins state per key as of `asOf` (inclusive): the snapshot a
    * latest-version-wins table would have held at that moment. One
    * window shuffle; the `order <= asOf` filter is pushed to the scan. */
  def snapshotAt(df: DataFrame, keys: Seq[String], order: Column,
      tiebreak: Column, asOf: Column): DataFrame =
    Merges.latestByKey(df.where(order <= asOf), keys,
      Seq(order.desc, tiebreak.desc))

  /** CDC changeset between two snapshots of the same schema: full outer
    * join on `keys`, classify each key as inserted (`I` — new only),
    * deleted (`D` — old only), or updated (`U` — both sides present and
    * any of `attrs` differs null-safely). Unchanged keys are dropped.
    * Output: keys, `op`, and `<attr>_old` / `<attr>_new` per attribute. */
  def cdcDiff(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
      attrs: Seq[String]): DataFrame = {
    val o = oldSnap.select(
      keys.map(col) ++ attrs.map(c => col(c).as(s"${c}_old")): _*)
    val n = newSnap.select(
      keys.map(col) ++ attrs.map(c => col(c).as(s"${c}_new")): _*)
    // presence flags survive the outer join even when every attr is null
    val j = o.withColumn("__in_old", lit(true))
      .join(n.withColumn("__in_new", lit(true)), keys, "full_outer")
    val differs = attrs
      .map(c => !(col(s"${c}_old") <=> col(s"${c}_new")))
      .reduce(_ || _)
    j.withColumn("op",
        when(col("__in_old").isNull, "I")
          .when(col("__in_new").isNull, "D")
          .when(differs, "U"))
      .where(col("op").isNotNull)
      .drop("__in_old", "__in_new")
  }
}

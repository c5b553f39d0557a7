package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's five composite merge algorithms (SURVEY.md §2.10) as
  * generic, reusable DataFrame operators.
  *
  * Each is a declarative plan — Catalyst decides physical strategy; the only
  * shuffles are the ones the semantics require (one hash partition on the
  * dedup key for the window; broadcast for small anti-join probes). Nothing
  * collects to the driver, so every operator scales to arbitrarily many
  * executors.
  */
object Merges {

  /** The effective-version timestamp: `DeletedAt > ProcessedAt ? DeletedAt :
    * ProcessedAt` (/root/reference/USQL/ProcessDaily.usql:139, 39 uses).
    * Null `deleted_at` makes the comparison false → falls back to
    * `processed_at`, exactly the C# ternary's null semantics. */
  def effectiveTs(deletedAt: Column, processedAt: Column): Column =
    when(deletedAt > processedAt, deletedAt).otherwise(processedAt)

  /** W1–W4 latest-version-wins: rank rows per key by `order`, keep rank 1
    * (ProcessDaily.usql:137-140). `tiebreak` makes the pick deterministic
    * where the reference is not (W5 — Referrers/Paths rank with no ORDER BY,
    * :3387,:3479). Spark ≥3.5 plans this as WindowGroupLimit — per-group
    * top-1 without materializing a full sort. */
  def latestByKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** §2.10(a) snapshot-merge upsert (21 instances; Commit exemplar
    * ProcessDaily.usql:98-177): new-day rows ∪ prior snapshot, latest
    * effective version wins per `keys`. `unionByName` (not positional — the
    * reference's `SELECT *` order dependence is a fragility we don't keep).
    * One shuffle, on `keys`. */
  def snapshotMerge(
      snapshot: DataFrame,
      fresh: DataFrame,
      keys: Seq[String],
      order: Seq[Column]
  ): DataFrame =
    latestByKey(fresh.unionByName(snapshot), keys, order)

  /** §2.10(b) collection full-replacement merge (6 instances;
    * RepoCollaborators exemplar ProcessDaily.usql:25-91): a re-crawled
    * origin's membership rows are replaced wholesale by `fresh`; origins
    * absent from today's crawl carry forward via left-anti
    * (the reference's LEFT JOIN … WHERE IS NULL, :76-80). Final DISTINCT
    * matches :85-91. The anti-join probe (one day's origin list) is small —
    * Catalyst broadcasts it; the big curated side never shuffles. */
  def collectionMerge(
      curated: DataFrame,
      fresh: DataFrame,
      originKey: String
  ): DataFrame = {
    val recrawled = fresh.select(originKey).distinct()
    val kept = curated.join(recrawled, Seq(originKey), "left_anti")
    fresh.unionByName(kept).distinct()
  }

  /** §2.10(e) snapshot + SCD-2-lite history (Repo → RepoLog,
    * ProcessDaily.usql:2619-2631): same input, deduped by `keys :+
    * versionCol` instead of `keys` — one row per observed version. */
  def snapshotPlusLog(
      snapshot: DataFrame,
      log: DataFrame,
      fresh: DataFrame,
      keys: Seq[String],
      versionCol: String,
      order: Seq[Column]
  ): (DataFrame, DataFrame) = {
    val newSnap = snapshotMerge(snapshot, fresh, keys, order)
    val newLog = snapshotMerge(log, fresh, keys :+ versionCol, order)
    (newSnap, newLog)
  }
}

package graft.jobs

import graft.entities.Pipelines
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten erasure over curated tables — the deletion half
  * of the governance story ([[graft.ops.Governance]] masks; this
  * removes). The reference has no erasure surface at all (its curated
  * tables only ever grow, `ProcessDaily.usql` merges); a warehouse
  * holding user-keyed data needs subject deletion as a first-class,
  * auditable job.
  *
  * Mechanics: anti-join the table against the subject-key set and
  * rewrite atomically via the same rename-swap
  * ([[Pipelines.overwriteCurated]]) the TRUNCATE+INSERT path uses — a
  * failure mid-job leaves the prior table intact. The subject set is
  * broadcast (requests are human-scale); the table is scanned once per
  * erasure. Returns a per-table audit row (rows before / erased /
  * after) — the record a compliance log keeps.
  *
  * Scope: operates on materialized curated tables. Merge-on-read delta
  * partitions must be compacted first ([[graft.ops.MergeOnRead]]
  * compaction) so no tombstoned subject survives in an unmerged delta.
  */
object Forget {

  /** Erase every row of `table` whose `keyCol` appears in `subjects`.
    * Idempotent: a second run erases 0 rows. */
  def eraseSubjects(spark: SparkSession, curatedDir: String, table: String,
      keyCol: String, subjects: DataFrame): DataFrame = {
    val keys = subjects.select(col(subjects.columns.head).as(keyCol))
      .distinct()
    val cur = spark.read.parquet(Pipelines.tablePath(curatedDir, table))
    val kept = cur.join(broadcast(keys), Seq(keyCol), "left_anti")
    val before = cur.count()
    val after = kept.count()
    Pipelines.overwriteCurated(kept, curatedDir, table)
    import spark.implicits._
    Seq((table, before, before - after, after))
      .toDF("table", "n_before", "n_erased", "n_after")
  }

  /** Erase one subject set across many (table, keyCol) pairs; one audit
    * row per table, in the given order. */
  def eraseAcross(spark: SparkSession, curatedDir: String,
      tables: Seq[(String, String)], subjects: DataFrame): DataFrame = {
    require(tables.nonEmpty, "need at least one (table, keyCol)")
    tables.map { case (t, k) =>
      eraseSubjects(spark, curatedDir, t, k, subjects)
    }.reduce(_ unionByName _)
  }
}

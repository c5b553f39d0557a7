package graft.core

import org.apache.spark.sql.{DataFrame, GraftSqlShim}

/** Checkpoint rolling for iterative operators: every round of PageRank /
  * BFS / label propagation / connected components / BPE replaces its
  * state frame with a fresh `localCheckpoint()` — and the superseded
  * round's blocks sit in the block manager until driver GC notices,
  * which a long session may never do (see
  * [[org.apache.spark.sql.GraftSqlShim.freeLocalCheckpoint]] for the
  * measured effect). [[roll]] pairs the two steps so live checkpoint
  * storage stays at ONE round's state per operator.
  *
  * Contract: a frame passed as `superseded` must never be read again —
  * its lineage was truncated by the checkpoint, so the freed blocks
  * cannot be recomputed. */
object Ckpt {

  /** Eagerly `localCheckpoint()` `next` (materializing it), then free
    * the storage of the `superseded` checkpoints. Nulls and repeated
    * frames are tolerated (unpersist is idempotent), so callers can
    * pass possibly-aliased round state without bookkeeping. */
  def roll(next: DataFrame, superseded: DataFrame*): DataFrame = {
    val out = next.localCheckpoint()
    free(superseded: _*)
    out
  }

  /** Free the checkpoint storage of frames that are provably dead. */
  def free(dfs: DataFrame*): Unit =
    dfs.foreach(df => if (df != null) GraftSqlShim.freeLocalCheckpoint(df))
}

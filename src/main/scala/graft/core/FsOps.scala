package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ONE audited implementation of the crash-safe directory swap that
  * publishes a prepared replacement: `target`→`old`, `tmp`→`target`,
  * rollback to `old` if the second rename fails, GC `old` on success.
  * Every window leaves a readable state: crash before the first rename →
  * old target intact (tmp is invisible dot-prefixed staging); crash
  * between the renames → rollback restores the target (and a dead `old`
  * dir is re-adopted by the caller's next attempt or reaped by its GC);
  * crash after the swap → new target is live, `old` is garbage.
  *
  * Extracted from the two hand-rolled copies in `MergeOnRead.compact`
  * and `Ann.ivfCompactDeltas` — crash-safety-critical code should exist
  * once. Callers stage the full replacement (including any marker files
  * that must publish atomically WITH the data — e.g. the IVF
  * `_compacted_to` watermark) inside `tmp` BEFORE calling. */
object FsOps {

  def atomicSwap(fs: FileSystem, tmp: Path, target: Path, old: Path): Unit = {
    val hadPrior = fs.exists(target)
    if (hadPrior && !fs.rename(target, old))
      throw new java.io.IOException(s"rename $target -> $old failed")
    if (!fs.rename(tmp, target)) {
      if (hadPrior) fs.rename(old, target)
      throw new java.io.IOException(s"rename $tmp -> $target failed")
    }
    if (hadPrior) fs.delete(old, true)
  }
}

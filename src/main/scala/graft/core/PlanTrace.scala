package graft.core

import org.apache.spark.sql.DataFrame

/** Optimization-evidence hook: when `-Dgraft.plantrace.dir=<dir>` is set,
  * write a frame's `explain(formatted)` to `<dir>/<tag>.txt`. Iterative
  * operators call it on their FIRST round's update frame BEFORE the
  * checkpoint truncates lineage — the per-round join/aggregate shape the
  * post-checkpoint `Scan ExistingRDD` stubs can never show (the round-9
  * evidence gap). Inert in production and in the bench: one system-
  * property lookup per call. */
object PlanTrace {
  def dump(tag: String, df: DataFrame): Unit =
    sys.props.get("graft.plantrace.dir").foreach { d =>
      val dir = java.nio.file.Paths.get(d)
      java.nio.file.Files.createDirectories(dir)
      val f = dir.resolve(s"$tag.txt")
      // first caller wins: round 1's plan, not round N's
      if (!java.nio.file.Files.exists(f)) {
        java.nio.file.Files.writeString(f,
          s"== $tag — explain(formatted), pre-checkpoint round plan ==\n" +
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode) + "\n")
        ()
      }
    }
}

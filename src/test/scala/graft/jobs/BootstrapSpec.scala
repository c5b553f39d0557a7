package graft.jobs

import graft.SparkSpec
import graft.entities.Fixtures
import graft.ingest.Staging

/** Bootstrap (full-history single pass) must produce exactly the tables
  * that day-by-day ProcessDaily replay produces — the CreateAndInitialize*
  * vs ProcessDaily equivalence the reference assumes but never tests. */
class BootstrapSpec extends SparkSpec {

  test("bootstrap over all history ≡ day-by-day incremental merge") {
    val a = scratch("boot-a"); val b = scratch("boot-b")
    Fixtures.writeStandardFixture(s"$a/raw/v1")
    Fixtures.writeStandardFixture(s"$b/raw/v1")
    // path A: incremental daily replay
    ProcessDaily.stageAndProcess(spark, s"$a/raw/v1", s"$a/staging", s"$a/curated", Fixtures.day1)
    ProcessDaily.stageAndProcess(spark, s"$a/raw/v1", s"$a/staging", s"$a/curated", Fixtures.day2)
    // path B: stage both days, then one full-history bootstrap
    Staging.stageDay(spark, s"$b/raw/v1", s"$b/staging", Fixtures.day1)
    Staging.stageDay(spark, s"$b/raw/v1", s"$b/staging", Fixtures.day2)
    Bootstrap.run(spark, s"$b/staging", s"$b/curated")

    // compare every snapshot-merged table (collection/traffic tables are
    // also order-insensitive; commit_parent is append-only faithful mode
    // and EXPECTED to differ — one append vs two)
    for (t <- Seq("commit", "commit_file", "issue", "issue_label", "repo",
        "repo_log", "user", "event", "repo_clones", "repo_collaborators")) {
      val rowsA = spark.read.parquet(s"$a/curated/$t").collect()
        .map(_.toSeq.map(Option(_).map(_.toString).orNull)).toSet
      val rowsB = spark.read.parquet(s"$b/curated/$t").collect()
        .map(_.toSeq.map(Option(_).map(_.toString).orNull)).toSet
      assert(rowsA == rowsB, s"table $t diverged")
    }
  }
}

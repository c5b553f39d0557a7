package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Unit semantics of the five merge building blocks (SURVEY.md §2.10). */
class MergesSpec extends SparkSpec {
  import spark.implicits._

  test("effectiveTs: null deleted_at falls back to processed_at (C# ternary nulls)") {
    val df = Seq(
      ("a", Some("2017-01-02T00:00:00"), "2017-01-01T00:00:00"),
      ("b", None, "2017-01-01T00:00:00"),
      ("c", Some("2016-12-31T00:00:00"), "2017-01-01T00:00:00")
    ).toDF("k", "del", "proc")
      .select(col("k"), col("del").cast("timestamp").as("del"),
        col("proc").cast("timestamp").as("proc"))
      .withColumn("eff", Merges.effectiveTs(col("del"), col("proc")))
    val got = df.select("k", "eff").as[(String, java.sql.Timestamp)].collect().toMap
    assert(got("a").toString.startsWith("2017-01-02")) // deleted later → deleted
    assert(got("b").toString.startsWith("2017-01-01")) // null deleted → processed
    assert(got("c").toString.startsWith("2017-01-01")) // deleted earlier → processed
  }

  test("latestByKey picks exactly one row per key by order") {
    val df = Seq(("k1", 1, "old"), ("k1", 2, "new"), ("k2", 5, "only"))
      .toDF("k", "v", "tag")
    val got = Merges.latestByKey(df, Seq("k"), Seq(col("v").desc))
      .select("k", "tag").as[(String, String)].collect().toMap
    assert(got == Map("k1" -> "new", "k2" -> "only"))
  }

  test("snapshotMerge: fresh beats snapshot on order; union is by name") {
    val snap = Seq(("k1", 1, "s1"), ("k2", 1, "s2")).toDF("k", "v", "tag")
    // deliberately different column order — positional union would corrupt
    val fresh = Seq(("f1", 2, "k1")).toDF("tag", "v", "k")
    val got = Merges.snapshotMerge(snap, fresh, Seq("k"), Seq(col("v").desc))
      .select("k", "tag").as[(String, String)].collect().toMap
    assert(got == Map("k1" -> "f1", "k2" -> "s2"))
  }

  test("snapshotMerge is idempotent and permutation-invariant") {
    val versions = Seq(("k", 1, "a"), ("k", 3, "c"), ("k", 2, "b"))
    for (perm <- versions.permutations.take(6)) {
      val df = perm.toDF("k", "v", "tag")
      val m1 = Merges.snapshotMerge(df, df, Seq("k"), Seq(col("v").desc, col("tag").desc))
      assert(m1.select("tag").as[String].collect().toSeq == Seq("c"))
    }
  }

  test("collectionMerge replaces re-crawled origins, carries the rest, dedups") {
    val curated = Seq(("o1", "m1"), ("o1", "m2"), ("o2", "m9")).toDF("origin", "member")
    val fresh = Seq(("o1", "m3"), ("o1", "m3")).toDF("origin", "member")
    val got = Merges.collectionMerge(curated, fresh, "origin")
      .as[(String, String)].collect().toSet
    assert(got == Set(("o1", "m3"), ("o2", "m9")))
  }

  test("snapshotPlusLog: snapshot dedups by key, log by key+version") {
    val empty = Seq.empty[(String, Int, Int)].toDF("k", "ver", "ord")
    val fresh = Seq(("k", 1, 10), ("k", 1, 11), ("k", 2, 12)).toDF("k", "ver", "ord")
    val (snap, log) = Merges.snapshotPlusLog(empty, empty, fresh, Seq("k"), "ver",
      Seq(col("ord").desc))
    assert(snap.count() == 1 && snap.head().getAs[Int]("ord") == 12)
    assert(log.count() == 2) // one per version, latest observation each
    assert(log.where(col("ver") === 1).head().getAs[Int]("ord") == 11)
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5 layer 4) over generated inputs.
  * ScalaCheck generators with fixed seeds (deterministic CI); each property
  * checks a handful of generated datasets — Spark job latency makes
  * hundreds of iterations pointless, diverse shapes are what matter.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  /** (key, effectiveTs-epoch, payload) version rows; keys collide often. */
  private val versionsGen: Gen[List[(String, Long, String)]] =
    Gen.listOfN(25, for {
      k <- Gen.oneOf("k1", "k2", "k3", "k4", "k5")
      ts <- Gen.choose(0L, 50L)
      p <- Gen.alphaLowerStr.map(_.take(5))
    } yield (k, ts, p))

  private def toDf(rows: List[(String, Long, String)]): DataFrame =
    rows.toDF("key", "ts", "payload")

  private def merged(snapshot: DataFrame, fresh: DataFrame): DataFrame =
    Merges.snapshotMerge(snapshot, fresh, Seq("key"),
      Seq(col("ts").desc, col("payload").desc))

  private def canon(df: DataFrame): Set[(String, Long, String)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet

  test("property: snapshotMerge emits exactly one row per key") {
    for (rows <- samples(versionsGen, 6) if rows.nonEmpty) {
      val out = merged(toDf(rows.take(10)), toDf(rows.drop(10)))
      val keys = out.select("key").collect().map(_.getString(0))
      assert(keys.length == keys.distinct.length)
      assert(keys.toSet == rows.map(_._1).toSet)
    }
  }

  test("property: re-merging the same day is a no-op (idempotence)") {
    for (rows <- samples(versionsGen, 6) if rows.nonEmpty) {
      val (snap, fresh) = (toDf(rows.take(12)), toDf(rows.drop(12)))
      val once = merged(snap, fresh)
      val twice = merged(once, fresh)
      assert(canon(twice) == canon(once))
    }
  }

  test("property: merge result is invariant under input row permutation") {
    for (rows <- samples(versionsGen, 6) if rows.nonEmpty) {
      val shuffled = new scala.util.Random(7).shuffle(rows)
      val a = merged(toDf(rows.take(10)), toDf(rows.drop(10)))
      // same multiset, different order AND different snapshot/fresh split:
      // latest-wins must not care where a version arrived from
      val b = merged(toDf(shuffled.take(15)), toDf(shuffled.drop(15)))
      assert(canon(a) == canon(b))
    }
  }

  test("property: exactDedup conserves row count and group minima") {
    val docsGen = Gen.listOfN(20, for {
      id <- Gen.choose(0L, 100L)
      t <- Gen.oneOf("a b c", "d e f", "a b d", "x")
    } yield (id, t))
    for (rows <- samples(docsGen, 6) if rows.nonEmpty) {
      val df = rows.toDF("doc_id", "text")
      val out = TextDedup.exactDedup(df, "doc_id", "text").collect()
      assert(out.map(_.getLong(2)).sum == rows.length)
      val expectKeep = rows.groupBy(_._2).map { case (t, rs) => rs.map(_._1).min }.toSet
      assert(out.map(_.getLong(1)).toSet == expectKeep)
    }
  }

  test("property: simhash depends on token multiset, not order") {
    val textGen = Gen.listOfN(8, Gen.oneOf("alpha", "beta", "gamma", "delta"))
    for ((words, i) <- samples(textGen, 6).zipWithIndex if words.nonEmpty) {
      val shuffled = new scala.util.Random(i).shuffle(words)
      val df = Seq((1L, words.mkString(" ")), (2L, shuffled.mkString(" ")))
        .toDF("doc_id", "text")
      val fps = TextDedup.simhash(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fps(1L) == fps(2L))
    }
  }

  test("property: collectionMerge replaces re-crawled origins wholesale") {
    val memberGen = Gen.listOfN(15, for {
      o <- Gen.oneOf("o1", "o2", "o3")
      m <- Gen.choose(0, 9).map(i => s"m$i")
    } yield (o, m))
    for (i <- 0 until 6) {
      val stored = samples(memberGen, 1).head.toDF("origin", "member")
      val freshRows = samples(memberGen.map(_.filter(_._1 != "o3")), 1).head
      val fresh = freshRows.toDF("origin", "member")
      val out = Merges.collectionMerge(stored, fresh, "origin")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val freshOrigins = freshRows.map(_._1).toSet
      // re-crawled origins: exactly the fresh membership
      assert(out.filter(p => freshOrigins(p._1)) == freshRows.toSet)
      // untouched origins: carried forward unchanged
      val storedKept = canonPairs(stored).filterNot(p => freshOrigins(p._1))
      assert(out.filterNot(p => freshOrigins(p._1)) == storedKept)
    }
  }

  private def canonPairs(df: DataFrame): Set[(String, String)] =
    df.collect().map(r => (r.getString(0), r.getString(1))).toSet
}

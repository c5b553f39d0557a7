package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("hash sampling is deterministic and ~proportional") {
    val a = Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 0.3))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 0.3))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b) // same sample, every run
    val en = docs.where(col("lang") === "en").count().toDouble
    val enKept = Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 0.3))
      .where(col("lang") === "en").count().toDouble
    assert(enKept / en > 0.1 && enKept / en < 0.5) // ~0.3 of en stratum
    // non-en strata untouched at defaultFraction 1.0
    val other = docs.where(col("lang") =!= "en").count()
    val otherKept = Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 0.3))
      .where(col("lang") =!= "en").count()
    assert(other == otherKept)
  }

  test("different salts draw different samples") {
    val a = Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 0.3), salt = "s0")
      .count()
    val b = Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 0.3), salt = "s1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val aSet = Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 0.3), salt = "s0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(aSet != b)
  }

  test("quotaPerGroup keeps exactly the top-N per group") {
    val df = Seq(
      ("s1", 1L, 0.9), ("s1", 2L, 0.8), ("s1", 3L, 0.7),
      ("s2", 4L, 0.5)
    ).toDF("source", "doc_id", "q")
    val out = Sampling.quotaPerGroup(df, Seq("source"),
      Seq(col("q").desc, col("doc_id").asc), quota = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L, 4L))
  }

  test("tokenBudgetPerGroup fills greedily, keeps the boundary doc, per group") {
    val df = Seq(
      // s1 ordered by quality desc: 1 (60 toks), 2 (50), 3 (10)
      ("s1", 1L, 0.9, 60), ("s1", 2L, 0.8, 50), ("s1", 3L, 0.7, 10),
      ("s2", 4L, 0.5, 500)
    ).toDF("source", "doc_id", "q", "n_tokens")
    val out = Sampling.tokenBudgetPerGroup(df, Seq("source"),
      Seq(col("q").desc, col("doc_id").asc), col("n_tokens"), budget = 100)
      .collect().map(r => r.getLong(1) -> r.getAs[Long]("cum_before")).toMap
    // doc 1: 0 before (kept); doc 2: 60 before < 100 (kept, crosses the
    // boundary); doc 3: 110 before (dropped); doc 4: 0 before (kept)
    assert(out == Map(1L -> 0L, 2L -> 60L, 4L -> 0L))
  }
}

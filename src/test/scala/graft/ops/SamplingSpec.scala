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

  test("assignSplits: partition complete, ratios ~honored, stable under repartition") {
    val ids = spark.range(0, 10000).toDF("doc_id")
    val s = Sampling.assignSplits(ids, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), kFolds = 5)
    val bysplit = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bysplit.values.sum == 10000)                    // complete partition
    assert(math.abs(bysplit("train") - 8000) < 300, bysplit)
    assert(math.abs(bysplit("val") - 1000) < 150, bysplit)
    assert(math.abs(bysplit("test") - 1000) < 150, bysplit)
    val folds = s.groupBy("fold").count().collect().map(_.getLong(1))
    assert(folds.length == 5 && folds.forall(n => math.abs(n - 2000) < 200))
    // fold is independent of split: every (split, fold) cell is populated
    assert(s.select("split", "fold").distinct().count() == 15)
    // membership is a function of the key alone — identical after reshuffle
    val again = Sampling.assignSplits(ids.repartition(13), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), kFolds = 5)
      .select("doc_id", "split", "fold").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val first = s.select("doc_id", "split", "fold").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(first == again)
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

  test("weightedSample: exactly k per group, reproducible, partition-invariant") {
    val df = spark.range(200).toDF("id")
      .withColumn("g", (col("id") % 2).cast("string"))
      .withColumn("w", col("id") + lit(1L))
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSample(d, Seq("g"), "id", col("w"), k = 10)
        .select("id").collect().map(_.getLong(0)).toSet
    val a = run(df)
    assert(a.size == 20) // 10 per group × 2 groups, disjoint ids
    assert(run(df.repartition(7)) == a)   // partitioning-independent
    assert(run(df.orderBy(col("id").desc)) == a) // order-independent
  }

  test("weightedSample matches a driver-side Efraimidis-Spiridakis replay") {
    val df = spark.range(50).toDF("id").withColumn("g", lit("x"))
      .withColumn("w", col("id") * col("id") + lit(1L))
    val got = Sampling.weightedSample(df, Seq("g"), "id", col("w"), k = 5)
      .select("id").collect().map(_.getLong(0)).toSet
    // replay: u = hash60(md5("<id>:w0"))/2^60, priority = ln(u)/w, top-5
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = (0L until 50L).map { id =>
      val hex = md.digest(s"$id:w0".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val u = java.lang.Long.parseLong(hex, 16).toDouble / math.pow(2, 60)
      val pri = BigDecimal(math.log(u) / (id * id + 1L))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      (pri, id)
    }.sortBy { case (p, id) => (-p, id) }.take(5).map(_._2).toSet
    assert(got == want)
  }

  test("deterministicShuffle: partition-invariant total order, epochs differ") {
    val df = (0L until 200L).map(i => (i, s"t$i")).toDF("id", "payload")
    def order(d: org.apache.spark.sql.DataFrame, epoch: Int): Seq[Long] = {
      val out = Sampling.deterministicShuffle(d, "id", epoch, numPartitions = 4)
      // rows read partition 0..n-1, in partition order = the global order
      out.select(col("id"), spark_partition_id().as("p"),
          col("shuffle_pos"))
        .collect()
        .sortBy(r => (r.getInt(1), r.getLong(2), r.getLong(0)))
        .map(_.getLong(0)).toSeq
    }
    val e1 = order(df, 1)
    // same epoch over a differently-partitioned input: identical order
    assert(order(df.repartition(7), 1) == e1)
    // range partitioning means partition-major read order IS hash order
    val byHash = Sampling.deterministicShuffle(df, "id", 1, 4)
      .select("id", "shuffle_pos").collect()
      .sortBy(r => (r.getLong(1), r.getLong(0))).map(_.getLong(0)).toSeq
    assert(e1 == byHash)
    // a different epoch produces a genuinely different permutation
    assert(order(df, 2) != e1)
    assert(order(df, 2).toSet == e1.toSet)
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

  test("contrastivePairs: dup-group positives, cross-content negatives, stable") {
    val docs = Seq(
      (1L, "same text"), (2L, "same text"), (3L, "same text"),
      (4L, "other a"), (5L, "other b"), (6L, "other c")
    ).toDF("doc_id", "text")
    val out = Sampling.contrastivePairs(docs, "doc_id", "text", buckets = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val pos = out.filter(_._3 == 1).map(p => (p._1, p._2)).toSet
    assert(pos == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      "all within-group pairs, canonical a<b")
    val neg = out.filter(_._3 == 0)
    assert(neg.nonEmpty, "successor pairing must produce negatives")
    assert(neg.forall { case (a, b, _) => a != b }, "no self pairs")
    // negatives never pair two same-content docs
    val text = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(neg.forall { case (a, b, _) => text(a) != text(b) })
    // deterministic under repartitioning
    val rep = Sampling.contrastivePairs(docs.repartition(5), "doc_id",
        "text", buckets = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(rep == out.toSet)
  }
}

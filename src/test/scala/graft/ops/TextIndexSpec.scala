package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("search ≡ brute-force text scan for single and conjunctive terms") {
    val idx = scratch("text-index")
    TextIndex.build(docs, "doc_id", "text", idx, numBuckets = 16)

    // pick two words guaranteed present
    val Array(w1, w2) = docs.select(explode(split(col("text"), " ")).as("t"))
      .where(col("t") =!= "").groupBy("t").count()
      .orderBy(col("count").desc, col("t").asc).limit(2)
      .collect().map(_.getString(0))

    def brute(terms: Seq[String]) = docs.where(
        terms.map(t => concat(lit(" "), col("text"), lit(" "))
          .contains(s" $t ")).reduce(_ && _))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet

    val single = TextIndex.search(spark, idx, Seq(w1), 16)
      .collect().map(_.getLong(0)).toSet
    assert(single == brute(Seq(w1)), s"single-term mismatch for '$w1'")
    assert(single.nonEmpty)

    val conj = TextIndex.search(spark, idx, Seq(w1, w2), 16)
      .collect().map(_.getLong(0)).toSet
    assert(conj == brute(Seq(w1, w2)), s"conjunction mismatch '$w1' AND '$w2'")
    assert(conj.subsetOf(single))

    // absent term → empty, not an error
    assert(TextIndex.search(spark, idx, Seq("zzz_not_a_word"), 16).count() == 0)
  }

  test("searchAny ∪ and searchPhrase positions match brute force") {
    val idx = scratch("text-index-pos")
    TextIndex.buildPositional(docs, "doc_id", "text", idx, numBuckets = 16)

    // a real two-word phrase taken from the corpus itself
    val Array(w1, w2) = docs.select(split(col("text"), " ").as("ws"))
      .where(size(col("ws")) >= 2)
      .select(col("ws").getItem(0), col("ws").getItem(1))
      .head().toSeq.map(_.asInstanceOf[String]).toArray
    val phrase = TextIndex.searchPhrase(spark, idx, Seq(w1, w2), 16)
      .collect().map(_.getLong(0)).toSet
    val brutePhrase = docs.where(
        concat(lit(" "), col("text"), lit(" ")).contains(s" $w1 $w2 "))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(phrase == brutePhrase, s"phrase '$w1 $w2'")
    assert(phrase.nonEmpty)
    // phrase ⊆ conjunction of its words
    val conj = TextIndex.searchPhrase(spark, idx, Seq(w1), 16)
      .collect().map(_.getLong(0)).toSet
    assert(phrase.subsetOf(conj))

    // OR search over the membership index
    val midx = scratch("text-index-or")
    TextIndex.build(docs, "doc_id", "text", midx, numBuckets = 16)
    val any = TextIndex.searchAny(spark, midx, Seq(w1, "zzz_absent"), 16)
      .collect().map(_.getLong(0)).toSet
    val single = TextIndex.search(spark, midx, Seq(w1), 16)
      .collect().map(_.getLong(0)).toSet
    assert(any == single) // absent term adds nothing
  }

  test("lookup scan is partition-pruned to one bkt= directory") {
    val idx = scratch("text-index-prune")
    TextIndex.build(docs.limit(50), "doc_id", "text", idx, numBuckets = 16)
    val term = docs.select(explode(split(col("text"), " ")).as("t"))
      .where(col("t") =!= "").head().getString(0)
    val plan = TextIndex.lookup(spark, idx, term, 16)
      .queryExecution.executedPlan.toString
    // partition filter present on the bucket column
    assert(plan.contains("PartitionFilters") && plan.contains("bkt"),
      s"expected bkt partition filter:\n$plan")
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EncodeSpec extends SparkSpec {
  import spark.implicits._

  test("dictionary: sorted-order codes, partition-invariant") {
    val df = Seq("web", "books", "code", "web", "books")
      .toDF("src")
    val dict = Encode.dictionary(df, "src").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(dict == Map("books" -> 0, "code" -> 1, "web" -> 2))
    val dict2 = Encode.dictionary(df.repartition(5), "src").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(dict2 == dict)
  }

  test("encode: codes join back; unknown values get -1; nulls get -1") {
    val train = Seq("b", "a", "c").toDF("src")
    val dict = Encode.dictionary(train, "src")
    val infer = Seq(Some("a"), Some("zzz"), None, Some("c")).toDF("src")
    val out = Encode.encode(infer, dict, "src").collect()
      .map(r => Option(r.getString(0)) -> r.getInt(1))
    assert(out.toSet == Set(Some("a") -> 0, Some("zzz") -> -1,
      None -> -1, Some("c") -> 2))
  }

  test("dictionary: cardinality contract is enforced") {
    val df = (0 until 100).map(_.toString).toDF("src")
    intercept[IllegalArgumentException] {
      Encode.dictionary(df, "src", maxCardinality = 10)
    }
  }

  test("encode plan broadcasts the dictionary — the corpus never shuffles") {
    val df = (0L until 1000L).map(i => (i, s"s${i % 7}")).toDF("id", "src")
    val enc = Encode.encode(df, Encode.dictionary(df, "src"), "src")
    val plan = enc.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"))
    assert(!plan.contains("SortMergeJoin"))
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted top-k ≡ plain window top-k on real data (differential)") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val order = Seq(col("o_totalprice").desc, col("o_orderkey").asc)
    for (k <- Seq(1, 3)) {
      val salted = Skew.topKPerKeySalted(orders, Seq("o_custkey"), order, k, salts = 4)
        .select("o_custkey", "o_orderkey").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy(order: _*)
      val plain = orders.withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= k)
        .select("o_custkey", "o_orderkey").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(salted == plain, s"k=$k")
    }
  }

  test("salted latest-by-key handles a pathologically hot key") {
    import spark.implicits._
    // one key with 10k versions, a few cold keys
    val hot = (0 until 10000).map(i => ("hot", i.toLong, s"v$i"))
    val cold = Seq(("a", 5L, "va"), ("b", 9L, "vb"))
    val df = (hot ++ cold).toDF("key", "ts", "payload")
    val out = Skew.latestByKeySalted(df, Seq("key"), Seq(col("ts").desc), salts = 8)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out == Map("hot" -> "v9999", "a" -> "va", "b" -> "vb"))
  }
}

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

  test("AQE splits a skewed shuffle-join partition at runtime (skew=true)") {
    import spark.implicits._
    // manual salting (Skew.*) is for WINDOWS, where AQE can't help; for
    // JOINS the engine's own answer is AQE skew-join — prove the session
    // config surface actually triggers it on a hot key
    val hot = (0 until 20000).map(i => ("hot", s"payload_$i" * 8)) ++
      (0 until 50).map(i => (s"k$i", "x"))
    val left = hot.toDF("key", "pay")
    val right = (Seq("hot") ++ (0 until 50).map(i => s"k$i"))
      .flatMap(k => (0 until 20).map(j => (k, j))).toDF("key", "n")
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "20KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // global aggregate: no downstream requirement of hash(key), so AQE
      // is FREE to split the hot partition (a groupBy(key) right after
      // the join would pin the partitioning and legitimately forbid it);
      // summing over pay keeps the fat column flowing through the join
      val j = left.join(right, "key")
        .agg(count(lit(1)).as("n"), sum(length(col("pay"))).as("bytes"))
      val row = j.collect().head
      assert(row.getLong(0) == 20000L * 20 + 50L * 20)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("saltedEquiJoin is row-identical to the plain join under heavy skew") {
    import spark.implicits._
    // 500 rows on one hot key + a long tail
    val big = ((1 to 500).map(i => (1L, i.toLong)) ++
      (2L to 50L).map(k => (k, k))).toDF("k", "payload")
    val small = (1L to 50L).map(k => (k, s"dim$k")).toDF("k", "name")
    def counts(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = counts(big.join(small, "k"))
    val salted = counts(Skew.saltedEquiJoin(big, small, "k", salts = 7))
    assert(salted == plain)
    assert(plain(1L) == 500L, "hot key joins every row exactly once")
  }
}

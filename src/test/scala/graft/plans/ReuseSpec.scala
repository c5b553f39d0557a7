package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ReuseSpec extends SparkSpec {

  private def dir = "/root/testdata/sf0.001"

  test("commonSubplans finds the filter+join subtree shared by two queries") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val or = spark.read.parquet(s"$dir/orders.parquet")
    // shared expensive subtree: filtered join, spelled with different
    // downstream shapes (agg vs projection) and different alias names
    def shared = li.where(col("l_quantity") > 40)
      .join(or, col("l_orderkey") === col("o_orderkey"))
    val q1 = shared.groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("s"))
    val q2 = shared.select(col("l_orderkey").as("k"), col("o_totalprice"))
    val q3 = spark.read.parquet(s"$dir/customer.parquet")
      .groupBy(col("c_mktsegment")).count() // unrelated
    val cands = Reuse.commonSubplans(Seq(q1, q2, q3), minOps = 3)
    assert(cands.nonEmpty)
    val top = cands.head
    assert(top.nQueries == 2, s"top candidate: $top")
    assert(top.nOccurrences >= 2)
    assert(top.sample.contains("Join"), s"expected the join subtree:\n$top")
    // no candidate is claimed by the unrelated third query only
    assert(cands.forall(_.nQueries >= 2) || cands.forall(_.nOccurrences >= 2))
  }

  test("bare scans repeated across queries do not qualify below minOps") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val q1 = li.groupBy(col("l_returnflag")).count()
    val q2 = li.groupBy(col("l_linestatus")).count()
    // the only shared subtree is the 1-op scan — filtered out at minOps=2
    val cands = Reuse.commonSubplans(Seq(q1, q2), minOps = 2)
    assert(cands.isEmpty, s"unexpected candidates: $cands")
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bounded-heap top-k aggregate must be bit-identical to the
  * window+row_number spelling it replaces — including tie order and
  * cross-partition merge — while planning as an ObjectHashAggregate with
  * a map-side partial (no sort, no full-grid exchange). */
class TopKByScoreSpec extends SparkSpec {
  import spark.implicits._

  test("topK ≡ row_number window incl. score ties (differential)") {
    val rows = (for {
      key <- 0 until 7
      i <- 0 until 50
    } yield (key.toLong, ((key * 31 + i * 17) % 13).toDouble / 13.0, i.toLong))
      .toDF("vec_id", "cosine", "neighbor_id")
      .repartition(8) // force cross-partition partial merges
    val viaAgg = rows.groupBy("vec_id")
      .agg(TopKByScore.topK(col("cosine"), col("neighbor_id"), 5).as("t"))
      .select(col("vec_id"), posexplode(col("t")).as(Seq("i", "e")))
      .select(col("vec_id"), col("e.id").as("neighbor_id"),
        col("e.score").as("cosine"), (col("i") + 1).cast("int").as("rank"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val viaWindow = rows.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select("vec_id", "neighbor_id", "cosine", "rank")
    def s(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
    val (a, b) = (s(viaAgg), s(viaWindow))
    assert(a == b && a.size == 35)
  }

  test("groups smaller than k emit all members; nulls skipped") {
    val rows = Seq(
      (1L, Some(0.9), 10L), (1L, Some(0.8), 11L), (1L, None, 12L)
    ).toDF("vec_id", "cosine", "neighbor_id")
    val out = rows.groupBy("vec_id")
      .agg(TopKByScore.topK(col("cosine"), col("neighbor_id"), 5).as("t"))
      .select(size(col("t"))).head().getInt(0)
    assert(out == 2)
  }

  test("plans as ObjectHashAggregate with map-side partial, no sort") {
    val rows = (0 until 1000)
      .map(i => ((i % 4).toLong, i.toDouble, i.toLong))
      .toDF("vec_id", "cosine", "neighbor_id")
    val df = rows.groupBy("vec_id")
      .agg(TopKByScore.topK(col("cosine"), col("neighbor_id"), 3).as("t"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"no object hash agg:\n$p")
    assert(p.contains("partial_topk_by_score"), s"no map-side partial:\n$p")
    assert(!p.contains("SortAggregate"), s"fell back to sort agg:\n$p")
  }

  test("SQL registration: topk_by_score usable in spark.sql text") {
    org.apache.spark.sql.GraftSqlShim.registerFunction(spark, "topk_by_score",
      es => TopKByScore(es.head, es(1), 2))
    Seq((1L, 0.5, 7L)).toDF("k", "s", "i").createOrReplaceTempView("tkv")
    val out = spark.sql(
      "SELECT topk_by_score(s, i, 2) FROM tkv GROUP BY k").head().getSeq[Any](0)
    assert(out.length == 1)
  }
}

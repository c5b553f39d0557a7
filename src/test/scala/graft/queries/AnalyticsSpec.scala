package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the analytics surface that the DuckDB oracle can't
  * express directly (monotonicity, distribution laws, window-free
  * growth accounting).
  */
class AnalyticsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("running distinct: cumulative is monotone and ends at total users") {
    val rows = Analytics.q109RunningDistinct(spark, dir)
      .orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // cum is the prefix sum of new_users, strictly increasing
    rows.foldLeft(0L) { case (acc, (_, nu, cum)) =>
      assert(cum == acc + nu && nu > 0); cum
    }
    val users = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id").distinct().count()
    assert(rows.last._3 == users)
  }

  test("benford: digits 1-9, shares sum to 1, law column matches log10") {
    val rows = Analytics.q110Benford(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).toSet.subsetOf((1L to 9L).toSet))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    rows.foreach { case (d, _, _, law) =>
      assert(math.abs(law - math.log10(1.0 + 1.0 / d)) < 1e-6)
    }
  }

  test("moving median sits within the frame's min/max and handles warmup") {
    val rows = Analytics.q111MovingMedian(spark, dir)
      .orderBy("day").collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.indices.foreach { i =>
      val frame = rows.slice(math.max(0, i - 6), i + 1).map(_._1)
      assert(rows(i)._2 >= frame.min && rows(i)._2 <= frame.max)
    }
    // warmup frame of size 1: median IS the value
    assert(rows.head._2 == rows.head._1.toDouble)
  }

  test("survivorship: one golden row per user; fields are latest non-null") {
    import spark.implicits._
    val golden = Analytics.q112Survivorship(spark, dir)
    val users = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id").distinct().count()
    assert(golden.count() == users)
    assert(golden.groupBy("user_id").count()
      .where(col("count") > 1).isEmpty)
    // differential: brute-force latest non-null per field for one user
    val ev = graft.core.Tables.table(spark, dir, "events")
      .withColumn("ts_us", expr("ts div 1000L"))
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .select("user_id", "ts_us", "event_id", "k")
      .as[(Long, Long, Long, Long)].collect()
    val uid = ev.head._1
    val mine = ev.filter(_._1 == uid).sortBy(t => (-t._2, -t._3))
    def expected(m: Int, p: String): Option[String] =
      mine.collectFirst { case (_, _, _, k) if k % m != 0 => s"$p${k % m}" }
    val row = golden.where(col("user_id") === uid).head()
    assert(Option(row.getString(1)) == expected(7, "d"))
    assert(Option(row.getString(2)) == expected(5, "c"))
    assert(Option(row.getString(3)) == expected(3, "p"))
  }
}

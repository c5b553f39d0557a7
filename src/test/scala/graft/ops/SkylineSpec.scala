package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skyline correctness: the two-stage distributed formulation must equal
  * the quadratic NOT EXISTS definition for any bucket count, keep tied
  * frontier duplicates, and never feed the full input to the dominance
  * join (only the broadcast-sized candidate set).
  */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, Double, Int)]): Set[(Long, Double, Int)] =
    rows.filterNot { case (_, price, sz) =>
      rows.exists { case (_, p2, s2) =>
        p2 <= price && s2 >= sz && (p2 < price || s2 > sz)
      }
    }.toSet

  private val fixture: Seq[(Long, Double, Int)] = {
    val rnd = new scala.util.Random(42)
    (1L to 400L).map(i => (i, 900.0 + rnd.nextInt(1000) / 10.0, 1 + rnd.nextInt(50)))
  }

  test("matches the quadratic definition, at several bucket counts") {
    val df = fixture.toDF("id", "price", "sz")
    val expected = brute(fixture)
    for (b <- Seq(1, 3, 64)) {
      val got = Skyline.skyline2d(df, "price", "sz", buckets = b)
        .as[(Long, Double, Int)].collect().toSet
      assert(got == expected, s"buckets=$b diverged from NOT EXISTS")
    }
  }

  test("tied frontier points all survive; dominated ties are dropped") {
    // (1) and (2) are identical frontier points — neither dominates the
    // other; (3) shares the price but has smaller size → dominated;
    // (4) shares the size but is pricier → dominated
    val rows = Seq((1L, 10.0, 5), (2L, 10.0, 5), (3L, 10.0, 4), (4L, 11.0, 5))
    val got = Skyline.skyline2d(rows.toDF("id", "price", "sz"), "price", "sz")
      .as[(Long, Double, Int)].collect().toSet
    assert(got == Set((1L, 10.0, 5), (2L, 10.0, 5)))
    assert(got == brute(rows))
  }

  test("dominance join runs on the broadcast pruned candidates, not the input") {
    val df = fixture.toDF("id", "price", "sz")
    val sky = Skyline.skyline2d(df, "price", "sz")
    sky.collect()
    val p = sky.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") && p.contains("LeftAnti"),
      s"stage-2 exact filter should be a broadcast anti join:\n$p")
    assert(!p.contains("CartesianProduct"), s"skyline went quadratic:\n$p")
  }
}

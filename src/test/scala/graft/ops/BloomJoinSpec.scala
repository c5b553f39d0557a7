package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("semiJoinExact equals the plain semi join even when the filter is saturated with false positives") {
    val probe = spark.range(0, 1000).toDF("k")
    val build = spark.range(0, 1000, 7).toDF("b") // every 7th key
    // deliberately undersized filter (10 expected items for 143 keys,
    // 30% fpp) — false positives guaranteed; the exact join must scrub them
    val got = BloomJoin.semiJoinExact(probe, build, "k", "b",
      expectedItems = 10L, fpp = 0.3)
      .collect().map(_.getLong(0)).toSet
    val want = probe.join(build.withColumnRenamed("b", "k"), Seq("k"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    assert(got == want)
    assert(want == (0L until 1000L by 7).toSet)
  }

  test("semiJoinExact drops null probe keys like a semi join does") {
    val probe = Seq(Some(1L), None, Some(2L)).toDF("k")
    val build = Seq(1L).toDF("b")
    val got = BloomJoin.semiJoinExact(probe, build, "k", "b", expectedItems = 10L)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
  }
}

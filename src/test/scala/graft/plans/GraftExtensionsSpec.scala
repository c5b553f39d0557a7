package graft.plans

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("register exposes native expressions to SQL text") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d")
      .head().getDouble(0)
    assert(dot == 11.0)
    val shingles = spark.sql(
      "SELECT ngram_shingles(split('a b c d', ' '), 3) AS s")
      .head().getSeq[String](0)
    assert(shingles == Seq("a b c", "b c d"))
    // int8 quantized path from pure SQL: pack both vectors, integer dot
    val i8 = spark.sql(
      """SELECT int8_dot(
        |  int8_pack(array(1.0F, -1.0F), CAST(1.0/127 AS DOUBLE)),
        |  int8_pack(array(1.0F,  1.0F), CAST(1.0/127 AS DOUBLE))) AS d"""
        .stripMargin).head().getLong(0)
    assert(i8 == 127L * 127 - 127L * 127 + 0) // 127·127 + (-127)·127 = 0
  }

  test("ngram_shingles rejects a non-literal n") {
    GraftExtensions.register(spark)
    intercept[Exception] {
      spark.sql("SELECT ngram_shingles(split('a b', ' '), 'x')").collect()
    }
  }

  test("extension class applies to a freshly built session") {
    val ext = new GraftExtensions
    // applying the extension function directly exercises the injection path
    val extensions = new org.apache.spark.sql.SparkSessionExtensions
    ext(extensions) // must not throw; functions are injected lazily per session
    succeed
  }
}

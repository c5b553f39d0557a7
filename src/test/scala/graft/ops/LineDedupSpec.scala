package graft.ops

import graft.SparkSpec

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private val tenA = (1 to 10).map(i => s"a$i").mkString(" ")
  private val tenB = (1 to 10).map(i => s"b$i").mkString(" ")

  test("first occurrence wins corpus-wide; docs rebuild in chunk order") {
    val df = Seq(
      (1L, s"$tenA tail one"),   // chunks: tenA, "tail one"
      (2L, s"$tenA $tenB"),      // tenA dropped (doc1 was first), tenB kept
      (3L, s"$tenA tail one")    // byte-identical to doc1 → fully boilerplate
    ).toDF("doc_id", "text")
    val out = TextDedup.lineDedup(df, "doc_id", "text", chunkTokens = 10)
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out == Set(
      (1L, Some(s"$tenA tail one"), 2L, 2L),
      (2L, Some(tenB), 2L, 1L),
      (3L, None, 2L, 0L)))
  }

  test("repeats WITHIN a document dedupe too (second occurrence dropped)") {
    val df = Seq((7L, s"$tenA $tenA")).toDF("doc_id", "text")
    val out = TextDedup.lineDedup(df, "doc_id", "text", chunkTokens = 10)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3))).head
    assert(out == (tenA, 2L, 1L))
  }

  test("short doc (< one chunk) survives untouched") {
    val df = Seq((1L, "only three words")).toDF("doc_id", "text")
    val out = TextDedup.lineDedup(df, "doc_id", "text", chunkTokens = 10)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3))).head
    assert(out == ("only three words", 1L, 1L))
  }

  test("partition-count invariance: same output under repartition") {
    val df = Seq(
      (1L, s"$tenA x y"), (2L, s"$tenA z"), (3L, s"$tenB $tenA")
    ).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      TextDedup.lineDedup(d, "doc_id", "text", chunkTokens = 10)
        .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(run(df.repartition(1)) == run(df.repartition(7)))
  }
}

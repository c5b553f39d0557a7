package graft.ops

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // corpus: N=3, avgdl=2.0, df('a')=2 → idf = ln((3-2+0.5)/(2+0.5)+1) = ln(1.6)
  private def corpus = Seq(
    (1L, "a b"), (2L, "a a c"), (3L, "d")
  ).toDF("doc_id", "text")

  test("hand-computed scores, ranking, and zero-match exclusion (k1=1.5, b=0.75)") {
    val out = TextAnalysis.bm25(corpus, "doc_id", "text", Seq("a"),
        k = 100, k1 = 1.5, b = 0.75)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toList
      .sortBy(_._3)
    // doc2: ln(1.6)·(2·2.5)/(2+1.5·(0.25+0.75·1.5)) = ln(1.6)·5/4.0625
    // doc1: ln(1.6)·(1·2.5)/(1+1.5·(0.25+0.75·1.0)) = ln(1.6)·2.5/2.5
    // doc3 has no match → excluded entirely
    assert(out == List((2L, 0.578466, 1), (1L, 0.470004, 2)))
  }

  test("multi-term scores are the fixed-order sum of per-term scores") {
    val both = TextAnalysis.bm25(corpus, "doc_id", "text", Seq("a", "c"),
        k = 100, k1 = 1.5, b = 0.75)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc2 contains both terms: its score strictly exceeds its 'a'-only score
    assert(both(2L) > 0.578466 && both(1L) == 0.470004)
  }

  test("k caps the result and ranks are dense from 1") {
    val out = TextAnalysis.bm25(corpus, "doc_id", "text", Seq("a"), k = 1,
        k1 = 1.5, b = 0.75)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toList
    assert(out == List((2L, 1)))
  }
}

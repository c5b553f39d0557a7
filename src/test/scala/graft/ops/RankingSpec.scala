package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("rankingMetrics: hand-computed recall/MRR/NDCG, zero-relevant edge") {
    val results = Seq(
      // q1: rel at ranks 1 and 3 of 3
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      // q2: retrieved but nothing is relevant anywhere
      (2L, 20L, 1), (2L, 21L, 2),
      // q3: single relevant item found at rank 2
      (3L, 31L, 1), (3L, 30L, 2),
      // rank past k must be ignored
      (1L, 13L, 4)
    ).toDF("q", "item", "rank")
    val relevant = Seq(
      (1L, 10L), (1L, 12L), (1L, 13L), (1L, 14L),
      (3L, 30L)
    ).toDF("q", "item")
    val got = Ranking.rankingMetrics(results, relevant, "q", "item", "rank", 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    // q1: n_rel=4, m=3, hits=2 → recall 2/3; first rel rank 1 → mrr 1;
    // dcg = 1/log2(2)+1/log2(4) = 1.5, idcg(3) → ndcg 0.703918
    assert(got(1L) == ((4L, 3L, 2L, 0.666667, 1.0, 0.703918)))
    // q2: no relevant → all zeros (not nulls, not NaN)
    assert(got(2L) == ((0L, 2L, 0L, 0.0, 0.0, 0.0)))
    // q3: m=1, hit at rank 2 → recall 1, mrr 0.5, ndcg = 1/log2(3)/1
    assert(got(3L) == ((1L, 2L, 1L, 1.0, 0.5, 0.63093)))
    // rank-4 row contributed nothing (q1 n_retrieved = 3)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval evaluation — the measurement half of the ANN surface: given
  * a ranked result list and a relevance set, per-query Recall@k, MRR@k,
  * and NDCG@k (binary gains). An index (IVF, PQ, IVF-PQ) without its
  * recall numbers is not an index you can tune; these metrics close the
  * loop, computed distributedly over every query at once.
  *
  * Determinism: DCG is a float sum of `rel / log2(rank + 1)` terms —
  * summed in RANK order via an ordered fold over `sort_array ∘
  * collect_list` (the q70/q88 discipline), so any engine replaying the
  * same fold is bit-identical; IDCG folds `sequence(1, m)` the same way.
  * Scale: one shuffle on the query key; per-query state is its own ≤ k
  * result rows.
  */
object Ranking {

  /** Per-query metrics table. `results` carries (queryCol, itemCol,
    * rankCol — 1-based, dense); `relevant` carries (queryCol, itemCol)
    * ground-truth pairs. Rows ranked past `k` are ignored. Output per
    * query: `n_relevant`, `n_retrieved`, `hits`, `recall_at_k` (hits /
    * min(n_relevant, k) — the bounded-ideal convention), `mrr`
    * (1 / first relevant rank, 0 when none), `ndcg_at_k`. Queries with
    * no relevant pairs score 0 across the board. */
  def rankingMetrics(results: DataFrame, relevant: DataFrame,
      queryCol: String, itemCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val res = results.where(col(rankCol) <= k)
      .select(col(queryCol).as("__q"), col(itemCol).as("__i"),
        col(rankCol).cast("long").as("__r"))
    val rel = relevant
      .select(col(queryCol).as("__q"), col(itemCol).as("__i"))
      .distinct()
    val nRel = rel.groupBy("__q").agg(count(lit(1)).as("n_relevant"))
    val perQ = res
      .join(rel.withColumn("__rel", lit(1L)), Seq("__q", "__i"), "left")
      .withColumn("__rel", coalesce(col("__rel"), lit(0L)))
      .groupBy("__q")
      .agg(count(lit(1)).as("n_retrieved"),
        sum(col("__rel")).as("hits"),
        min(when(col("__rel") === 1L, col("__r"))).as("__first_rel"),
        sort_array(collect_list(struct(col("__r"), col("__rel")))).as("__rr"))
    val dcg = aggregate(col("__rr"), lit(0.0),
      (acc, e) => acc + e.getField("__rel").cast("double")
        / log2(e.getField("__r").cast("double") + lit(1.0)))
    val m = least(coalesce(col("n_relevant"), lit(0L)), lit(k.toLong))
    val idcg = aggregate(sequence(lit(1L), m, lit(1L)), lit(0.0),
      (acc, i) => acc + lit(1.0) / log2(i.cast("double") + lit(1.0)))
    perQ.join(nRel, Seq("__q"), "left")
      .select(col("__q").as(queryCol),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        col("n_retrieved"), col("hits"),
        round(when(m > 0, col("hits").cast("double") / m)
          .otherwise(lit(0.0)), 6).as("recall_at_k"),
        round(coalesce(lit(1.0) / col("__first_rel"), lit(0.0)), 6)
          .as("mrr"),
        round(when(m > 0, dcg / idcg).otherwise(lit(0.0)), 6)
          .as("ndcg_at_k"))
  }
}

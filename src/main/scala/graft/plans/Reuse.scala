package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}

/** Workload-level computation-reuse analysis (the SparkCruise idea —
  * Roy et al., "SparkCruise: Workload Optimization in Managed Spark
  * Clusters at Microsoft", VLDB 2021): across a WORKLOAD of queries,
  * find the logical subtrees that recur — the candidates worth
  * materializing once and scanning many times. Detection half here;
  * the serving half is [[MvRewriteRule]] (answer matching aggregates
  * from materialized partials) and `ops.Incremental` (keep the
  * materialization fresh in O(delta)).
  *
  * Subtrees are keyed by their CANONICALIZED form (Catalyst's
  * `LogicalPlan.canonicalized`: expression ids normalized, literals and
  * ordering retained), so the same filter+join written in two queries —
  * or twice within one — collapses onto one fingerprint regardless of
  * alias naming. Driver-side metadata walk: nothing executes, cost is
  * plan size, not data size.
  */
object Reuse {

  /** One reuse candidate: how many distinct queries contain the subtree,
    * total occurrences, operator count (bigger = more compute saved),
    * and a rendering of one instance. */
  final case class Candidate(fingerprint: String, nQueries: Int,
      nOccurrences: Int, nOps: Int, sample: String)

  private def subtrees(p: LogicalPlan): Seq[LogicalPlan] =
    p.collect { case n => n }

  private def opCount(p: LogicalPlan): Int = p.collect { case n => n }.size

  /** Rank repeated subtrees across `queries`. Only subtrees with at
    * least `minOps` operators count (a bare table scan repeats
    * everywhere and materializing it buys nothing); candidates must
    * appear in ≥ 2 places. Ordered by (queries containing it,
    * operator count) descending — the SparkCruise utility ordering:
    * shared-by-most first, biggest-compute first as tiebreak. */
  def commonSubplans(queries: Seq[DataFrame], minOps: Int = 2,
      topK: Int = 20): Seq[Candidate] = {
    require(minOps >= 1 && topK >= 1)
    val perQuery = queries.map { q =>
      subtrees(q.queryExecution.analyzed)
        .filter(t => opCount(t) >= minOps && t.collect { case l: LeafNode => l }.nonEmpty)
        .map(t => (t.canonicalized.toString, t))
    }
    val all = perQuery.flatten
    val byFp = all.groupBy(_._1)
    val queriesPerFp = perQuery.zipWithIndex
      .flatMap { case (ts, qi) => ts.map(t => (t._1, qi)) }
      .groupBy(_._1).map { case (fp, xs) => fp -> xs.map(_._2).distinct.size }
    byFp.toSeq
      .map { case (fp, occ) =>
        Candidate(
          fingerprint = java.util.UUID
            .nameUUIDFromBytes(fp.getBytes("UTF-8")).toString.take(8),
          nQueries = queriesPerFp(fp),
          nOccurrences = occ.size,
          nOps = opCount(occ.head._2),
          sample = occ.head._2.toString)
      }
      .filter(c => c.nOccurrences >= 2)
      .sortBy(c => (-c.nQueries, -c.nOps, c.fingerprint))
      .take(topK)
  }
}

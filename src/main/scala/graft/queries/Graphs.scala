package graft.queries

import graft.core.Tables.table
import graft.ops.Graph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the warehouse's relational entities. The customer↔
  * supplier bipartite graph (who transacts with whom, via orders⋈lineitem)
  * stands in for the reference's actor↔repo event graph — same shape, and
  * the synthetic tables make it oracle-checkable. All ranks are exact
  * integers (see [[graft.ops.Graph]]) so DuckDB replays them bit-for-bit.
  */
object Graphs {

  /** Distinct customer↔supplier edges, symmetrized. Node ids are disjoint
    * by parity: customer c → 2c, supplier s → 2s+1. */
  private def tradePairs(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .join(table(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"),
        (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()

  private def tradeEdges(spark: SparkSession, dir: String): DataFrame = {
    val pairs = tradePairs(spark, dir)
    pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionByName(pairs.select(col("s").as("src"), col("c").as("dst")))
  }

  /** PageRank (3 rounds, damping 0.85) over the trade graph: which
    * customers/suppliers sit at the center of the transaction network.
    * Quantized nano-rank units — deterministic on any engine. */
  def q87PageRank(spark: SparkSession, dir: String): DataFrame =
    Graph.pageRank(tradeEdges(spark, dir), iters = 3)
      .select(col("node"), col("rank_nano"))

  /** Sorted distinct parts per order — the basket. Pair generation happens
    * map-side from the basket array (triangular `transform` over the
    * array: one shuffle total), never via the lineitem⋈lineitem self-join
    * the oracle uses for clarity — that spelling shuffles the fact table
    * twice and explodes skew on popular parts. Basket size is bounded
    * (parts per order), so the fanout is quadratic only in that small
    * bound. */
  private def baskets(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("parts"))

  private val pairsFromBasket =
    expr("""flatten(transform(parts, (x, i) ->
           |  transform(slice(parts, i + 2, size(parts)), y ->
           |    struct(x AS part_a, y AS part_b))))""".stripMargin)

  /** Co-purchase mining: the 100 part pairs most often bought in the same
    * order (market-basket co-occurrence — the affinity-graph edge
    * builder). Deterministic tiebreak on the pair itself. */
  def q90CoPurchase(spark: SparkSession, dir: String): DataFrame =
    baskets(spark, dir)
      .select(explode(pairsFromBasket).as("p"))
      .groupBy(col("p.part_a").as("part_a"), col("p.part_b").as("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(100)

  /** Item-item cosine similarity over the co-purchase graph:
    * sim(a,b) = co(a,b) / √(n_a·n_b) with n_x = orders containing x.
    * All inputs are exact integers; the one float op per pair (√ then
    * divide) is IEEE-identical on any engine, so the oracle hash-matches
    * without order pinning. Support floor co ≥ 2 keeps the pair set to
    * genuinely co-bought items (and bounds the output). */
  def q91ItemSim(spark: SparkSession, dir: String): DataFrame = {
    // baskets feed both the pair explode and the per-part counts, but all
    // consumers land in ONE action — ReusedExchange dedups the shared
    // lineitem groupBy inside the job, so no persist (measured: a persist
    // + checkpoint here only added a materialization)
    val b = baskets(spark, dir)
    val co = b.select(explode(pairsFromBasket).as("p"))
      .groupBy(col("p.part_a").as("part_a"), col("p.part_b").as("part_b"))
      .agg(count(lit(1)).as("co"))
      .where(col("co") >= 2)
    val n = b.select(explode(col("parts")).as("part"))
      .groupBy(col("part")).agg(count(lit(1)).as("n"))
    co.join(n.select(col("part"), col("n").as("n_a")),
        col("part_a") === col("part")).drop("part")
      .join(n.select(col("part"), col("n").as("n_b")),
        col("part_b") === col("part")).drop("part")
      .select(col("part_a"), col("part_b"), col("co"),
        round(col("co") / sqrt((col("n_a") * col("n_b")).cast("double")), 6)
          .as("cosine"))
  }

  /** Triangle count over the co-purchase graph (edges = part pairs
    * co-bought in ≥2 orders): the affinity graph's clustering signal.
    * Edges are canonical by construction (basket arrays are sorted, so
    * part_a < part_b). */
  def q92Triangles(spark: SparkSession, dir: String): DataFrame =
    Graph.triangleCount(
      affinityEdges(spark, dir).select(col("src"), col("dst")))

  /** Multi-source BFS hop distances from the lowest-id node over the
    * trade graph (6-hop horizon). The source set is a 1-row aggregate
    * DataFrame — nothing collects to the driver. */
  def q96Bfs(spark: SparkSession, dir: String): DataFrame = {
    // persist: the source-seed aggregate and the op's own edge persist
    // otherwise each replay the orders⋈lineitem+distinct build (guide
    // §2.4; the q187 lesson applied to the whole iterative family).
    // Safe to unpersist on return — shortestPaths localCheckpoints the
    // distance table every round, so the result never re-reads edges.
    val edges = tradeEdges(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sources = edges.agg(min(col("src")).as("node"))
    val out = Graph.shortestPaths(edges, sources, maxHops = 6)
    edges.unpersist()
    out
  }

  /** Co-purchase affinity edges (co-bought in ≥2 orders), canonical
    * part_a < part_b by construction — shared by q92/q132/q133. */
  private def affinityEdgesFrom(b: DataFrame): DataFrame =
    b.select(explode(pairsFromBasket).as("p"))
      .groupBy(col("p.part_a").as("src"), col("p.part_b").as("dst"))
      .agg(count(lit(1)).as("co"))
      .where(col("co") >= 2)

  private def affinityEdges(spark: SparkSession, dir: String): DataFrame =
    affinityEdgesFrom(baskets(spark, dir))

  /** Local clustering coefficient per part over the co-purchase graph:
    * which products sit in tightly-knit "bought-together" communities vs
    * hub products bridging unrelated baskets. [[Graph.localClustering]]. */
  def q132ClusteringCoef(spark: SparkSession, dir: String): DataFrame =
    Graph.localClustering(affinityEdges(spark, dir).select(col("src"),
      col("dst")))

  /** Association rules from the co-purchase graph: both directions of
    * every supported pair with confidence co/n(antecedent) and lift
    * co·N/(n_a·n_c) over N baskets — top 100 by lift (deterministic
    * part-key tiebreak). All inputs exact integers; one float division
    * per measure, so DuckDB replays the ordering bit-for-bit. */
  def q133AssocRules(spark: SparkSession, dir: String): DataFrame = {
    // baskets feed three consumers, all inside ONE action — the shared
    // groupBy exchange is deduped by ReusedExchange, so no persist
    val b = baskets(spark, dir)
    val nb = b.agg(count(lit(1)).as("nb"))
    val co = affinityEdgesFrom(b)
    val n = b.select(explode(col("parts")).as("part"))
      .groupBy(col("part")).agg(count(lit(1)).as("n"))
    val rules = co.select(col("src").as("ante"), col("dst").as("cons"),
        col("co"))
      .unionByName(co.select(col("dst").as("ante"), col("src").as("cons"),
        col("co")))
    rules
      .join(n.select(col("part"), col("n").as("n_ante")),
        col("ante") === col("part")).drop("part")
      .join(n.select(col("part"), col("n").as("n_cons")),
        col("cons") === col("part")).drop("part")
      .crossJoin(broadcast(nb))
      .select(col("ante"), col("cons"), col("co"),
        round(col("co") / col("n_ante").cast("double"), 6).as("confidence"),
        round(col("co") * col("nb") /
          (col("n_ante") * col("n_cons")).cast("double"), 6).as("lift"))
      .orderBy(col("lift").desc, col("ante"), col("cons"))
      .limit(100)
  }

  /** Label-propagation communities over the trade graph (3 synchronous
    * rounds, self-vote, min-label tie-break): which customers and
    * suppliers cluster into one trading community. Exact integer state —
    * DuckDB replays the unrolled rounds bit-for-bit. */
  def q183LabelProp(spark: SparkSession, dir: String): DataFrame =
    Graph.labelPropagation(tradeEdges(spark, dir), iters = 3)

  /** Personalized PageRank from the lowest-id node over the trade graph:
    * "importance as seen from this seed" — the related-entity ranker.
    * Teleport mass returns only to the seed; quantized nano-rank units
    * ([[graft.ops.Graph.personalizedPageRank]]). */
  def q184Ppr(spark: SparkSession, dir: String): DataFrame = {
    // persist for the caller-side seed aggregate (the op persists its own
    // selection, which then reads this cache instead of rebuilding)
    val edges = tradeEdges(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seed = edges.agg(min(col("src")).as("node"))
    val out = Graph.personalizedPageRank(edges, seed, iters = 3)
    edges.unpersist()
    out
  }

  /** Modularity of the q183 label-propagation communities over the trade
    * graph — the detector's quality score ([[graft.ops.Graph.modularity]]).
    * Exact integer numerators, one float division. */
  def q187Modularity(spark: SparkSession, dir: String): DataFrame = {
    // one shared materialization: the edge list feeds both the LPA rounds
    // and the modularity join — without it the orders⋈lineitem distinct
    // rebuilds once per consumer
    val edges = tradeEdges(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = Graph.modularity(edges, Graph.labelPropagation(edges, iters = 3))
    edges.unpersist() // modularity localCheckpoints its 1-row result
    out
  }

  /** HITS hubs & authorities over the DIRECTED buyer→seller graph: big
    * buyers (hubs) vs widely-bought-from sellers (authorities) — the two
    * roles q87's single symmetric score conflates.
    * [[graft.ops.Graph.hits]], 2 rounds, integral max-renormalization. */
  def q188Hits(spark: SparkSession, dir: String): DataFrame = {
    val pairs = tradePairs(spark, dir)
    Graph.hits(pairs.select(col("c").as("src"), col("s").as("dst")),
      iters = 2)
  }

  /** Degree assortativity of the trade graph — do high-degree customers
    * trade with high-degree suppliers? (Bipartite commerce is typically
    * disassortative.) [[graft.ops.Graph.degreeAssortativity]]. */
  def q189Assortativity(spark: SparkSession, dir: String): DataFrame =
    Graph.degreeAssortativity(tradeEdges(spark, dir))

  /** Weighted shortest "trust distance" from the lowest-id node: edge
    * cost 1 + 1e6 div (co-trade line count) — strong trading ties are
    * cheap — relaxed 4 Bellman-Ford rounds
    * ([[graft.ops.Graph.weightedShortestPaths]]). */
  def q197WeightedPaths(spark: SparkSession, dir: String): DataFrame = {
    val weighted = table(spark, dir, "orders")
      .join(table(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy((col("o_custkey") * 2).as("c"),
        (col("l_suppkey") * 2 + 1).as("s"))
      .agg(count(lit(1)).as("n"))
      .select(col("c"), col("s"),
        (lit(1L) + expr("1000000L div n")).as("w"))
    val edges = weighted.select(col("c").as("src"), col("s").as("dst"),
        col("w"))
      .unionByName(weighted.select(col("s").as("src"), col("c").as("dst"),
        col("w")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seed = edges.agg(min(col("src")).as("node"))
    val out = Graph.weightedShortestPaths(edges, seed, iters = 4)
    edges.unpersist()
    out
  }

  /** One-row graph card for the trade graph: node/edge counts, density
    * in 1e-9 units (exact integral division), degree extremes/mean, and
    * the co-purchase triangle count — the observability summary printed
    * before anyone runs an expensive iterative algorithm. Three tiny
    * aggregates crossJoined; exact integers throughout. */
  def q204GraphCard(spark: SparkSession, dir: String): DataFrame = {
    val edges = tradeEdges(spark, dir)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val degStats = deg.agg(count(lit(1)).as("n_nodes"),
      sum(col("d")).as("__m2"), max(col("d")).as("max_degree"),
      min(col("d")).as("min_degree"))
    val tri = Graph.triangleCount(
      affinityEdges(spark, dir).select(col("src"), col("dst")))
    degStats.crossJoin(tri)
      .select(col("n_nodes"), (col("__m2") / 2).cast("long").as("n_edges"),
        // density·1e9 = 2m·1e9 div (n·(n−1)) — integral, engine-exact
        expr("(__m2 * 1000000000L) div (n_nodes * (n_nodes - 1))")
          .as("density_nano"),
        col("min_degree"), col("max_degree"),
        expr("__m2 div n_nodes").as("mean_degree"),
        col("n_triangles").as("copurchase_triangles"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q188_hits" -> q188Hits,
    "q189_assortativity" -> q189Assortativity,
    "q197_weighted_paths" -> q197WeightedPaths,
    "q204_graph_card" -> q204GraphCard,
    "q87_pagerank" -> q87PageRank,
    "q90_copurchase" -> q90CoPurchase,
    "q91_item_sim" -> q91ItemSim,
    "q92_triangles" -> q92Triangles,
    "q96_bfs" -> q96Bfs,
    "q132_clustering_coef" -> q132ClusteringCoef,
    "q133_assoc_rules" -> q133AssocRules,
    "q183_label_prop" -> q183LabelProp,
    "q184_ppr" -> q184Ppr,
    "q187_modularity" -> q187Modularity
  )

  /** Shared q183/q187 replay: three synchronous LPA rounds unrolled; each
    * round = neighbor votes (+ one self vote) → per-node argmax with
    * (count DESC, label ASC) tie-break — all integers, exact. */
  private val lpaCtes =
    """pairs AS (
      |  SELECT DISTINCT o_custkey*2 AS c, l_suppkey*2+1 AS s
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |edges AS (SELECT c AS src, s AS dst FROM pairs
      |          UNION ALL SELECT s, c FROM pairs),
      |l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
      |v1 AS (SELECT node, label, count(*) AS c FROM (
      |         SELECT e.dst AS node, l.label FROM edges e
      |         JOIN l0 l ON e.src = l.node
      |         UNION ALL SELECT node, label FROM l0) t GROUP BY 1, 2),
      |l1 AS (SELECT node, label FROM (
      |         SELECT node, label, row_number() OVER (
      |           PARTITION BY node ORDER BY c DESC, label) AS rn
      |         FROM v1) t WHERE rn = 1),
      |v2 AS (SELECT node, label, count(*) AS c FROM (
      |         SELECT e.dst AS node, l.label FROM edges e
      |         JOIN l1 l ON e.src = l.node
      |         UNION ALL SELECT node, label FROM l1) t GROUP BY 1, 2),
      |l2 AS (SELECT node, label FROM (
      |         SELECT node, label, row_number() OVER (
      |           PARTITION BY node ORDER BY c DESC, label) AS rn
      |         FROM v2) t WHERE rn = 1),
      |v3 AS (SELECT node, label, count(*) AS c FROM (
      |         SELECT e.dst AS node, l.label FROM edges e
      |         JOIN l2 l ON e.src = l.node
      |         UNION ALL SELECT node, label FROM l2) t GROUP BY 1, 2),
      |l3 AS (SELECT node, label FROM (
      |         SELECT node, label, row_number() OVER (
      |           PARTITION BY node ORDER BY c DESC, label) AS rn
      |         FROM v3) t WHERE rn = 1)""".stripMargin

  // Fixed-iteration PageRank unrolled as CTEs; `//` (DuckDB integral
  // floor-div) ≡ Spark `div` for the all-positive operands here, and
  // integer sums are order-independent, so the replay is exact.
  val oracles: Map[String, String] = Map(
    "q87_pagerank" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey*2 AS c, l_suppkey*2+1 AS s
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (SELECT c AS src, s AS dst FROM pairs
        |          UNION ALL SELECT s, c FROM pairs),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
        |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes),
        |c1 AS (SELECT e.dst AS node, sum((85*r.r)//(100*d.outdeg)) AS s
        |       FROM edges e JOIN r0 r ON e.src = r.node
        |       JOIN deg d ON e.src = d.src GROUP BY e.dst),
        |r1 AS (SELECT n.node, 150000000 + coalesce(c.s, 0) AS r
        |       FROM nodes n LEFT JOIN c1 c ON n.node = c.node),
        |c2 AS (SELECT e.dst AS node, sum((85*r.r)//(100*d.outdeg)) AS s
        |       FROM edges e JOIN r1 r ON e.src = r.node
        |       JOIN deg d ON e.src = d.src GROUP BY e.dst),
        |r2 AS (SELECT n.node, 150000000 + coalesce(c.s, 0) AS r
        |       FROM nodes n LEFT JOIN c2 c ON n.node = c.node),
        |c3 AS (SELECT e.dst AS node, sum((85*r.r)//(100*d.outdeg)) AS s
        |       FROM edges e JOIN r2 r ON e.src = r.node
        |       JOIN deg d ON e.src = d.src GROUP BY e.dst),
        |r3 AS (SELECT n.node, 150000000 + coalesce(c.s, 0) AS r
        |       FROM nodes n LEFT JOIN c3 c ON n.node = c.node)
        |SELECT CAST(node AS BIGINT) AS node,
        |       CAST(r AS BIGINT) AS rank_nano FROM r3""".stripMargin,
    // the self-join spelling IS the semantics; the engine's plan builds
    // pairs map-side from per-order basket arrays instead (one shuffle)
    "q90_copurchase" ->
      """WITH bp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |co AS (SELECT a.l_partkey part_a, b.l_partkey part_b,
        |         count(*) n_orders
        |       FROM bp a JOIN bp b ON a.l_orderkey = b.l_orderkey
        |         AND a.l_partkey < b.l_partkey
        |       GROUP BY 1, 2)
        |SELECT part_a, part_b, n_orders FROM co
        |ORDER BY n_orders DESC, part_a, part_b LIMIT 100""".stripMargin,
    "q91_item_sim" ->
      """WITH bp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |co AS (SELECT a.l_partkey part_a, b.l_partkey part_b,
        |         count(*) AS co
        |       FROM bp a JOIN bp b ON a.l_orderkey = b.l_orderkey
        |         AND a.l_partkey < b.l_partkey
        |       GROUP BY 1, 2 HAVING count(*) >= 2),
        |n AS (SELECT l_partkey part, count(*) n FROM bp GROUP BY 1)
        |SELECT co.part_a, co.part_b, co.co,
        |  round(co.co / sqrt(CAST(na.n * nb.n AS DOUBLE)), 6) AS cosine
        |FROM co JOIN n na ON co.part_a = na.part
        |JOIN n nb ON co.part_b = nb.part""".stripMargin,
    "q92_triangles" ->
      """WITH bp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT a.l_partkey src, b.l_partkey dst
        |      FROM bp a JOIN bp b ON a.l_orderkey = b.l_orderkey
        |        AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT count(*) AS n_triangles
        |FROM e e1 JOIN e e2 ON e1.dst = e2.src
        |JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst""".stripMargin,
    // bounded recursive walk; UNION (distinct) over ≤ maxHops+1 distinct
    // dists per node terminates; min(dist) = BFS distance
    "q96_bfs" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT DISTINCT o_custkey*2 AS c, l_suppkey*2+1 AS s
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (SELECT c AS src, s AS dst FROM pairs
        |          UNION ALL SELECT s, c FROM pairs),
        |walk(node, dist) AS (
        |  SELECT min(src), 0 FROM edges
        |  UNION
        |  SELECT e.dst, w.dist + 1 FROM walk w
        |  JOIN edges e ON w.node = e.src WHERE w.dist < 6)
        |SELECT CAST(node AS BIGINT) AS node, min(dist) AS dist
        |FROM walk GROUP BY node""".stripMargin,
    "q132_clustering_coef" ->
      """WITH bp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT a.l_partkey src, b.l_partkey dst
        |      FROM bp a JOIN bp b ON a.l_orderkey = b.l_orderkey
        |        AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (SELECT node, count(*)::BIGINT degree FROM (
        |        SELECT src node FROM e UNION ALL SELECT dst FROM e)
        |      GROUP BY 1),
        |tn AS (SELECT unnest([e1.src, e1.dst, e2.dst]) node
        |      FROM e e1 JOIN e e2 ON e1.dst = e2.src
        |      JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
        |tri AS (SELECT node, count(*)::BIGINT n_tri FROM tn GROUP BY 1)
        |SELECT d.node, d.degree, coalesce(t.n_tri, 0)::BIGINT AS n_tri,
        |  CASE WHEN d.degree < 2 THEN 0.0
        |       ELSE round(coalesce(t.n_tri, 0) * 2 /
        |         CAST(d.degree * (d.degree - 1) AS DOUBLE), 6) END AS coef
        |FROM deg d LEFT JOIN tri t ON d.node = t.node""".stripMargin,
    "q133_assoc_rules" ->
      """WITH bp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |nb AS (SELECT count(DISTINCT l_orderkey)::BIGINT nb FROM lineitem),
        |co AS (SELECT a.l_partkey part_a, b.l_partkey part_b,
        |         count(*)::BIGINT co
        |       FROM bp a JOIN bp b ON a.l_orderkey = b.l_orderkey
        |         AND a.l_partkey < b.l_partkey
        |       GROUP BY 1, 2 HAVING count(*) >= 2),
        |n AS (SELECT l_partkey part, count(*)::BIGINT n FROM bp GROUP BY 1),
        |r AS (SELECT part_a ante, part_b cons, co FROM co
        |      UNION ALL SELECT part_b, part_a, co FROM co)
        |SELECT r.ante, r.cons, r.co,
        |  round(r.co / na.n::DOUBLE, 6) AS confidence,
        |  round(r.co * nb.nb / CAST(na.n * nc.n AS DOUBLE), 6) AS lift
        |FROM r JOIN n na ON r.ante = na.part
        |JOIN n nc ON r.cons = nc.part CROSS JOIN nb
        |ORDER BY lift DESC, ante, cons LIMIT 100""".stripMargin,
    "q183_label_prop" ->
      s"""WITH $lpaCtes
         |SELECT CAST(node AS BIGINT) AS node,
         |       CAST(label AS BIGINT) AS label FROM l3""".stripMargin,
    "q204_graph_card" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey*2 AS c, l_suppkey*2+1 AS s
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (SELECT c AS src, s AS dst FROM pairs
        |          UNION ALL SELECT s, c FROM pairs),
        |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
        |ds AS (SELECT count(*) AS n_nodes, sum(d) AS m2,
        |         max(d) AS max_degree, min(d) AS min_degree FROM deg),
        |bp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT a.l_partkey src, b.l_partkey dst
        |      FROM bp a JOIN bp b ON a.l_orderkey = b.l_orderkey
        |        AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |tri AS (SELECT count(*) AS n_triangles
        |        FROM e e1 JOIN e e2 ON e1.dst = e2.src
        |        JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst)
        |SELECT ds.n_nodes, CAST(ds.m2 // 2 AS BIGINT) AS n_edges,
        |  CAST((ds.m2 * 1000000000) // (ds.n_nodes * (ds.n_nodes - 1))
        |    AS BIGINT) AS density_nano,
        |  ds.min_degree, ds.max_degree,
        |  CAST(ds.m2 // ds.n_nodes AS BIGINT) AS mean_degree,
        |  tri.n_triangles AS copurchase_triangles
        |FROM ds CROSS JOIN tri""".stripMargin,
    // 4 Bellman-Ford relax rounds unrolled; all-integer min-plus algebra
    "q197_weighted_paths" ->
      """WITH wp AS (
        |  SELECT o_custkey*2 AS c, l_suppkey*2+1 AS s,
        |         1 + 1000000 // count(*) AS w
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2),
        |e AS (SELECT c AS src, s AS dst, w FROM wp
        |      UNION ALL SELECT s, c, w FROM wp),
        |d0 AS (SELECT min(src) AS node, CAST(0 AS BIGINT) AS dist FROM e),
        |d1 AS (SELECT node, min(cand) AS dist FROM (
        |         SELECT e.dst AS node, d.dist + e.w AS cand
        |         FROM e JOIN d0 d ON e.src = d.node
        |         UNION ALL SELECT node, dist FROM d0) t GROUP BY 1),
        |d2 AS (SELECT node, min(cand) AS dist FROM (
        |         SELECT e.dst AS node, d.dist + e.w AS cand
        |         FROM e JOIN d1 d ON e.src = d.node
        |         UNION ALL SELECT node, dist FROM d1) t GROUP BY 1),
        |d3 AS (SELECT node, min(cand) AS dist FROM (
        |         SELECT e.dst AS node, d.dist + e.w AS cand
        |         FROM e JOIN d2 d ON e.src = d.node
        |         UNION ALL SELECT node, dist FROM d2) t GROUP BY 1),
        |d4 AS (SELECT node, min(cand) AS dist FROM (
        |         SELECT e.dst AS node, d.dist + e.w AS cand
        |         FROM e JOIN d3 d ON e.src = d.node
        |         UNION ALL SELECT node, dist FROM d3) t GROUP BY 1)
        |SELECT CAST(node AS BIGINT) AS node, CAST(dist AS BIGINT) AS dist
        |FROM d4""".stripMargin,
    // two HITS rounds unrolled; renormalization is `(s·1e6)//max` per
    // half-round — non-negative operands, so `//` ≡ Spark `div`
    "q188_hits" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey*2 AS c, l_suppkey*2+1 AS s
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT c AS src, s AS dst FROM pairs),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS h FROM nodes),
        |a1r AS (SELECT e.dst AS node, sum(h.h) AS a FROM e
        |        JOIN h0 h ON e.src = h.node GROUP BY 1),
        |a1m AS (SELECT max(a) AS m FROM a1r),
        |a1 AS (SELECT n.node, CASE WHEN m.m IS NULL OR m.m = 0 THEN 0
        |         ELSE (coalesce(r.a, 0) * 1000000) // m.m END AS a
        |       FROM nodes n LEFT JOIN a1r r ON n.node = r.node
        |       CROSS JOIN a1m m),
        |h1r AS (SELECT e.src AS node, sum(a.a) AS h FROM e
        |        JOIN a1 a ON e.dst = a.node GROUP BY 1),
        |h1m AS (SELECT max(h) AS m FROM h1r),
        |h1 AS (SELECT n.node, CASE WHEN m.m IS NULL OR m.m = 0 THEN 0
        |         ELSE (coalesce(r.h, 0) * 1000000) // m.m END AS h
        |       FROM nodes n LEFT JOIN h1r r ON n.node = r.node
        |       CROSS JOIN h1m m),
        |a2r AS (SELECT e.dst AS node, sum(h.h) AS a FROM e
        |        JOIN h1 h ON e.src = h.node GROUP BY 1),
        |a2m AS (SELECT max(a) AS m FROM a2r),
        |a2 AS (SELECT n.node, CASE WHEN m.m IS NULL OR m.m = 0 THEN 0
        |         ELSE (coalesce(r.a, 0) * 1000000) // m.m END AS a
        |       FROM nodes n LEFT JOIN a2r r ON n.node = r.node
        |       CROSS JOIN a2m m),
        |h2r AS (SELECT e.src AS node, sum(a.a) AS h FROM e
        |        JOIN a2 a ON e.dst = a.node GROUP BY 1),
        |h2m AS (SELECT max(h) AS m FROM h2r),
        |h2 AS (SELECT n.node, CASE WHEN m.m IS NULL OR m.m = 0 THEN 0
        |         ELSE (coalesce(r.h, 0) * 1000000) // m.m END AS h
        |       FROM nodes n LEFT JOIN h2r r ON n.node = r.node
        |       CROSS JOIN h2m m)
        |SELECT CAST(h2.node AS BIGINT) AS node,
        |       CAST(h2.h AS BIGINT) AS hub_1e6,
        |       CAST(a2.a AS BIGINT) AS auth_1e6
        |FROM h2 JOIN a2 ON h2.node = a2.node""".stripMargin,
    // exact integer moments; the closed-form Pearson is one fixed IEEE
    // expression (int64 headroom holds through bench scales)
    "q189_assortativity" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey*2 AS c, l_suppkey*2+1 AS s
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (SELECT c AS src, s AS dst FROM pairs
        |          UNION ALL SELECT s, c FROM pairs),
        |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
        |dec AS (SELECT dx.d AS x, dy.d AS y FROM edges e
        |        JOIN deg dx ON e.src = dx.src
        |        JOIN deg dy ON e.dst = dy.src),
        |mo AS (SELECT count(*) AS m, sum(x) AS sx, sum(y) AS sy,
        |         sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
        |       FROM dec)
        |SELECT CAST(m // 2 AS BIGINT) AS m_edges,
        |  CASE WHEN CAST(m*sxx - sx*sx AS DOUBLE) *
        |            CAST(m*syy - sy*sy AS DOUBLE) = 0 THEN 0.0
        |       ELSE round(CAST(m*sxy - sx*sy AS DOUBLE) /
        |         sqrt(CAST(m*sxx - sx*sx AS DOUBLE) *
        |              CAST(m*syy - sy*sy AS DOUBLE)), 6)
        |  END AS assortativity
        |FROM mo""".stripMargin,
    // Q = (intra·2m − Σd_c²) / (2m)² — integer numerators, one division
    "q187_modularity" ->
      s"""WITH $lpaCtes,
         |el AS (SELECT la.label AS ls, lb.label AS ld
         |       FROM edges e JOIN l3 la ON e.src = la.node
         |       JOIN l3 lb ON e.dst = lb.node),
         |st AS (SELECT count(*) AS m2,
         |         sum(CASE WHEN ls = ld THEN 1 ELSE 0 END) AS intra
         |       FROM el),
         |dc AS (SELECT ls, count(*) AS dc FROM el GROUP BY ls),
         |sq AS (SELECT count(*) AS n_communities, sum(dc*dc) AS sq FROM dc)
         |SELECT sq.n_communities,
         |  CAST(st.m2 // 2 AS BIGINT) AS m_edges,
         |  round(CAST(st.intra * st.m2 - sq.sq AS DOUBLE) /
         |    (CAST(st.m2 AS DOUBLE) * CAST(st.m2 AS DOUBLE)), 6)
         |    AS modularity
         |FROM st CROSS JOIN sq""".stripMargin,
    // personalized PageRank: same unrolled integral rounds as q87, but the
    // restart mass goes only to the single seed (lowest node id); zero-rank
    // nodes contribute 0 via `//`, so no r>0 filter is needed mid-round
    "q184_ppr" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey*2 AS c, l_suppkey*2+1 AS s
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (SELECT c AS src, s AS dst FROM pairs
        |          UNION ALL SELECT s, c FROM pairs),
        |seed AS (SELECT min(src) AS node FROM edges),
        |nodes AS (SELECT DISTINCT src AS node,
        |            CASE WHEN src = (SELECT node FROM seed)
        |                 THEN 1 ELSE 0 END AS is_seed FROM edges),
        |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
        |r0 AS (SELECT node, CAST(is_seed AS BIGINT)*1000000000 AS r
        |       FROM nodes),
        |c1 AS (SELECT e.dst AS node, sum((85*r.r)//(100*d.outdeg)) AS s
        |       FROM edges e JOIN r0 r ON e.src = r.node
        |       JOIN deg d ON e.src = d.src GROUP BY e.dst),
        |r1 AS (SELECT n.node, n.is_seed*150000000 + coalesce(c.s, 0) AS r
        |       FROM nodes n LEFT JOIN c1 c ON n.node = c.node),
        |c2 AS (SELECT e.dst AS node, sum((85*r.r)//(100*d.outdeg)) AS s
        |       FROM edges e JOIN r1 r ON e.src = r.node
        |       JOIN deg d ON e.src = d.src GROUP BY e.dst),
        |r2 AS (SELECT n.node, n.is_seed*150000000 + coalesce(c.s, 0) AS r
        |       FROM nodes n LEFT JOIN c2 c ON n.node = c.node),
        |c3 AS (SELECT e.dst AS node, sum((85*r.r)//(100*d.outdeg)) AS s
        |       FROM edges e JOIN r2 r ON e.src = r.node
        |       JOIN deg d ON e.src = d.src GROUP BY e.dst),
        |r3 AS (SELECT n.node, n.is_seed*150000000 + coalesce(c.s, 0) AS r
        |       FROM nodes n LEFT JOIN c3 c ON n.node = c.node)
        |SELECT CAST(node AS BIGINT) AS node, CAST(r AS BIGINT) AS rank_nano
        |FROM r3 WHERE r > 0""".stripMargin
  )
}

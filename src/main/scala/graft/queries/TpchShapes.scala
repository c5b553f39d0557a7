package graft.queries

import graft.core.Tables.table
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The remaining TPC-H query shapes (Q1, Q5, Q9, Q12, Q13, Q15, Q16),
  * completing the 22-shape surface started in [[Analytics]]
  * (Q2/Q17/Q22 → q235-q237, Q4/Q11/Q7 → q238-q240, Q3/Q6/Q14 →
  * q241-q243, Q10/Q18/Q19 → q246-q248, Q20 → q226, Q8 → q221,
  * Q21 → q222) — plus alternate FORMULATIONS of Q8 and Q21 (q256,
  * q262) that exercise plan paths their q221/q222 twins don't: q256
  * joins the nation dimension twice under aliases (the spec SQL's
  * literal join graph — Catalyst must broadcast the same relation in
  * two roles) where q221 pre-collapses each chain; q262 rewrites
  * Q21's double-correlated EXISTS as an aggregate cascade where q222
  * feeds Catalyst the correlated subqueries to decorrelate. These are
  * the canonical plan shapes a warehouse engine is judged on: the
  * reference's U-SQL jobs exercise the same algebra (multi-dim joins,
  * conditional aggregates, double-grouping, correlated top-1) against
  * its curated tables (`ProcessDaily.usql` report regions), so each
  * shape here is the engine-surface generalization of a reference
  * pattern.
  *
  * Corpus adaptations (this corpus has no partsupp table and no
  * commit/receipt dates or shipmodes on lineitem) are noted per query;
  * the PLAN shape — what joins, what broadcasts, where the one shuffle
  * lands — is the faithful part.
  *
  * Oracle discipline follows q72: money as per-row integer cents
  * before any sum, outer sums CAST to BIGINT (DuckDB HUGEINT trap),
  * float only in closing one-expression formulas over exact integer
  * sums, deterministic total orders on every top-k.
  */
object TpchShapes {

  /** Integer revenue cents — the shared exact-money expression. */
  private def revCents: Column =
    round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
      .cast("long")

  /** TPC-H Q1 — pricing summary report: the full fixed-grain scan
    * aggregate (2 group keys × 10 measures) over ~all of lineitem.
    * Scale shape: ONE pass, map-side partial aggregation collapses
    * each task to ≤|flag×status| (= 6) rows before the exchange, so
    * the shuffle moves kilobytes at any corpus size — the canonical
    * "aggregate before you move" probe. Charge = price·(1−disc)·
    * (1+tax) rounded to cents per row in ONE IEEE expression (both
    * engines evaluate the identical association order); averages are
    * closing double divisions of exact integer sums. */
  def q254PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val charge = round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      * (lit(1.0) + col("l_tax")) * 100).cast("long")
    table(spark, dir, "lineitem")
      .where(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(round(col("l_extendedprice") * 100).cast("long"))
          .as("base_cents"),
        sum(revCents).as("disc_cents"),
        sum(charge).as("charge_cents"),
        sum(round(col("l_discount") * 100).cast("long")).as("disc_pts"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
        col("base_cents"), col("disc_cents"), col("charge_cents"),
        round(col("sum_qty").cast("double") /
          col("count_order").cast("double"), 6).as("avg_qty"),
        round(col("base_cents").cast("double") /
          col("count_order").cast("double"), 4).as("avg_price_cents"),
        round(col("disc_pts").cast("double") /
          col("count_order").cast("double"), 6).as("avg_disc_pts"),
        col("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q5 — local-supplier volume: revenue where the supplier and
    * the customer share a nation, for one region and one year. The
    * six-table join with the extra NON-join-key equality
    * (c_nationkey = s_nationkey) applied as a post-join filter on two
    * broadcast dimensions. Plan: orders pruned by year at the scan,
    * the orders⋈lineitem shuffle is the only big exchange; customer,
    * supplier, nation, region all broadcast (≤200k rows at any SF in
    * TPC-H's fixed ratios — nation/region are constant-size). */
  def q255LocalSupplierVolume(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(table(spark, dir, "lineitem"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(table(spark, dir, "customer")),
        col("c_custkey") === col("o_custkey"))
      .join(broadcast(table(spark, dir, "supplier")),
        col("s_suppkey") === col("l_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(table(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(table(spark, dir, "region")),
        col("n_regionkey") === col("r_regionkey") &&
          col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(sum(revCents).as("rev_cents"))
      .orderBy(col("rev_cents").desc, col("n_name").asc)

  /** TPC-H Q8 — national market share, the TWO-ALIAS formulation
    * (q221 is the pre-collapsed-chain twin): the nation dimension
    * joins twice under different roles exactly as the spec SQL writes
    * it (n1 gates the customer's region, n2 names the supplier), so
    * Catalyst must plan the same relation broadcast in two roles
    * rather than being handed two pre-joined chains. Conditional
    * aggregate per year, closing exact-long division. */
  def q256MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val custNation = table(spark, dir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_region"))
    val suppNation = table(spark, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    table(spark, dir, "lineitem")
      .join(broadcast(table(spark, dir, "part")
          .where(col("p_type") === "ECONOMY")),
        col("l_partkey") === col("p_partkey"))
      .join(table(spark, dir, "orders")
          .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(table(spark, dir, "customer")),
        col("c_custkey") === col("o_custkey"))
      .join(broadcast(custNation), col("cn_key") === col("c_nationkey"))
      .join(broadcast(table(spark, dir, "region"))
          .where(col("r_name") === "AMERICA"),
        col("r_regionkey") === col("cn_region"))
      .join(broadcast(table(spark, dir, "supplier")),
        col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(suppNation), col("sn_key") === col("s_nationkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_7", revCents).otherwise(0L))
          .as("nation_cents"),
        sum(revCents).as("total_cents"))
      .select(col("o_year"), col("nation_cents"), col("total_cents"),
        round(col("nation_cents").cast("double") /
          col("total_cents").cast("double"), 6).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q9 shape — product-type profit by nation and year.
    * ADAPTED: this corpus has no partsupp, so supply cost is proxied
    * as 60% of the part's retail price, fixed to integer cents per
    * unit BEFORE multiplying by quantity (`round(p_retailprice·60)` —
    * ps_supplycost's role as a per-unit part attribute is preserved,
    * the join shape is identical). Profit = revenue − qty·unit_cost,
    * all exact longs. Plan: part filtered by name pattern then
    * broadcast into lineitem; the one shuffle is the (nation, year)
    * aggregate. */
  def q257ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val unitCostCents = round(col("p_retailprice") * 60).cast("long")
    table(spark, dir, "lineitem")
      .join(broadcast(table(spark, dir, "part")
          .where(col("p_name").like("%red%"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(table(spark, dir, "supplier")),
        col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(table(spark, dir, "nation")),
        col("n_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("l_shipdate")).as("o_year"))
      .agg(sum(revCents - col("l_quantity").cast("long") * unitCostCents)
        .as("profit_cents"))
      .orderBy(col("nation").asc, col("o_year").desc)
  }

  /** TPC-H Q12 shape — priority counts by shipping-delay bucket.
    * ADAPTED: lineitem has no shipmode, so the group key is the
    * order→ship delay bucket (≤30 d, ≤60 d, 60+ d) — like shipmode, a
    * small fixed domain derived per line. The CASE-count pair (urgent
    * vs other priorities) rides the lineitem⋈orders join; one shuffle,
    * 3-row result. */
  def q258DelayPriority(spark: SparkSession, dir: String): DataFrame = {
    val delay = datediff(col("l_shipdate"), col("o_orderdate"))
    table(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(table(spark, dir, "orders"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(when(delay <= 30, "0-30d").when(delay <= 60, "31-60d")
        .otherwise("61d+").as("delay_bucket"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy(col("delay_bucket"))
  }

  /** TPC-H Q13 — customer order-count distribution: the double
    * aggregate. LEFT join customer→orders with the filter INSIDE the
    * join condition (a WHERE would silently drop the zero-order
    * customers the left join exists to keep), count orders per
    * customer, then histogram the counts. Two shuffles by
    * construction (customer grain, then count grain — the second is
    * tiny); at 100 TB the first aggregate is the cost and it is
    * key-balanced by custkey. */
  def q259OrderCountDist(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .join(table(spark, dir, "orders"),
        col("o_custkey") === col("c_custkey") &&
          col("o_orderpriority") =!= "5-LOW",
        "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q15 — top supplier(s) by quarterly revenue: aggregate to
    * supplier grain, then keep the row(s) equal to the global max.
    * The scalar-max is a 1-row aggregate crossJoined (broadcast-
    * replicated, never collected) against the ~|suppliers| revenue
    * frame — the view+MAX formulation without materializing a view.
    * Ties all surface (TPC-H's own spec requirement), deterministic
    * order by suppkey. */
  def q260TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = table(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(revCents).as("total_cents"))
    val top = rev.agg(max(col("total_cents")).as("max_cents"))
    rev.crossJoin(broadcast(top))
      .where(col("total_cents") === col("max_cents"))
      .join(broadcast(table(spark, dir, "supplier")),
        col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_cents"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q16 shape — supplier count by part attribute. ADAPTED: no
    * partsupp, so the part↔supplier relation is the one lineitem
    * witnesses (DISTINCT (partkey, suppkey) pairs — same grain, mined
    * from the fact); the "customer complaints" exclusion becomes the
    * deterministic s_acctbal < 0 predicate. Shape preserved: attribute
    * anti-filters, a NOT-IN-subquery → broadcast anti-join on the tiny
    * excluded set, COUNT(DISTINCT suppkey) per (brand, type, size).
    * The distinct-pair projection collapses lineitem to ≤|part×supp|
    * rows before anything wide happens. */
  def q261PartSupplierCounts(spark: SparkSession, dir: String): DataFrame = {
    val pairs = table(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val complaints = table(spark, dir, "supplier")
      .where(col("s_acctbal") < 0).select(col("s_suppkey"))
    pairs
      .join(broadcast(complaints),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(table(spark, dir, "part")
          .where(col("p_brand") =!= "Brand#21" &&
            col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q21 shape — suppliers who kept orders waiting, the
    * AGGREGATE-CASCADE formulation (q222 is the correlated-EXISTS twin
    * Catalyst decorrelates). ADAPTED: no commit/receipt dates, so
    * "kept the order waiting" = was the UNIQUE latest shipper in a
    * multi-supplier finished order (their last line shipped strictly
    * after every other supplier's). The original's EXISTS(other
    * supplier) ∧ NOT EXISTS(other supplier equally late) pair is
    * computed as ONE aggregate cascade instead of two correlated
    * self-joins of the fact: per-(order, supplier) max ship →
    * per-order (max, n_suppliers, n_at_max) via a second aggregate
    * joined back at order grain — blame iff n_suppliers ≥ 2 ∧
    * supplier's max = order max ∧ n_at_max = 1. At 100 TB this is the
    * rewrite you want: two fact-grain shuffles on the SAME key
    * (orderkey) instead of Q21's notorious four-way self-join; the
    * order-grain stats frame is ~|orders| and co-keys so AQE
    * co-locates it. */
  def q262WaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val perSupp = table(spark, dir, "lineitem")
      .join(table(spark, dir, "orders")
          .where(col("o_orderstatus") === "F")
          .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("l_shipdate")).as("supp_last"))
    val perOrder = perSupp
      .groupBy(col("l_orderkey"))
      .agg(max(col("supp_last")).as("order_last"),
        count(lit(1)).as("n_suppliers"))
    val atMax = perSupp.join(perOrder, Seq("l_orderkey"))
      .where(col("supp_last") === col("order_last"))
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_at_max"))
    perSupp.join(perOrder, Seq("l_orderkey"))
      .join(atMax, Seq("l_orderkey"))
      .where(col("n_suppliers") >= 2 && col("n_at_max") === 1 &&
        col("supp_last") === col("order_last"))
      .join(broadcast(table(spark, dir, "supplier")),
        col("s_suppkey") === col("l_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey").asc)
      .limit(20)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q254_pricing_summary" -> q254PricingSummary,
    "q255_local_supplier_volume" -> q255LocalSupplierVolume,
    "q256_market_share" -> q256MarketShare,
    "q257_product_profit" -> q257ProductProfit,
    "q258_delay_priority" -> q258DelayPriority,
    "q259_order_count_dist" -> q259OrderCountDist,
    "q260_top_supplier" -> q260TopSupplier,
    "q261_part_supplier_counts" -> q261PartSupplierCounts,
    "q262_waiting_suppliers" -> q262WaitingSuppliers)

  val oracles: Map[String, String] = Map(
    "q254_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS base_cents,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |      AS BIGINT)) AS BIGINT) AS disc_cents,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
        |      * (1.0 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS charge_cents,
        |  round(CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS avg_qty,
        |  round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS avg_price_cents,
        |  round(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS avg_disc_pts,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q255_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |      AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM orders
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY rev_cents DESC, n_name ASC""".stripMargin,
    "q256_market_share" ->
      """SELECT year(o_orderdate) AS o_year,
        |  CAST(sum(CASE WHEN n2.n_name = 'NATION_7'
        |    THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |      AS BIGINT) ELSE 0 END) AS BIGINT) AS nation_cents,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |      AS BIGINT)) AS BIGINT) AS total_cents,
        |  round(CAST(sum(CASE WHEN n2.n_name = 'NATION_7'
        |      THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |        AS BIGINT) ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |        AS BIGINT)) AS DOUBLE), 6) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON n1.n_nationkey = c_nationkey
        |JOIN region ON r_regionkey = n1.n_regionkey AND r_name = 'AMERICA'
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation n2 ON n2.n_nationkey = s_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q257_product_profit" ->
      """SELECT n_name AS nation, year(l_shipdate) AS o_year,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |        AS BIGINT)
        |    - CAST(l_quantity AS BIGINT)
        |      * CAST(round(p_retailprice * 60) AS BIGINT)) AS BIGINT)
        |    AS profit_cents
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |GROUP BY 1, 2 ORDER BY nation ASC, o_year DESC""".stripMargin,
    "q258_delay_priority" ->
      """SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30
        |    THEN '0-30d'
        |    WHEN datediff('day', o_orderdate, l_shipdate) <= 60
        |    THEN '31-60d' ELSE '61d+' END AS delay_bucket,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q259_order_count_dist" ->
      """WITH c_orders AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |    AND o_orderpriority <> '5-LOW'
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS custdist
        |FROM c_orders GROUP BY 1
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q260_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |        AS BIGINT)) AS BIGINT) AS total_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_cents
        |FROM rev JOIN supplier ON s_suppkey = l_suppkey
        |WHERE total_cents = (SELECT max(total_cents) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q261_part_supplier_counts" ->
      """WITH pairs AS (
        |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM pairs
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#21' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q262_waiting_suppliers" ->
      """WITH per_supp AS (
        |  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS supp_last
        |  FROM lineitem
        |  JOIN orders ON o_orderkey = l_orderkey AND o_orderstatus = 'F'
        |  GROUP BY 1, 2),
        |per_order AS (
        |  SELECT l_orderkey, max(supp_last) AS order_last,
        |    count(*) AS n_suppliers
        |  FROM per_supp GROUP BY 1),
        |at_max AS (
        |  SELECT p.l_orderkey, count(*) AS n_at_max
        |  FROM per_supp p JOIN per_order o ON p.l_orderkey = o.l_orderkey
        |  WHERE p.supp_last = o.order_last GROUP BY 1)
        |SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM per_supp p
        |JOIN per_order o ON p.l_orderkey = o.l_orderkey
        |JOIN at_max a ON a.l_orderkey = p.l_orderkey
        |JOIN supplier ON s_suppkey = p.l_suppkey
        |WHERE o.n_suppliers >= 2 AND a.n_at_max = 1
        |  AND p.supp_last = o.order_last
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_suppkey ASC LIMIT 20""".stripMargin)
}

package graft.queries

import graft.core.Tables.table
import graft.ops.{Profile, Skyline, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4 analytics surface: RAG chunking, corpus n-gram mining,
  * GROUPING SETS, a distributed skyline, equi-width histograms,
  * correlated scalar subqueries, and the six-table multi-join flagship.
  * Oracle conventions follow [[Training]] / [[Corpus]]: money in integer
  * cents before any group sum, float expressions mirrored literally,
  * deterministic tiebreaks on every top-k.
  */
object Analytics {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")

  /** RAG document chunking: 8-token windows every 6 tokens (2-token
    * overlap). [[TextAnalysis.chunkDocs]]. */
  def q98Chunking(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunkDocs(docs(spark, dir), "doc_id", "text",
      chunkTokens = 8, stride = 6)

  /** Corpus-wide top-100 bigrams — boilerplate/stopphrase mining.
    * [[TextAnalysis.topNgrams]]. */
  def q99NgramFreq(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.topNgrams(docs(spark, dir), "text", n = 2, k = 100)

  /** Explicit GROUPING SETS ((nation, priority), (nation), ()) over
    * orders⋈customer⋈nation with per-set GROUPING flags — the
    * reference's report-rollup shape generalized beyond ROLLUP/CUBE
    * (q33/q52). Revenue in integer cents per the q72 discipline. */
  def q100GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val j = table(spark, dir, "orders")
      .join(table(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(table(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
    j.groupingSets(
        Seq(Seq(col("n_name"), col("o_orderpriority")),
          Seq(col("n_name")), Seq.empty),
        col("n_name"), col("o_orderpriority"))
      .agg(grouping(col("n_name")).cast("long").as("g_nation"),
        grouping(col("o_orderpriority")).cast("long").as("g_prio"),
        count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
  }

  /** Pareto frontier of parts: minimize retail price, maximize size —
    * cheapest-per-capability mining. [[Skyline.skyline2d]]; the oracle
    * spells the same set as the quadratic NOT EXISTS. */
  def q101Skyline(spark: SparkSession, dir: String): DataFrame =
    Skyline.skyline2d(
      table(spark, dir, "part")
        .select(col("p_partkey"), col("p_retailprice"), col("p_size")),
      "p_retailprice", "p_size")

  /** 20-bucket equi-width histogram of order totals.
    * [[Profile.histogram]]. */
  def q102Histogram(spark: SparkSession, dir: String): DataFrame =
    Profile.histogram(table(spark, dir, "orders"), "o_totalprice", 20)

  /** Correlated scalar subquery: orders ≥1.5× their own customer's
    * average order value (big-ticket detection). Catalyst decorrelates
    * this into an aggregate + equi-join — asserted in PlanShapeSpec; the
    * comparison runs on integer-valued cent doubles so the average is
    * order-independent. */
  def q103Correlated(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "orders").createOrReplaceTempView("q103_orders")
    spark.sql(
      """SELECT o_orderkey, o_custkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |FROM q103_orders o
        |WHERE round(o_totalprice * 100) > (
        |  SELECT 1.5 * avg(round(i.o_totalprice * 100))
        |  FROM q103_orders i WHERE i.o_custkey = o.o_custkey)""".stripMargin)
  }

  /** The six-table flagship (TPC-H Q5 shape): 1996 revenue by ASIA
    * nation where customer and supplier share the nation. Dimension
    * chain region→nation broadcasts; the customer/supplier/orders/
    * lineitem joins shuffle on their keys and the nation filter
    * propagates through the join graph. Revenue in integer cents. */
  def q104RegionalRevenue(spark: SparkSession, dir: String): DataFrame = {
    val revCents =
      round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
        .cast("long")
    val nations = broadcast(
      table(spark, dir, "region").where(col("r_name") === "ASIA")
        .join(table(spark, dir, "nation"),
          col("n_regionkey") === col("r_regionkey")))
    table(spark, dir, "lineitem")
      .join(table(spark, dir, "orders")
          .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(table(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(table(spark, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .join(nations, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(revCents).as("rev_cents"), count(lit(1)).as("n_items"))
  }

  /** Events with the cross-engine µs timestamp (see [[Advanced]]: parquet
    * TIMESTAMP(NANOS) reads as an epoch-nanos long under `nanosAsLong`;
    * DuckDB reads µs — all shared arithmetic happens on integral µs). */
  private def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events").withColumn("ts_us", expr("ts div 1000L"))

  /** Seasonal (hour-of-day) anomaly detection: per event type, hours
    * whose count exceeds 2× that type's hourly average. The ops
    * dashboard's "traffic spike" rule. Pure integer arithmetic — the
    * compare is `c·n_hours > 2·total`, no division — so the flag is
    * engine-exact. One aggregation + one per-type window. */
  def q105SeasonalAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
    events(spark, dir)
      .groupBy(col("event_type"),
        (expr("ts_us div 3600000000") % 24).as("hr"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("spike",
        col("n_events") * count(lit(1)).over(w) >
          sum(col("n_events")).over(w) * 2)
  }

  /** Edit-distance near-dup pairs over the corpus.
    * [[graft.ops.TextDedup.editDistancePairs]]. */
  def q106FuzzyDedup(spark: SparkSession, dir: String): DataFrame =
    graft.ops.TextDedup.editDistancePairs(docs(spark, dir), "doc_id", "text",
      prefixLen = 40, maxDist = 10, bandTokens = 2)

  /** UNPIVOT surface: per-returnflag charge components melted to long
    * format with `Dataset.unpivot` (wide aggregate → (flag, charge,
    * cents) rows). Charges are per-row integer cents before the group
    * sum, per the q72 discipline. */
  def q107Unpivot(spark: SparkSession, dir: String): DataFrame = {
    val cents = (c: org.apache.spark.sql.Column) => round(c).cast("long")
    val wide = table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(sum(cents(col("l_extendedprice") * 100)).as("base_cents"),
        sum(cents(col("l_extendedprice") * col("l_discount") * 100))
          .as("disc_cents"),
        sum(cents(col("l_extendedprice") * col("l_tax") * 100))
          .as("tax_cents"))
    wide.unpivot(Array(col("l_returnflag")),
      Array(col("base_cents"), col("disc_cents"), col("tax_cents")),
      "charge", "cents")
  }

  /** First-order event-type transition matrix per user stream (ordered
    * by time, event id as the tiebreak): the session-flow / Markov-prior
    * mining pass. One window shuffle on user, one count aggregation —
    * both integer-exact. */
  def q108Transitions(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    events(spark, dir)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Cumulative distinct users by day — growth accounting WITHOUT a
    * distinct-over-window (which re-scans the full history per day at
    * scale): each user contributes once at their first-seen day (one
    * aggregation), then a running sum over the tiny per-day frame. */
  def q109RunningDistinct(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    events(spark, dir)
      .groupBy(col("user_id"))
      .agg(min(expr("ts_us div 86400000000")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(w))
  }

  /** Benford first-digit screen over order totals — the forensic
    * data-quality check. Digit histogram is integer-exact; observed and
    * expected shares are one float division / log10 each, rounded to 6.
    * A 9-row result from one aggregation at any scale. */
  def q110Benford(spark: SparkSession, dir: String): DataFrame = {
    val digit = substring(floor(col("o_totalprice")).cast("long")
      .cast("string"), 1, 1).cast("long")
    val n = table(spark, dir, "orders")
      .groupBy(digit.as("digit")).agg(count(lit(1)).as("n"))
    val total = n.agg(sum(col("n")).as("__total"))
    n.join(broadcast(total))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("__total").cast("double"), 6)
          .as("observed"),
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6)
          .as("benford"))
  }

  /** 7-day moving median of daily order counts — the robust trend line
    * (medians shrug off the spikes q105 flags). Exact median over the
    * bounded 7-row frame via sorted collect; interpolation (mean of the
    * middle two on even frames) matches `quantile_cont(0.5)`. */
  def q111MovingMedian(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
      .rowsBetween(-6, 0)
    val daily = table(spark, dir, "orders")
      .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(count(lit(1)).as("n_orders"))
    daily
      .withColumn("__s", sort_array(collect_list(col("n_orders")).over(w)))
      .select(col("day"), col("n_orders"),
        ((element_at(col("__s"), ((size(col("__s")) + 1) / 2).cast("int")) +
          element_at(col("__s"), (size(col("__s")) / 2).cast("int") + 1))
          .cast("double") / 2.0).as("med7"))
  }

  /** Golden-record survivorship: per user, the latest non-null value of
    * each (sparsely populated) profile field — the entity-resolution
    * merge step. Fields are synthesized deterministically from the event
    * props (k%7/k%5/k%3, 0 → null) so both engines see identical sparsity.
    * One window shuffle; `first(…, ignoreNulls)` over the full frame in
    * recency order is the IGNORE NULLS FIRST_VALUE idiom. */
  def q112Survivorship(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = get_json_object(col("props"), "$.k").cast("long")
    def field(m: Int, p: String) =
      when(k % m === 0, lit(null)).otherwise(concat(lit(p), (k % m).cast("string")))
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    events(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        field(7, "d").as("__dev"), field(5, "c").as("__cty"),
        field(3, "p").as("__pln"))
      .withColumn("device", first(col("__dev"), ignoreNulls = true).over(full))
      .withColumn("country", first(col("__cty"), ignoreNulls = true).over(full))
      .withColumn("plan", first(col("__pln"), ignoreNulls = true).over(full))
      .withColumn("__rn", row_number().over(ord))
      .where(col("__rn") === 1)
      .select(col("user_id"), col("device"), col("country"), col("plan"))
  }

  /** Multiset set operations — INTERSECT ALL / EXCEPT ALL keep
    * multiplicity (how many customers per nation survive the supplier
    * overlap), where q53's distinct variants collapse it. Grouping the
    * multiset makes the multiplicities the visible result. */
  def q113SetOpsAll(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "customer")
      .select(col("c_nationkey").as("nationkey"))
    val s = table(spark, dir, "supplier")
      .select(col("s_nationkey").as("nationkey"))
    c.intersectAll(s).groupBy("nationkey")
      .agg(count(lit(1)).as("n")).withColumn("side", lit("intersect_all"))
      .unionByName(c.exceptAll(s).groupBy("nationkey")
        .agg(count(lit(1)).as("n")).withColumn("side", lit("except_all")))
  }

  /** LATERAL correlated subquery: each urgent order joined to its own
    * top-2 line items by value — the per-row-subplan SQL surface
    * Catalyst decorrelates into a ranked window join. */
  def q114Lateral(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "orders").createOrReplaceTempView("q114_orders")
    table(spark, dir, "lineitem").createOrReplaceTempView("q114_lineitem")
    spark.sql(
      """SELECT o.o_orderkey, t.l_linenumber, t.cents
        |FROM q114_orders o, LATERAL (
        |  SELECT l_linenumber,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM q114_lineitem
        |  WHERE l_orderkey = o.o_orderkey
        |  ORDER BY cents DESC, l_linenumber LIMIT 2) t
        |WHERE o.o_orderpriority = '1-URGENT'""".stripMargin)
  }

  /** Equi-depth deciles of line-item value. [[Profile.equiDepthHistogram]]. */
  def q115EquiDepth(spark: SparkSession, dir: String): DataFrame =
    Profile.equiDepthHistogram(
      table(spark, dir, "lineitem"), "l_extendedprice", 10)

  /** Chi-square independence test of lang × source — the statistical
    * "is my corpus mix biased" check behind q93's entropy diagnostic.
    * Observed counts are exact integers; each cell's (o−e)²/e term is
    * the same few float ops in both engines (no `pow` — libm-free), and
    * the final sum folds in (lang, source) order with seed 0.0 per the
    * q70/q93 fixed-order discipline. */
  def q116ChiSquare(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = docs(spark, dir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).cast("double").as("o"))
    val w = o
      .withColumn("r", sum(col("o")).over(Window.partitionBy(col("lang"))))
      .withColumn("c", sum(col("o")).over(Window.partitionBy(col("source"))))
      .withColumn("n", sum(col("o")).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    val e = col("r") * col("c") / col("n")
    w.select(col("lang"), col("source"),
        ((col("o") - e) * (col("o") - e) / e).as("v"))
      .agg(
        round(aggregate(
          transform(
            sort_array(collect_list(struct(col("lang"), col("source"),
              col("v")))),
            s => s.getField("v")),
          lit(0.0), (a, x) => a + x), 6).as("chi2"),
        ((size(collect_set(col("lang"))) - 1) *
          (size(collect_set(col("source"))) - 1)).cast("long").as("dof"))
  }

  /** Gaps-and-islands: runs of consecutive ship days per part (the
    * classic `day − row_number()` grouping). One window shuffle on the
    * part key, one aggregation — no self-join, no sequence generation;
    * the global-date variant is the same plan with a degenerate key. */
  def q117GapsIslands(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("p")).orderBy(col("day"))
    table(spark, dir, "lineitem")
      .select(col("l_partkey").as("p"),
        col("l_shipdate").cast("date").as("day"))
      .distinct()
      .withColumn("grp", date_sub(col("day"), row_number().over(w)))
      .groupBy(col("p"), col("grp"))
      .agg(min(col("day")).as("start_day"), max(col("day")).as("end_day"),
        count(lit(1)).as("len"))
      .drop("grp")
  }

  /** Spark 4 VARIANT surface: the modern engine-native answer to the
    * reference's path→bytes document model (SURVEY §1.2) — `parse_json`
    * once into a binary variant, then typed `variant_get` path access
    * (q28's `get_json_object` re-expressed through the type system; same
    * synthesized document, same null-on-absent semantics). The oracle
    * replays the JSON paths — VARIANT is the encoding, not the result. */
  def q118Variant(spark: SparkSession, dir: String): DataFrame = {
    val j = concat(
      lit("""{"order":{"id":"""), col("o_orderkey").cast("string"),
      lit(""","status":""""), col("o_orderstatus"),
      lit("""","tags":["a","b"]}}"""))
    table(spark, dir, "orders")
      .select(col("o_orderkey"), parse_json(j).as("v"))
      .select(col("o_orderkey"),
        variant_get(col("v"), "$.order.id", "bigint").as("id_ext"),
        variant_get(col("v"), "$.order.status", "string").as("status_ext"),
        variant_get(col("v"), "$.order.tags[1]", "string").as("tag1_ext"),
        variant_get(col("v"), "$.order.missing", "string").as("missing_ext"))
  }

  /** FILTER-clause conditional aggregation — one pass computing N
    * differently-predicated aggregates (the idiom that replaces N
    * self-joins or CASE pyramids in report queries). */
  def q119FilterAgg(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .agg(
        expr("count(*) FILTER (WHERE l_returnflag = 'R')").as("n_returned"),
        expr("count(*) FILTER (WHERE l_quantity >= 25)").as("n_bulk"),
        expr("sum(CAST(round(l_extendedprice * 100) AS BIGINT)) " +
          "FILTER (WHERE l_discount > 0.05)").as("disc_cents"),
        count(lit(1)).as("n_total"))

  /** Deterministic PII pseudonymization ([[graft.ops.Governance]]):
    * synthesized emails/IPs (the q46 convention — the corpus itself is
    * PII-free) masked with domain-preserving salted-SHA pseudonyms and
    * /24-preserving IP masks. Equal identities keep equal tokens, so the
    * masked table still joins. */
  def q120Pseudonymize(spark: SparkSession, dir: String): DataFrame = {
    val email = concat(lit("user"), col("doc_id").cast("string"), lit("@mail"),
      pmod(col("doc_id"), lit(7)).cast("string"), lit(".example"))
    val ip = concat(lit("10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
      lit("."), pmod(col("doc_id"), lit(100)).cast("string"))
    docs(spark, dir).select(col("doc_id"),
      graft.ops.Governance.maskEmail(email, salt = "s1").as("masked_email"),
      graft.ops.Governance.maskIp(ip).as("masked_ip"),
      graft.ops.Governance.pseudonym(col("source"), salt = "s1")
        .as("source_token"))
  }

  /** The native `flat_json` expression, oracle-gated: synthesized order
    * documents (tag count varies with the key) flattened to the
    * reference's path→value map, then accessed by flattened key. The
    * oracle replays each key as a JSON path and the map cardinality as
    * arithmetic — 1:1 by the flatten's definition. */
  def q121FlatJson(spark: SparkSession, dir: String): DataFrame = {
    val tags = when(pmod(col("o_orderkey"), lit(3)) === 0, lit("""["a"]"""))
      .when(pmod(col("o_orderkey"), lit(3)) === 1, lit("""["a","b"]"""))
      .otherwise(lit("""["a","b","c"]"""))
    val j = concat(lit("""{"order":{"id":"""), col("o_orderkey").cast("string"),
      lit(""","status":""""), col("o_orderstatus"), lit("""","tags":"""),
      tags, lit("}}"))
    table(spark, dir, "orders")
      .select(col("o_orderkey"),
        graft.functions.FlatJsonMap.flatJson(j).as("m"))
      .select(col("o_orderkey"),
        col("m").getItem("order.id").as("id_txt"),
        col("m").getItem("order.status").as("status_txt"),
        col("m").getItem("order.tags[2]").as("tag2"),
        size(map_keys(col("m"))).cast("long").as("n_keys"))
  }

  /** Last-touch marketing attribution: each purchase is credited to the
    * user's most recent preceding non-purchase event ('none' if the
    * purchase is their first event). One window over (user, time) then a
    * tiny aggregate — the canonical attribution shape; first-touch is the
    * same plan with `first` over the unbounded-preceding frame. Revenue
    * in exact cents. */
  def q134Attribution(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events(spark, dir)
      .withColumn("touch",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .groupBy(coalesce(col("touch"), lit("none")).as("touch"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(round(col("value") * 100).cast("long")).as("rev_cents"))
  }

  /** Day-of-week × hour-of-day activity grid — the ops-dashboard heatmap.
    * Both coordinates derive from integral epoch-µs arithmetic (no
    * calendar functions: engines disagree on week-start conventions;
    * `(epoch_day + 3) mod 7` pins 0 = Monday everywhere). */
  def q136ActivityGrid(spark: SparkSession, dir: String): DataFrame = {
    events(spark, dir)
      .groupBy( // `div` keeps everything integral ( `/` would go double)
        expr("(ts_us div 1000000L div 86400L + 3) % 7").as("dow"),
        expr("ts_us div 1000000L % 86400L div 3600L").as("hr"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("val_cents"))
  }

  /** Time-weighted average value per event type (TWAP): each reading is
    * weighted by how long it "held" (µs until the type's next event; the
    * open-ended last reading is excluded). Weights and cents are exact
    * longs, so the weighted sum is order-independent; one lead window +
    * one aggregate. The µs·cents products stay under 2⁶³ for year-scale
    * spans — decade-plus spans should downshift to ms weights. */
  def q141Twap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts_us"), col("event_id"))
    events(spark, dir)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"),
        (lead(col("ts_us"), 1).over(w) - col("ts_us")).as("gap_us"))
      .where(col("gap_us").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("gap_us") * col("cents")).as("wsum"),
        sum(col("gap_us")).as("wtot"))
      .select(col("event_type"), col("n"),
        round(col("wsum") / col("wtot").cast("double") / 100.0, 6)
          .as("twap"),
        round(col("wtot") / 1000000.0, 6).as("span_s"))
  }

  /** Sessionized bounce-rate KPI: 30-minute-gap sessions per user, a
    * bounce = a single-event session. One window pass builds the
    * session ids (gaps-and-islands), two aggregates roll up — all
    * counts and duration sums exact integers. */
  def q142Bounce(spark: SparkSession, dir: String): DataFrame = {
    val sess = graft.ops.Temporal.sessionize(events(spark, dir),
        "user_id", "event_id", "ts_us", gap = 1800000000L)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("ts_us")) - min(col("ts_us"))).as("dur_us"))
    sess.agg(
        count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounce"),
        sum(col("n_events")).as("n_events"),
        sum(col("dur_us")).as("dur_us"))
      .select(col("n_sessions"), col("n_bounce"),
        round(col("n_bounce") / col("n_sessions").cast("double"), 6)
          .as("bounce_rate"),
        round(col("n_events") / col("n_sessions").cast("double"), 6)
          .as("avg_events"),
        round(col("dur_us") / col("n_sessions").cast("double") / 1000000.0,
          6).as("avg_duration_s"))
  }

  /** PMI collocations over the corpus: the multi-word-expression miner.
    * [[TextAnalysis.pmiCollocations]]. */
  def q144Pmi(spark: SparkSession, dir: String): DataFrame =
    graft.ops.TextAnalysis.pmiCollocations(docs(spark, dir), "text",
      minCount = 5, k = 100)

  /** OHLC downsampling: per (event type, hour) the opening/closing/
    * high/low value — the telemetry resample that turns an unbounded
    * event stream into a bounded time series. Open/close pick the value
    * at the min/max (ts, event_id) via struct-ordered MIN/MAX — one
    * aggregate, no window, exact integers throughout. */
  def q153Ohlc(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"),
        expr("ts_us div 3600000000L").as("hr"),
        col("ts_us"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("n"),
        min(struct(col("ts_us"), col("event_id"), col("cents")))
          .getField("cents").as("open_c"),
        max(struct(col("ts_us"), col("event_id"), col("cents")))
          .getField("cents").as("close_c"),
        max(col("cents")).as("high_c"), min(col("cents")).as("low_c"))

  /** Holt-Winters additive forecast of daily order volume per priority
    * class (weekly seasonality): level/trend/one-step forecast in exact
    * integer micro-units — no float op anywhere, so the recursive replay
    * is bit-exact ([[graft.ops.Temporal.holtWinters]]). */
  def q194HoltWinters(spark: SparkSession, dir: String): DataFrame = {
    val daily = table(spark, dir, "orders")
      .groupBy(col("o_orderpriority").as("priority"),
        col("o_orderdate").as("day"))
      .agg(count(lit(1)).as("n"))
    graft.ops.Temporal.holtWinters(daily, "priority", "day", "n", period = 7)
  }

  /** k-anonymity / l-diversity release audit over customers: quasi-
    * identifiers (nation, market segment) against the sensitive account
    * balance ([[graft.ops.Governance.kAnonymityAudit]], k = 20). */
  def q195KAnonymity(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Governance.kAnonymityAudit(table(spark, dir, "customer"),
      Seq("c_nationkey", "c_mktsegment"), "c_acctbal", k = 20)

  /** Frequent 3-step event sequences: the top-20 consecutive event-type
    * trigrams across user timelines (tie-broken lexically) — q108's
    * Markov transitions extended to sequential-pattern grain. Two lags
    * over one (user, time) window, one count, one bounded top-k. */
  def q196Trigrams(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    events(spark, dir)
      .withColumn("t1", lag(col("event_type"), 2).over(w))
      .withColumn("t2", lag(col("event_type"), 1).over(w))
      .where(col("t1").isNotNull)
      .groupBy(col("t1"), col("t2"), col("event_type").as("t3"))
      .agg(count(lit(1)).as("n_seq"))
      .orderBy(col("n_seq").desc, col("t1"), col("t2"), col("t3"))
      .limit(20)
  }

  /** TPC-H Q13 shape — customer order-count distribution INCLUDING the
    * zero-order customers a naive inner join silently drops: left join →
    * per-customer count → histogram of counts. The double aggregation
    * collapses to |distinct counts| rows before the second (tiny)
    * shuffle. */
  def q198Custdist(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .join(table(spark, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q15 shape — top supplier(s) by shipped revenue in one quarter,
    * TIES INCLUDED: aggregate → 1-row max (crossJoin broadcast, not a
    * window over all suppliers) → equality filter. Integer cents. */
  def q199TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val revCents =
      round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
        .cast("long")
    val rev = table(spark, dir, "lineitem")
      .where(col("l_shipdate").between("1995-01-01", "1995-03-31"))
      .groupBy(col("l_suppkey"))
      .agg(sum(revCents).as("total_rev_cents"))
    val mx = rev.agg(max(col("total_rev_cents")).as("__mx"))
    rev.crossJoin(broadcast(mx))
      .where(col("total_rev_cents") === col("__mx"))
      .join(table(spark, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev_cents"))
  }

  /** Whole-warehouse reconciliation: one order-independent
    * (count, XOR, modular-sum) signature row per driver table over a
    * canonicalized integral projection — the "did the migration copy
    * every row bit-for-bit" capstone ([[graft.ops.Quality.tableChecksum]]
    * fanned across all ten tables; each signature is a single
    * scan-and-aggregate, the union is ten 1-row frames). Floats
    * canonicalize to cents / are summarized by length so both engines
    * hash identical strings. */
  def q200WarehouseChecksum(spark: SparkSession, dir: String): DataFrame = {
    def sig(name: String, canon: DataFrame): DataFrame =
      graft.ops.Quality.tableChecksum(canon, canon.columns.toSeq)
        .select(lit(name).as("table_name"), col("n_rows"), col("xor_sig"),
          col("sum_sig"))
    val cents = (c: Column) => round(c * 100).cast("long")
    val t = (n: String) => table(spark, dir, n)
    Seq(
      sig("region", t("region").select(col("r_regionkey"), col("r_name"))),
      sig("nation", t("nation").select(col("n_nationkey"), col("n_name"),
        col("n_regionkey"))),
      sig("customer", t("customer").select(col("c_custkey"),
        col("c_nationkey"), cents(col("c_acctbal")).as("cents"),
        col("c_mktsegment"))),
      sig("supplier", t("supplier").select(col("s_suppkey"), col("s_name"),
        col("s_nationkey"), cents(col("s_acctbal")).as("cents"))),
      sig("part", t("part").select(col("p_partkey"), col("p_brand"),
        col("p_size"))),
      sig("orders", t("orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), cents(col("o_totalprice")).as("cents"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
        col("o_orderpriority"))),
      sig("lineitem", t("lineitem").select(col("l_orderkey"),
        col("l_linenumber"), col("l_quantity").cast("long").as("qty"),
        cents(col("l_extendedprice")).as("cents"))),
      sig("events", events(spark, dir).select(col("event_id"),
        col("user_id"), col("event_type"), col("ts_us"))),
      sig("documents", t("documents").select(col("doc_id"),
        md5(col("text")).as("text_md5"), col("lang"), col("source"))),
      sig("embeddings", t("embeddings").select(col("vec_id"), col("label"),
        size(col("embedding")).as("dim")))
    ).reduce(_ unionByName _)
  }

  /** Revenue by part brand through a MANUALLY salted fact⋈dim join
    * ([[graft.ops.Skew.saltedEquiJoin]], 8 salts): the skew-mitigation
    * spelling for when AQE can't re-plan — oracle-proven row-identical
    * to the plain join (the salt changes the plan, never the result). */
  def q207SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val revCents =
      round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
        .cast("long")
    val dim = table(spark, dir, "part")
      .withColumnRenamed("p_partkey", "l_partkey")
    graft.ops.Skew.saltedEquiJoin(table(spark, dir, "lineitem"), dim,
        "l_partkey", salts = 8)
      .groupBy(col("p_brand"))
      .agg(sum(revCents).as("rev_cents"), count(lit(1)).as("n_items"))
  }

  /** Spark 4 RECURSIVE CTE (`UnionLoop`): a month spine the engine
    * generates itself — anchor = one (min, max) month-index aggregate,
    * step = `mi + 1` until the max — LEFT JOINed to monthly order
    * counts so zero-order months surface as explicit rows. ~80
    * recursion levels of one-row frames cost driver time only; the
    * joined aggregate is the one real job (at 100 TB the spine is
    * still 80 rows). DuckDB replays `WITH RECURSIVE` verbatim;
    * revenue is integer cents per the q72 discipline. */
  def q208RecursiveCte(spark: SparkSession, dir: String): DataFrame = {
    // ~80 levels on this corpus; the default limit (100) is one data
    // refresh away from a failure, so pin headroom explicitly — in a CHILD
    // session (shared SparkContext, isolated conf + temp views), so the
    // caller's session keeps its own recursion limit and catalog: the
    // returned frame stays bound to the child, whose conf is read lazily
    // at execution (a save-and-restore around this method would race it)
    val session = spark.newSession()
    session.conf.set("spark.sql.cteRecursionLevelLimit", "1000")
    table(session, dir, "orders").createOrReplaceTempView("q208_orders")
    session.sql(
      """WITH RECURSIVE months AS (
        |  SELECT mn AS mi, mx FROM (
        |    SELECT min(year(o_orderdate) * 12 + month(o_orderdate) - 1) AS mn,
        |           max(year(o_orderdate) * 12 + month(o_orderdate) - 1) AS mx
        |    FROM q208_orders)
        |  UNION ALL
        |  SELECT mi + 1, mx FROM months WHERE mi < mx),
        |agg AS (
        |  SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS mi,
        |         count(*) AS n_orders,
        |         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM q208_orders GROUP BY 1)
        |SELECT format_string('%04d-%02d', mi div 12, mi % 12 + 1) AS month,
        |  coalesce(n_orders, 0L) AS n_orders,
        |  coalesce(cents, 0L) AS cents
        |FROM months LEFT JOIN agg USING (mi)""".stripMargin)
  }

  /** Spearman rank correlation (tie-corrected) between line quantity and
    * extended price per return flag. DOUBLED average ranks stay integral
    * under ties (2·avgrank = 2·minrank + tiecount − 1) and Spearman is
    * scale-invariant, so every aggregation sums exact BIGINTs — the only
    * float math is the final one-expression formula over those exact
    * sums, identical IEEE ops in both engines. Σr² tops out ~8.6e17 at
    * sf0.1 (fits BIGINT); at sf1000 switch the sums to DECIMAL(38,0). */
  def q209Spearman(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val flag = col("l_returnflag")
    val wq = Window.partitionBy(flag).orderBy(col("l_quantity"))
    val wqt = Window.partitionBy(flag, col("l_quantity"))
    val wp = Window.partitionBy(flag).orderBy(col("l_extendedprice"))
    val wpt = Window.partitionBy(flag, col("l_extendedprice"))
    val ranked = table(spark, dir, "lineitem").select(flag,
      (lit(2L) * rank().over(wq) + count(lit(1)).over(wqt) - lit(1L))
        .as("rx"),
      (lit(2L) * rank().over(wp) + count(lit(1)).over(wpt) - lit(1L))
        .as("ry"))
    val d = (c: Column) => c.cast("double")
    // rank products: per-row rx·ry reaches (2n)² and the per-flag sums
    // reach ~4n³ — int64 dies at ~2M rows/flag (the 10x probe); decimal
    // (38,0) sums stay EXACT with headroom past sf1000, and the closing
    // double casts round the same exact values DuckDB rounds from HUGEINT
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val s = ranked.groupBy(flag).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
      sum(dec(col("rx")) * dec(col("rx"))).as("sxx"),
      sum(dec(col("ry")) * dec(col("ry"))).as("syy"),
      sum(dec(col("rx")) * dec(col("ry"))).as("sxy"))
    s.select(flag, col("n_pairs"),
      round((d(col("n_pairs")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
        (sqrt(d(col("n_pairs")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
         sqrt(d(col("n_pairs")) * d(col("syy")) - d(col("sy")) * d(col("sy")))),
        6).as("spearman"))
  }

  /** Kaplan–Meier conversion survival: per user, hours from first `view`
    * to first subsequent `purchase`; users who never purchase are
    * right-censored at their last event. One curve point per event-hour
    * with at-risk count and S(t) ([[graft.ops.Stats.kaplanMeier]]) — the
    * time-to-event layer on top of q73's funnel counts. Durations are
    * exact integer hours; survival folds sorted exact factors. */
  def q212Survival(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      .withColumn("ts_us", expr("ts div 1000L"))
    val perUser = ev.groupBy(col("user_id")).agg(
      min(when(col("event_type") === "view", col("ts_us"))).as("tv"),
      max(col("ts_us")).as("tlast"))
    val firstPurchase = ev.where(col("event_type") === "purchase")
      .join(perUser.where(col("tv").isNotNull), Seq("user_id"))
      .where(col("ts_us") >= col("tv"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("tp"))
    val subjects = perUser.where(col("tv").isNotNull)
      .join(firstPurchase, Seq("user_id"), "left_outer")
      .select(
        // durations are non-negative, so integer `div` matches DuckDB //
        expr("(coalesce(tp, tlast) - tv) div 3600000000L").as("dur_h"),
        col("tp").isNotNull.cast("long").as("ev"))
    graft.ops.Stats.kaplanMeier(subjects, "dur_h", "ev")
  }

  /** DP-mechanism noisy count release: per-(priority, status) order
    * counts through the truncated two-sided geometric mechanism
    * (ε = ln 2), clamped at 0 ([[graft.ops.Governance.noisyCounts]]).
    * Noise is md5-derived (deterministic-replay harness — the scaladoc
    * spells out what a secure release swaps in), so the oracle replays
    * the exact released table. */
  def q214DpRelease(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Governance.noisyCounts(
      table(spark, dir, "orders"),
      Seq("o_orderpriority", "o_orderstatus"))

  /** Recency-decayed revenue (half-life 30 days): every order's cents are
    * halved once per 30 days of age at the corpus horizon — spelled as an
    * integer divide by a power of two (`cents div 2^k`), NOT `pow(0.5,·)`
    * (libm pow differs across engines; dyadic decay is exact in both).
    * The horizon is one 1-row broadcast aggregate; the decay is a
    * projection — the recency-weighted-LTV shape at scan speed. */
  def q220TimeDecay(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
    val ref = o.agg(max(col("o_orderdate")).as("ref"))
    o.crossJoin(broadcast(ref))
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        expr("datediff(ref, o_orderdate) div 30").as("k"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cents div shiftleft(1L, cast(least(k, 62) as int))"))
          .as("decayed_cents"))
  }

  /** TPC-H Q8 shape — national market share: NATION_6's slice of PROMO
    * part revenue sold to AMERICA-region customers, per order year. The
    * 8-relation join-reorder flagship next to q104's Q5: two independent
    * dimension chains (customer→nation→region and supplier→nation) hang
    * off the fact; region/nation/part broadcast, the numerator rides a
    * conditional sum through ONE pass — never two scans. */
  def q221MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val rev = round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      * 100).cast("long")
    val amNations = broadcast(
      table(spark, dir, "region").where(col("r_name") === "AMERICA")
        .join(table(spark, dir, "nation"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("c_nk")))
    val supNation = broadcast(table(spark, dir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("s_nation")))
    table(spark, dir, "lineitem")
      .join(table(spark, dir, "part").where(col("p_type") === "PROMO")
        .select(col("p_partkey")), col("l_partkey") === col("p_partkey"))
      .join(table(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(table(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(amNations, col("c_nationkey") === col("c_nk"))
      .join(table(spark, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .join(supNation, col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("s_nation") === "NATION_6", rev).otherwise(0L))
          .as("nation_cents"),
        sum(rev).as("total_cents"))
      .select(col("o_year"), col("nation_cents"), col("total_cents"),
        round(col("nation_cents").cast("double") /
          col("total_cents").cast("double"), 6).as("mkt_share"))
  }

  /** TPC-H Q21 shape — sole-late-supplier detection: suppliers whose
    * shipment was >60 days late on orders where ANOTHER supplier also
    * participated but NOBODY ELSE was late. The double-correlated
    * EXISTS / NOT EXISTS decorrelation stress (Catalyst rewrites both
    * into semi/anti joins — PlanShapeSpec pins it); counts are DISTINCT
    * orders so multi-line orders don't double-bill. */
  def q222SoleLate(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "lineitem").createOrReplaceTempView("q222_lineitem")
    table(spark, dir, "orders").createOrReplaceTempView("q222_orders")
    spark.sql(
      """SELECT l1.l_suppkey AS s_suppkey,
        |  count(DISTINCT o.o_orderkey) AS numwait
        |FROM q222_lineitem l1
        |JOIN q222_orders o ON l1.l_orderkey = o.o_orderkey
        |WHERE datediff(l1.l_shipdate, o.o_orderdate) > 60
        |  AND EXISTS (SELECT 1 FROM q222_lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM q222_lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND datediff(l3.l_shipdate, o.o_orderdate) > 60)
        |GROUP BY l1.l_suppkey""".stripMargin)
  }

  /** TPC-H Q20 shape — volume-threshold semi-join: suppliers whose total
    * shipped quantity exceeds 1% of the corpus total, found via
    * `IN (aggregated subquery)` plus an uncorrelated scalar threshold —
    * the remaining subquery surface next to q103 (correlated scalar) and
    * q222 (correlated EXISTS). Catalyst turns the IN into a semi-join
    * against the aggregate and the scalar into a one-row broadcast. */
  def q226VolumeSuppliers(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "lineitem").createOrReplaceTempView("q226_lineitem")
    table(spark, dir, "supplier").createOrReplaceTempView("q226_supplier")
    spark.sql(
      """SELECT s_suppkey, s_name
        |FROM q226_supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM q226_lineitem
        |  GROUP BY l_suppkey
        |  HAVING sum(cast(l_quantity as bigint)) > (
        |    SELECT sum(cast(l_quantity as bigint)) / 100
        |    FROM q226_lineitem))""".stripMargin)
  }

  /** ABC (Pareto) inventory classification: parts ranked by revenue,
    * classed A (first 70% of cumulative revenue), B (to 90%), C (rest).
    * Exact integer cents throughout — cumulative shares are ratios of
    * exact longs, and the window's cumulative sum is deterministic under
    * the (revenue DESC, partkey) total order. */
  def q229Abc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val revCents =
      round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
        .cast("long")
    val perPart = table(spark, dir, "lineitem")
      .groupBy(col("l_partkey")).agg(sum(revCents).as("cents"))
    val total = perPart.agg(sum(col("cents")).as("__t"))
    val w = Window.orderBy(col("cents").desc, col("l_partkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perPart.crossJoin(broadcast(total))
      .select(col("l_partkey"), col("cents"),
        (sum(col("cents")).over(w) * 100L).as("__cum100"), col("__t"))
      .select(col("l_partkey"), col("cents"),
        // integer threshold compare: cum·100 vs t·70 / t·90 — no floats
        when(col("__cum100") <= col("__t") * 70L, "A")
          .when(col("__cum100") <= col("__t") * 90L, "B")
          .otherwise("C").as("abc_class"))
  }

  /** Per-priority daily revenue with LINEAR INTERPOLATION over missing
    * days: the dense day spine (q68's sequence technique) carries
    * observed integer cents; gaps fill with
    * `round(prev + (next − prev)·offset/gaplen)` — the division runs in
    * doubles over EXACTLY representable integers with one identical IEEE
    * expression tree in both engines (integer `div` would hit the
    * truncate-vs-floor divergence on negative slopes), so the
    * interpolated series replays bit-for-bit. Edges (before first /
    * after last observation) stay null. */
  def q230Interpolate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = table(spark, dir, "orders")
      // sparsify deterministically so there ARE gaps to interpolate
      .where(pmod(col("o_orderkey"), lit(7)) === 0)
      .groupBy(col("o_orderpriority"),
        col("o_orderdate").cast("date").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val bounds = daily.groupBy(col("o_orderpriority"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val spine = bounds.select(col("o_orderpriority"),
      explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val sparse = spine.join(daily, Seq("o_orderpriority", "day"),
      "left_outer")
    val wAll = Window.partitionBy(col("o_orderpriority")).orderBy(col("day"))
    val prevV = last(col("cents"), ignoreNulls = true)
      .over(wAll.rowsBetween(Window.unboundedPreceding, -1))
    val nextV = first(col("cents"), ignoreNulls = true)
      .over(wAll.rowsBetween(1, Window.unboundedFollowing))
    val prevD = last(when(col("cents").isNotNull, col("day")),
      ignoreNulls = true).over(wAll.rowsBetween(Window.unboundedPreceding, -1))
    val nextD = first(when(col("cents").isNotNull, col("day")),
      ignoreNulls = true).over(wAll.rowsBetween(1, Window.unboundedFollowing))
    sparse.select(col("o_orderpriority"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("cents").isNotNull.as("observed"),
        coalesce(col("cents"),
          when(prevV.isNotNull && nextV.isNotNull,
            round(prevV.cast("double") +
              (nextV - prevV).cast("double") *
                datediff(col("day"), prevD).cast("double") /
                datediff(nextD, prevD).cast("double"))
              .cast("long"))).as("cents"))
  }

  /** Quantity-WEIGHTED median unit price per return flag: the smallest
    * price whose cumulative quantity reaches half the total — spelled as
    * one cumulative window over exact integer weights, never a
    * percentile buffer.
    *
    * Round 9 (guide §2.3): the old (orderkey, line) tie-break only ordered
    * rows WITHIN a price group, which the result provably cannot observe —
    * whether any row of a price group satisfies `cw·2 ≥ tw` is decided by
    * the group's LAST row, whose cumulative weight is the group-end total
    * regardless of intra-group order. Dropping the two tie-break columns
    * narrows every row crossing the window exchange by 16 bytes and
    * shortens the sort key to one long. (A groupBy(price) pre-aggregate
    * was measured SLOWER at sf0.1 — extendedprice is near-unique, so the
    * extra exchange bought no reduction.) */
  def q231WeightedMedian(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = table(spark, dir, "lineitem").select(col("l_returnflag"),
      round(col("l_extendedprice") * 100).cast("long").as("price_cents"),
      col("l_quantity").cast("long").as("qty"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("price_cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy(col("l_returnflag"))
    val cum = li.select(col("l_returnflag"), col("price_cents"),
      sum(col("qty")).over(w).as("cw"), sum(col("qty")).over(wt).as("tw"))
    cum.where(col("cw") * 2L >= col("tw"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("price_cents")).as("wmedian_cents"))
  }

  /** Percent-of-parent hierarchy report: nation revenue with its share
    * of the REGION subtotal and of the grand total — the drill-down
    * ratio every BI layer renders. One aggregate + two window sums over
    * the (tiny) aggregate frame; shares are single divisions of exact
    * longs, rounded to 6. */
  def q233PercentOfParent(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = sum(round(col("o_totalprice") * 100).cast("long"))
    val perNation = table(spark, dir, "orders")
      .join(table(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(table(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(table(spark, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(cents.as("cents"))
    val wr = Window.partitionBy(col("r_name"))
    val wg = Window.partitionBy()
    perNation.select(col("r_name"), col("n_name"), col("cents"),
      round(col("cents").cast("double") /
        sum(col("cents")).over(wr).cast("double"), 6).as("share_of_region"),
      round(col("cents").cast("double") /
        sum(col("cents")).over(wg).cast("double"), 6).as("share_of_total"))
  }

  /** Rolling 7-day ACTIVE USERS per day (the WAU curve): each distinct
    * (user, active-day) contributes to the 7 window-days it covers —
    * explode-by-coverage turns a sliding DISTINCT (inexpressible as a
    * window aggregate) into one distinct + one ×7 explode + one count,
    * linear in activity and exactly right. Day spine from the events
    * range so zero-activity days would still appear. */
  def q234RollingActive(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      .select(col("user_id"),
        to_date(timestamp_micros(expr("ts div 1000"))).as("d"))
      .distinct()
    val covered = ev.select(col("user_id"),
        explode(expr("sequence(d, date_add(d, 6), interval 1 day)"))
          .as("window_day"))
      .distinct()
    val bounds = table(spark, dir, "events")
      .agg(to_date(timestamp_micros(expr("min(ts) div 1000"))).as("d0"),
        to_date(timestamp_micros(expr("max(ts) div 1000"))).as("d1"))
    val spine = bounds.select(
      explode(expr("sequence(d0, d1, interval 1 day)")).as("window_day"))
    spine.join(covered, Seq("window_day"), "left_outer")
      .groupBy(col("window_day"))
      .agg(count(col("user_id")).as("active_7d"))
      .select(date_format(col("window_day"), "yyyy-MM-dd").as("day"),
        col("active_7d"))
  }

  /** TPC-H Q2 shape — min-cost supplier per part: the correlated
    * scalar-min equality in WHERE (`unit = (SELECT min(unit) … same
    * part)`), decorrelated by Catalyst into an aggregate join. Unit cost
    * is EXACT integer `cents div qty` so the equality can never miss on
    * a ulp; ties legitimately return multiple suppliers. Bounded to
    * small parts (p_size < 10) — Q2's filtered-dimension character. */
  def q235MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "lineitem").createOrReplaceTempView("q235_lineitem")
    table(spark, dir, "part").createOrReplaceTempView("q235_part")
    spark.sql(
      """SELECT p.p_partkey, l.l_suppkey,
        |  cast(round(l.l_extendedprice * 100) as bigint)
        |    div cast(l.l_quantity as bigint) AS unit_cents
        |FROM q235_part p JOIN q235_lineitem l ON l.l_partkey = p.p_partkey
        |WHERE p.p_size < 10
        |  AND cast(round(l.l_extendedprice * 100) as bigint)
        |        div cast(l.l_quantity as bigint) = (
        |    SELECT min(cast(round(l2.l_extendedprice * 100) as bigint)
        |               div cast(l2.l_quantity as bigint))
        |    FROM q235_lineitem l2 WHERE l2.l_partkey = p.p_partkey)""".stripMargin)
  }

  /** TPC-H Q17 shape — small-quantity revenue: lineitems below 50% of
    * their part's average quantity, summed. The correlated AVG is exact
    * despite being float: quantities are integral doubles, so partial
    * sums are exact integers in IEEE and the average is
    * order-independent in both engines. One row out. */
  def q236SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "lineitem").createOrReplaceTempView("q236_lineitem")
    spark.sql(
      """SELECT count(*) AS n_lines,
        |  sum(cast(round(l_extendedprice * 100) as bigint)) AS cents
        |FROM q236_lineitem l1
        |WHERE l_quantity < (
        |  SELECT 0.5 * avg(l_quantity) FROM q236_lineitem l2
        |  WHERE l2.l_partkey = l1.l_partkey)""".stripMargin)
  }

  /** TPC-H Q22 shape — idle high-balance customers: above the average
    * positive balance yet WITHOUT any large (>\$350k) order, grouped by
    * a derived segment code. Anti-EXISTS over a filtered subquery +
    * uncorrelated scalar AVG in one query; balances in integral cents
    * so the scalar threshold is order-independent. (Every customer in
    * this corpus has SOME order, so the classic no-order spelling is
    * vacuous — the large-order variant keeps Q22's plan shape with a
    * non-empty answer.) */
  def q237IdleCustomers(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "customer").createOrReplaceTempView("q237_customer")
    table(spark, dir, "orders").createOrReplaceTempView("q237_orders")
    spark.sql(
      """SELECT cast(c_custkey % 10 as bigint) AS code,
        |  count(*) AS n_cust,
        |  sum(cast(round(c_acctbal * 100) as bigint)) AS cents
        |FROM q237_customer c
        |WHERE cast(round(c_acctbal * 100) as bigint) > (
        |    SELECT avg(cast(round(c_acctbal * 100) as bigint))
        |    FROM q237_customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM q237_orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 350000.0)
        |GROUP BY 1""".stripMargin)
  }

  /** TPC-H Q4 shape — order-priority checking: 1997 orders with AT LEAST
    * ONE late lineitem (shipped >60 days after order date), counted per
    * priority. The EXISTS-with-correlated-predicate shape at order
    * grain; Catalyst plans the semi-join so multi-late orders never
    * double-count. */
  def q238LateOrders(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "lineitem").createOrReplaceTempView("q238_lineitem")
    table(spark, dir, "orders").createOrReplaceTempView("q238_orders")
    spark.sql(
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM q238_orders o
        |WHERE o_orderdate >= timestamp'1997-01-01'
        |  AND o_orderdate < timestamp'1998-01-01'
        |  AND EXISTS (SELECT 1 FROM q238_lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND datediff(l.l_shipdate, o.o_orderdate) > 60)
        |GROUP BY 1""".stripMargin)
  }

  /** TPC-H Q11 shape — important stock: (nation, part) revenue groups
    * whose value exceeds 0.01% of the GLOBAL total — HAVING against an
    * uncorrelated scalar over the same aggregate; exact integer cents
    * on both sides of the comparison (threshold stays integral via
    * `total div 10000`). */
  def q239ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "lineitem").createOrReplaceTempView("q239_lineitem")
    table(spark, dir, "supplier").createOrReplaceTempView("q239_supplier")
    spark.sql(
      """WITH v AS (SELECT s_nationkey, l_partkey,
        |    sum(cast(round(l_extendedprice * 100) as bigint)) AS cents
        |  FROM q239_lineitem JOIN q239_supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2)
        |SELECT s_nationkey, l_partkey, cents
        |FROM v
        |WHERE cents > (SELECT sum(cents) div 10000 FROM v)""".stripMargin)
  }

  /** TPC-H Q7 shape — bi-nation shipping volume: revenue flowing
    * supplier-nation → customer-nation for the ordered pair set
    * {(N_1,N_2), (N_2,N_1)}, per year — the two-alias join graph where
    * the SAME dimension joins twice under different roles, plus the
    * symmetric-pair disjunction. */
  def q240BiNationVolume(spark: SparkSession, dir: String): DataFrame = {
    val rev = round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      * 100).cast("long")
    val suppNation = broadcast(table(spark, dir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val custNation = broadcast(table(spark, dir, "nation")
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
    table(spark, dir, "lineitem")
      .join(table(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(table(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(table(spark, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .join(suppNation, col("s_nationkey") === col("s_nk"))
      .join(custNation, col("c_nationkey") === col("c_nk"))
      .where((col("supp_nation") === "NATION_1" &&
          col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" &&
          col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(count(lit(1)).as("n_lines"), sum(rev).as("rev_cents"))
  }

  /** TPC-H Q3 shape — top unshipped-value orders: BUILDING-segment
    * orders placed before mid-1997 with revenue from lineitems shipped
    * AFTER it, top 10 by revenue with (revenue DESC, orderkey) ties
    * pinned — the classic shipping-priority report. */
  def q241ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val rev = round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      * 100).cast("long")
    val cut = lit("1997-07-01").cast("timestamp")
    table(spark, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      .join(table(spark, dir, "orders").where(col("o_orderdate") < cut),
        col("c_custkey") === col("o_custkey"))
      .join(table(spark, dir, "lineitem").where(col("l_shipdate") > cut),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
        col("o_orderpriority"))
      .agg(sum(rev).as("rev_cents"))
      .orderBy(col("rev_cents").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q6 shape — forecasting revenue change: one narrow
    * filter-and-sum over the fact table (1997, discount 0.05–0.07,
    * quantity < 24), no join at all — the canonical pushdown probe.
    * Discount values are exact hundredths; compare on integer
    * `round(discount·100)` so the BETWEEN never straddles a ulp. */
  def q242ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        round(col("l_discount") * 100).cast("long").between(5, 7) &&
        col("l_quantity") < 24.0)
      .agg(count(lit(1)).as("n_lines"),
        sum(round(col("l_extendedprice") * col("l_discount") * 100)
          .cast("long")).as("discount_cents"))

  /** TPC-H Q14 shape — promo revenue share: the conditional-aggregate
    * ratio (PROMO part revenue over all revenue) for one month — CASE
    * inside SUM over a fact⋈dim join, one double division of exact
    * longs at the end. */
  def q243PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val rev = round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      * 100).cast("long")
    table(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .join(table(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev).otherwise(0L))
          .as("promo_cents"),
        sum(rev).as("total_cents"))
      .select(col("promo_cents"), col("total_cents"),
        round(col("promo_cents").cast("double") * 100.0 /
          col("total_cents").cast("double"), 6).as("promo_pct"))
  }

  /** TPC-H Q10 shape — returned-item reporting: the revenue a quarter's
    * RETURNS ('R' lines) cost, per customer with nation context, top 20.
    * Plan shape: the date predicate prunes orders at the scan, the
    * returnflag predicate prunes lineitem; customer⋈nation broadcasts;
    * the one shuffle is the customer-grain aggregate; top-20 is a
    * TakeOrderedAndProject (never a full sort) with a deterministic
    * (rev desc, custkey) tiebreak. */
  def q246ReturnedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val rev = round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      * 100).cast("long")
    table(spark, dir, "customer")
      .join(table(spark, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .join(table(spark, dir, "orders"), col("o_custkey") === col("c_custkey"))
      .join(table(spark, dir, "lineitem"),
        col("l_orderkey") === col("o_orderkey"))
      .where(col("l_returnflag") === "R" &&
        col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
      .groupBy(col("c_custkey"), col("c_mktsegment"), col("n_name"))
      .agg(sum(rev).as("lost_cents"), count(lit(1)).as("n_lines"))
      .orderBy(col("lost_cents").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** TPC-H Q18 shape — large-volume orders: orders whose total quantity
    * clears 250 (top ~1% of the per-order distribution), with their
    * customer. The HAVING-on-aggregate classic: one order-grain
    * aggregate, the filter applied post-agg (Catalyst folds it into the
    * aggregate's output), then a broadcast join to customer — the big
    * fact aggregates BEFORE touching the dimension. Quantities sum as
    * exact integers. */
  def q247BigOrders(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"),
        count(lit(1)).as("n_lines"))
      .where(col("total_qty") > 250L)
      .join(table(spark, dir, "orders"),
        col("o_orderkey") === col("l_orderkey"))
      .join(table(spark, dir, "customer"),
        col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_day"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"),
        col("total_qty"), col("n_lines"))

  /** TPC-H Q19 shape — disjunctive bracket predicates: three (brand,
    * size-range, quantity-range) OR-branches over the lineitem⋈part
    * join, one global revenue total. The shape exercises OR pushdown:
    * Catalyst extracts the common `p_brand IN (...)` + range envelope
    * into scan-level filters on BOTH sides before the join evaluates the
    * full disjunction — predicate simplification the reference's U-SQL
    * optimizer also performed. */
  def q248BrandBrackets(spark: SparkSession, dir: String): DataFrame = {
    val rev = round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      * 100).cast("long")
    val qty = col("l_quantity")
    val branch1 = col("p_brand") === "Brand#12" &&
      col("p_size").between(1, 15) && qty >= 1.0 && qty <= 15.0
    val branch2 = col("p_brand") === "Brand#23" &&
      col("p_size").between(1, 25) && qty >= 10.0 && qty <= 25.0
    val branch3 = col("p_brand") === "Brand#34" &&
      col("p_size").between(1, 35) && qty >= 20.0 && qty <= 35.0
    table(spark, dir, "lineitem")
      .join(table(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
      .where(branch1 || branch2 || branch3)
      .agg(sum(rev).as("rev_cents"), count(lit(1)).as("n_lines"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q246_returned_revenue" -> q246ReturnedRevenue,
    "q247_big_orders" -> q247BigOrders,
    "q248_brand_brackets" -> q248BrandBrackets,
    "q241_shipping_priority" -> q241ShippingPriority,
    "q242_forecast_revenue" -> q242ForecastRevenue,
    "q243_promo_share" -> q243PromoShare,
    "q238_late_orders" -> q238LateOrders,
    "q239_important_stock" -> q239ImportantStock,
    "q240_binational_volume" -> q240BiNationVolume,
    "q235_min_cost_supplier" -> q235MinCostSupplier,
    "q236_small_qty_revenue" -> q236SmallQtyRevenue,
    "q237_idle_customers" -> q237IdleCustomers,
    "q233_percent_of_parent" -> q233PercentOfParent,
    "q234_rolling_active" -> q234RollingActive,
    "q229_abc" -> q229Abc,
    "q230_interpolate" -> q230Interpolate,
    "q231_weighted_median" -> q231WeightedMedian,
    "q226_volume_suppliers" -> q226VolumeSuppliers,
    "q208_recursive_cte" -> q208RecursiveCte,
    "q209_spearman" -> q209Spearman,
    "q212_survival" -> q212Survival,
    "q214_dp_release" -> q214DpRelease,
    "q220_time_decay" -> q220TimeDecay,
    "q221_market_share" -> q221MarketShare,
    "q222_sole_late" -> q222SoleLate,
    "q207_salted_join" -> q207SaltedJoin,
    "q200_warehouse_checksum" -> q200WarehouseChecksum,
    "q194_holt_winters" -> q194HoltWinters,
    "q195_k_anonymity" -> q195KAnonymity,
    "q196_trigrams" -> q196Trigrams,
    "q198_custdist" -> q198Custdist,
    "q199_top_supplier" -> q199TopSupplier,
    "q153_ohlc" -> q153Ohlc,
    "q144_pmi" -> q144Pmi,
    "q141_twap" -> q141Twap,
    "q142_bounce" -> q142Bounce,
    "q134_attribution" -> q134Attribution,
    "q136_activity_grid" -> q136ActivityGrid,
    "q98_chunking" -> q98Chunking,
    "q99_ngram_freq" -> q99NgramFreq,
    "q100_grouping_sets" -> q100GroupingSets,
    "q101_skyline" -> q101Skyline,
    "q102_histogram" -> q102Histogram,
    "q103_correlated" -> q103Correlated,
    "q104_regional_revenue" -> q104RegionalRevenue,
    "q105_seasonal_anomaly" -> q105SeasonalAnomaly,
    "q106_fuzzy_dedup" -> q106FuzzyDedup,
    "q107_unpivot" -> q107Unpivot,
    "q108_transitions" -> q108Transitions,
    "q109_running_distinct" -> q109RunningDistinct,
    "q110_benford" -> q110Benford,
    "q111_moving_median" -> q111MovingMedian,
    "q112_survivorship" -> q112Survivorship,
    "q113_set_ops_all" -> q113SetOpsAll,
    "q114_lateral" -> q114Lateral,
    "q115_equidepth" -> q115EquiDepth,
    "q116_chisquare" -> q116ChiSquare,
    "q117_gaps_islands" -> q117GapsIslands,
    "q118_variant" -> q118Variant,
    "q119_filter_agg" -> q119FilterAgg,
    "q120_pseudonymize" -> q120Pseudonymize,
    "q121_flat_json" -> q121FlatJson
  )

  val oracles: Map[String, String] = Map(
    "q246_returned_revenue" ->
      """SELECT c_custkey, c_mktsegment, n_name,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |      AS BIGINT)) AS BIGINT) AS lost_cents,
        |  count(*) AS n_lines
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1995-04-01'
        |GROUP BY 1, 2, 3
        |ORDER BY lost_cents DESC, c_custkey ASC LIMIT 20""".stripMargin,
    "q247_big_orders" ->
      """WITH q AS (SELECT l_orderkey,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
        |    count(*) AS n_lines
        |  FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS BIGINT)) > 250)
        |SELECT c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_day,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
        |  total_qty, n_lines
        |FROM q JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey""".stripMargin,
    "q248_brand_brackets" ->
      """SELECT
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |      AS BIGINT)) AS BIGINT) AS rev_cents,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 15)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 10 AND 25)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity BETWEEN 20 AND 35)""".stripMargin,
    // DuckDB runs the SAME recursion: integer month indexes, zero-filled
    // LEFT JOIN; only printf vs format_string spelling differs
    "q208_recursive_cte" ->
      """WITH RECURSIVE months AS (
        |  SELECT mn AS mi, mx FROM (
        |    SELECT min(year(o_orderdate) * 12 + month(o_orderdate) - 1) AS mn,
        |           max(year(o_orderdate) * 12 + month(o_orderdate) - 1) AS mx
        |    FROM orders) t
        |  UNION ALL
        |  SELECT mi + 1, mx FROM months WHERE mi < mx),
        |agg AS (
        |  SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS mi,
        |         count(*) AS n_orders,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |           AS cents
        |  FROM orders GROUP BY 1)
        |SELECT printf('%04d-%02d', mi // 12, mi % 12 + 1) AS month,
        |  CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
        |  CAST(coalesce(cents, 0) AS BIGINT) AS cents
        |FROM months LEFT JOIN agg USING (mi)""".stripMargin,
    // doubled tie-averaged ranks are integers; the ρ formula runs once
    // over exact BIGINT sums — identical IEEE expression both engines
    "q209_spearman" ->
      """WITH r AS (SELECT l_returnflag,
        |    2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
        |      + count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1 AS rx,
        |    2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
        |      + count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1 AS ry
        |  FROM lineitem),
        |s AS (SELECT l_returnflag, count(*) AS n,
        |    sum(rx) sx, sum(ry) sy,
        |    sum(rx * rx) sxx, sum(ry * ry) syy, sum(rx * ry) sxy
        |  FROM r GROUP BY 1)
        |SELECT l_returnflag, n AS n_pairs,
        |  round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
        |    (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) *
        |     sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 6)
        |    AS spearman
        |FROM s""".stripMargin,
    // top-10 with the SAME (rev DESC, orderkey) total order
    "q241_shipping_priority" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        |  o_orderpriority,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |  AND l_shipdate > TIMESTAMP '1997-07-01'
        |GROUP BY 1, 2, 3
        |ORDER BY rev_cents DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    // integer-hundredths discount band — the BETWEEN never ulp-straddles
    "q242_forecast_revenue" ->
      """SELECT count(*) AS n_lines,
        |  CAST(sum(CAST(round(l_extendedprice * l_discount * 100)
        |    AS BIGINT)) AS BIGINT) AS discount_cents
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
        |  AND l_quantity < 24""".stripMargin,
    "q243_promo_share" ->
      """SELECT
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |      AS BIGINT) ELSE 0 END) AS BIGINT) AS promo_cents,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS total_cents,
        |  round(sum(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |        AS BIGINT) ELSE 0 END)::DOUBLE * 100.0
        |    / sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |        AS BIGINT))::DOUBLE, 6) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-03-01'
        |  AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin,
    "q238_late_orders" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND date_diff('day', o.o_orderdate, l.l_shipdate) > 60)
        |GROUP BY 1""".stripMargin,
    // HAVING vs a global scalar: integral threshold via // 10000
    "q239_important_stock" ->
      """WITH v AS (SELECT s_nationkey, l_partkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2)
        |SELECT s_nationkey, l_partkey, cents
        |FROM v
        |WHERE cents > (SELECT CAST(sum(cents) AS BIGINT) // 10000 FROM v)""".stripMargin,
    "q240_binational_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  year(o_orderdate) AS o_year, count(*) AS n_lines,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        |   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
        |GROUP BY 1, 2, 3""".stripMargin,
    // DuckDB // on non-negative cents ≡ Spark div
    "q235_min_cost_supplier" ->
      """SELECT p.p_partkey, l.l_suppkey,
        |  CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |    // CAST(l.l_quantity AS BIGINT) AS unit_cents
        |FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
        |WHERE p.p_size < 10
        |  AND CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |        // CAST(l.l_quantity AS BIGINT) = (
        |    SELECT min(CAST(round(l2.l_extendedprice * 100) AS BIGINT)
        |               // CAST(l2.l_quantity AS BIGINT))
        |    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)""".stripMargin,
    // integral-double AVG is order-independent (exact IEEE partial sums)
    "q236_small_qty_revenue" ->
      """SELECT count(*) AS n_lines,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents
        |FROM lineitem l1
        |WHERE l_quantity < (
        |  SELECT 0.5 * avg(l_quantity) FROM lineitem l2
        |  WHERE l2.l_partkey = l1.l_partkey)""".stripMargin,
    "q237_idle_customers" ->
      """SELECT CAST(c_custkey % 10 AS BIGINT) AS code,
        |  count(*) AS n_cust,
        |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |    AS cents
        |FROM customer c
        |WHERE CAST(round(c_acctbal * 100) AS BIGINT) > (
        |    SELECT avg(CAST(round(c_acctbal * 100) AS BIGINT))
        |    FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 350000.0)
        |GROUP BY 1""".stripMargin,
    "q233_percent_of_parent" ->
      """WITH pn AS (SELECT r_name, n_name,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2)
        |SELECT r_name, n_name, cents,
        |  round(cents::DOUBLE / CAST(sum(cents) OVER (PARTITION BY r_name)
        |    AS BIGINT)::DOUBLE, 6) AS share_of_region,
        |  round(cents::DOUBLE / CAST(sum(cents) OVER ()
        |    AS BIGINT)::DOUBLE, 6) AS share_of_total
        |FROM pn""".stripMargin,
    // explode-by-coverage: each (user, active day) feeds the 7 window
    // days it covers; sliding DISTINCT becomes distinct + count
    "q234_rolling_active" ->
      """WITH ev AS (SELECT DISTINCT user_id, ts::DATE AS d FROM events),
        |cov AS (SELECT DISTINCT user_id, wd FROM (
        |  SELECT user_id,
        |    unnest(generate_series(d, d + INTERVAL 6 DAY,
        |      INTERVAL 1 DAY))::DATE AS wd
        |  FROM ev) t),
        |b AS (SELECT min(ts::DATE) d0, max(ts::DATE) d1 FROM events),
        |sp AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE
        |         AS wd FROM b)
        |SELECT strftime(sp.wd, '%Y-%m-%d') AS day,
        |  CAST(count(cov.user_id) AS BIGINT) AS active_7d
        |FROM sp LEFT JOIN cov ON sp.wd = cov.wd
        |GROUP BY 1""".stripMargin,
    // integer-threshold ABC: cum·100 vs total·70/90 — no float shares
    "q229_abc" ->
      """WITH p AS (SELECT l_partkey,
        |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |      AS BIGINT)) AS BIGINT) cents
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(sum(cents) AS BIGINT) tt FROM p),
        |c AS (SELECT l_partkey, cents,
        |    CAST(sum(cents) OVER (ORDER BY cents DESC, l_partkey
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) * 100 cum100, tt
        |  FROM p CROSS JOIN t)
        |SELECT l_partkey, cents,
        |  CASE WHEN cum100 <= tt * 70 THEN 'A'
        |       WHEN cum100 <= tt * 90 THEN 'B'
        |       ELSE 'C' END AS abc_class
        |FROM c""".stripMargin,
    // same spine + neighbor windows; interpolation is one IEEE tree over
    // exact integers, identical in both engines
    "q230_interpolate" ->
      """WITH d AS (SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      cents
        |  FROM orders WHERE o_orderkey % 7 = 0 GROUP BY 1, 2),
        |b AS (SELECT o_orderpriority, min(day) d0, max(day) d1
        |      FROM d GROUP BY 1),
        |sp AS (SELECT o_orderpriority,
        |    unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        |  FROM b),
        |s AS (SELECT sp.o_orderpriority, sp.day, d.cents
        |      FROM sp LEFT JOIN d USING (o_orderpriority, day)),
        |n AS (SELECT *,
        |    last_value(cents IGNORE NULLS) OVER
        |      (PARTITION BY o_orderpriority ORDER BY day
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) pv,
        |    first_value(cents IGNORE NULLS) OVER
        |      (PARTITION BY o_orderpriority ORDER BY day
        |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) nv,
        |    last_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER (PARTITION BY o_orderpriority ORDER BY day
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) pd,
        |    first_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER (PARTITION BY o_orderpriority ORDER BY day
        |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) nd
        |  FROM s)
        |SELECT o_orderpriority, strftime(day, '%Y-%m-%d') AS day,
        |  (cents IS NOT NULL) AS observed,
        |  coalesce(cents,
        |    CASE WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
        |      CAST(round(pv::DOUBLE + (nv - pv)::DOUBLE
        |        * date_diff('day', pd, day)::DOUBLE
        |        / date_diff('day', pd, nd)::DOUBLE) AS BIGINT) END)
        |    AS cents
        |FROM n""".stripMargin,
    // smallest price whose cumulative qty reaches half the total
    "q231_weighted_median" ->
      """WITH li AS (SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) price_cents,
        |    CAST(l_quantity AS BIGINT) qty, l_orderkey, l_linenumber
        |  FROM lineitem),
        |c AS (SELECT l_returnflag, price_cents,
        |    CAST(sum(qty) OVER (PARTITION BY l_returnflag
        |      ORDER BY price_cents, l_orderkey, l_linenumber
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) cw,
        |    CAST(sum(qty) OVER (PARTITION BY l_returnflag) AS BIGINT) tw
        |  FROM li)
        |SELECT l_returnflag, CAST(min(price_cents) AS BIGINT)
        |  AS wmedian_cents
        |FROM c WHERE cw * 2 >= tw GROUP BY 1""".stripMargin,
    // quantities are integral doubles (corpus-verified), so the BIGINT
    // casts agree despite truncate-vs-round cast semantics
    "q226_volume_suppliers" ->
      """SELECT s_suppkey, s_name
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  GROUP BY l_suppkey
        |  HAVING sum(CAST(l_quantity AS BIGINT)) > (
        |    SELECT sum(CAST(l_quantity AS BIGINT)) / 100
        |    FROM lineitem))""".stripMargin,
    // dyadic half-life decay: integer divide by 1<<k — exact both engines
    "q220_time_decay" ->
      """WITH r AS (SELECT max(o_orderdate) horizon FROM orders),
        |d AS (SELECT o_orderpriority,
        |    CAST(round(o_totalprice * 100) AS BIGINT) cents,
        |    date_diff('day', o_orderdate, horizon) // 30 AS k
        |  FROM orders CROSS JOIN r)
        |SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(cents // (1::BIGINT << least(k, 62)::INT)) AS BIGINT)
        |    AS decayed_cents
        |FROM d GROUP BY 1""".stripMargin,
    "q221_market_share" ->
      """WITH am AS (SELECT n_nationkey FROM nation JOIN region
        |    ON n_regionkey = r_regionkey WHERE r_name = 'AMERICA'),
        |j AS (SELECT year(o_orderdate) o_year, sn.n_name s_nation,
        |    CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |      AS BIGINT) rev
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN am ON c_nationkey = am.n_nationkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey)
        |SELECT o_year,
        |  CAST(sum(CASE WHEN s_nation = 'NATION_6' THEN rev ELSE 0 END)
        |    AS BIGINT) AS nation_cents,
        |  CAST(sum(rev) AS BIGINT) AS total_cents,
        |  round(sum(CASE WHEN s_nation = 'NATION_6' THEN rev ELSE 0 END)::DOUBLE
        |    / sum(rev)::DOUBLE, 6) AS mkt_share
        |FROM j GROUP BY 1""".stripMargin,
    "q222_sole_late" ->
      """SELECT l1.l_suppkey AS s_suppkey,
        |  count(DISTINCT o.o_orderkey) AS numwait
        |FROM lineitem l1
        |JOIN orders o ON l1.l_orderkey = o.o_orderkey
        |WHERE date_diff('day', o.o_orderdate, l1.l_shipdate) > 60
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND date_diff('day', o.o_orderdate, l3.l_shipdate) > 60)
        |GROUP BY l1.l_suppkey""".stripMargin,
    // identical mechanism replay: the 17-digit threshold literals parse
    // to the same doubles Spark embeds, the md5 uniform is exact dyadic
    "q214_dp_release" -> {
      val bound = 16
      val cases = graft.ops.Governance.dpThresholds(bound)
        .zip(-bound until bound)
        .map { case (t, k) =>
          s"WHEN uu < ${"%.17e".format(t)} THEN $k"
        }.mkString(" ")
      s"""WITH g AS (SELECT o_orderpriority, o_orderstatus, count(*) n
         |  FROM orders GROUP BY 1, 2),
         |u AS (SELECT *,
         |    (('0x' || substr(md5(o_orderpriority || '|' || o_orderstatus
         |        || '|' || 'dp'), 1, 15))::BIGINT)::DOUBLE
         |      / 1152921504606846976.0 AS uu
         |  FROM g)
         |SELECT o_orderpriority, o_orderstatus,
         |  CAST(greatest(n + CASE $cases ELSE $bound END, 0) AS BIGINT)
         |    AS noisy_count
         |FROM u""".stripMargin
    },
    // same product-limit chain: exact integer risk sets, factors folded
    // in ascending-t order (list_reduce's first-element seed ≡ Spark's
    // 1.0 seed since IEEE 1.0·f = f)
    "q212_survival" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) ts_us
        |  FROM events),
        |pu AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts_us END) tv,
        |    max(ts_us) tlast
        |  FROM ev GROUP BY 1),
        |pp AS (SELECT e.user_id, min(e.ts_us) tp
        |  FROM ev e JOIN pu USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts_us >= pu.tv AND pu.tv IS NOT NULL
        |  GROUP BY 1),
        |subj AS (SELECT (coalesce(tp, tlast) - tv) // 3600000000 AS t,
        |    CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
        |  FROM pu LEFT JOIN pp USING (user_id) WHERE tv IS NOT NULL),
        |tm AS (SELECT t, CAST(sum(ev) AS BIGINT) d, count(*) leav
        |  FROM subj GROUP BY 1),
        |r AS (SELECT t, d,
        |    (SELECT count(*) FROM subj)
        |      - (CAST(sum(leav) OVER (ORDER BY t) AS BIGINT) - leav) n
        |  FROM tm),
        |e AS (SELECT t, d, n, (n - d)::DOUBLE / n::DOUBLE f FROM r
        |  WHERE d > 0),
        |terms AS (SELECT list(struct_pack(t := t, f := f) ORDER BY t) ts
        |  FROM e),
        |idx AS (SELECT t, d, n,
        |    row_number() OVER (ORDER BY t) i FROM e)
        |SELECT idx.t, idx.n AS n_at_risk, idx.d AS n_events,
        |  round(list_reduce(
        |    list_transform(ts[1:idx.i], x -> x.f), (a, b) -> a * b), 6)
        |    AS survival
        |FROM idx CROSS JOIN terms""".stripMargin,
    // the salt is a plan detail — the oracle is the PLAIN join
    "q207_salted_join" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |      AS BIGINT)) AS BIGINT) AS rev_cents,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,
    // ten per-table (count, XOR, mod-sum) signatures over the same
    // canonical '|'-joined strings the engine hashes (q138 discipline)
    "q200_warehouse_checksum" -> {
      def block(name: String, from: String, rs: String) =
        s"""SELECT '$name' AS table_name, count(*) AS n_rows,
           |  bit_xor(h)::BIGINT AS xor_sig,
           |  sum(h % 1048573)::BIGINT AS sum_sig
           |FROM (SELECT ('0x' || substr(md5($rs), 1, 15))::BIGINT h
           |      FROM $from) t""".stripMargin
      Seq(
        block("region", "region", "r_regionkey::VARCHAR || '|' || r_name"),
        block("nation", "nation",
          "n_nationkey::VARCHAR || '|' || n_name || '|' || n_regionkey::VARCHAR"),
        block("customer", "customer",
          "c_custkey::VARCHAR || '|' || c_nationkey::VARCHAR || '|' || " +
            "CAST(round(c_acctbal * 100) AS BIGINT)::VARCHAR || '|' || c_mktsegment"),
        block("supplier", "supplier",
          "s_suppkey::VARCHAR || '|' || s_name || '|' || " +
            "s_nationkey::VARCHAR || '|' || CAST(round(s_acctbal * 100) AS BIGINT)::VARCHAR"),
        block("part", "part",
          "p_partkey::VARCHAR || '|' || p_brand || '|' || p_size::VARCHAR"),
        block("orders", "orders",
          "o_orderkey::VARCHAR || '|' || o_custkey::VARCHAR || '|' || " +
            "o_orderstatus || '|' || CAST(round(o_totalprice * 100) AS BIGINT)::VARCHAR " +
            "|| '|' || strftime(o_orderdate, '%Y-%m-%d') || '|' || o_orderpriority"),
        block("lineitem", "lineitem",
          "l_orderkey::VARCHAR || '|' || l_linenumber::VARCHAR || '|' || " +
            "CAST(l_quantity AS BIGINT)::VARCHAR || '|' || " +
            "CAST(round(l_extendedprice * 100) AS BIGINT)::VARCHAR"),
        block("events", "events",
          "event_id::VARCHAR || '|' || user_id::VARCHAR || '|' || " +
            "event_type || '|' || epoch_us(ts)::VARCHAR"),
        block("documents", "documents",
          "doc_id::VARCHAR || '|' || md5(text) || '|' || lang || '|' || source"),
        block("embeddings", "embeddings",
          "vec_id::VARCHAR || '|' || label::VARCHAR || '|' || " +
            "len(embedding)::VARCHAR")
      ).mkString("\nUNION ALL\n")
    },
    "q198_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q199_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |        AS BIGINT)) AS BIGINT) AS total_rev_cents
        |  FROM lineitem
        |  WHERE l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_rev_cents
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev_cents = (SELECT max(total_rev_cents) FROM rev)""".stripMargin,
    "q195_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
        |  count(*) AS group_size,
        |  count(DISTINCT c_acctbal) AS l_diversity,
        |  count(*) < 20 AS k_violation,
        |  count(DISTINCT c_acctbal) <= 1 AS l_violation
        |FROM customer GROUP BY 1, 2""".stripMargin,
    "q196_trigrams" ->
      """WITH o AS (SELECT user_id, event_type,
        |    lag(event_type, 2) OVER w AS t1,
        |    lag(event_type, 1) OVER w AS t2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY epoch_us(ts), event_id))
        |SELECT t1, t2, event_type AS t3, count(*) AS n_seq
        |FROM o WHERE t1 IS NOT NULL GROUP BY 1, 2, 3
        |ORDER BY n_seq DESC, t1, t2, t3 LIMIT 20""".stripMargin,
    // integer micro-unit Holt-Winters: every smoothing step is a floor
    // division by a power of two (`//` ≡ arithmetic shift), replayed by a
    // rank-indexed recursive CTE carrying the rolling seasonal list
    "q194_holt_winters" ->
      """WITH RECURSIVE d AS (
        |  SELECT o_orderpriority AS priority, o_orderdate AS day,
        |         count(*) * 1000000 AS xm
        |  FROM orders GROUP BY 1, 2),
        |se AS (SELECT priority, xm, row_number() OVER (
        |         PARTITION BY priority ORDER BY day) AS rn FROM d),
        |mx AS (SELECT priority, max(rn) AS mx, count(*) AS n
        |       FROM se GROUP BY 1),
        |hw AS (
        |  SELECT priority, 1 AS rn, xm AS l, CAST(0 AS BIGINT) AS b,
        |    [CAST(0 AS BIGINT), 0, 0, 0, 0, 0, 0] AS s
        |  FROM se WHERE rn = 1
        |  UNION ALL
        |  SELECT h.priority, t.rn,
        |    (t.xm - h.s[1] + h.l + h.b) // 2,
        |    ((t.xm - h.s[1] + h.l + h.b) // 2 - h.l + 3 * h.b) // 4,
        |    list_append(h.s[2:7],
        |      (t.xm - (t.xm - h.s[1] + h.l + h.b) // 2 + 3 * h.s[1]) // 4)
        |  FROM hw h JOIN se t ON t.priority = h.priority
        |    AND t.rn = h.rn + 1)
        |SELECT h.priority, m.n AS n_obs, h.l AS level_micro,
        |  h.b AS trend_micro, h.l + h.b + h.s[1] AS forecast_micro
        |FROM hw h JOIN mx m ON h.priority = m.priority
        |  AND h.rn = m.mx""".stripMargin,
    "q153_ohlc" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) // 3600000000 hr,
        |    epoch_us(ts) ts_us, event_id,
        |    CAST(round("value" * 100) AS BIGINT) cents
        |  FROM events)
        |SELECT event_type, hr, count(*) AS n,
        |  (min(struct_pack(t := ts_us, e := event_id, c := cents))).c
        |    ::BIGINT AS open_c,
        |  (max(struct_pack(t := ts_us, e := event_id, c := cents))).c
        |    ::BIGINT AS close_c,
        |  max(cents)::BIGINT AS high_c, min(cents)::BIGINT AS low_c
        |FROM e GROUP BY 1, 2""".stripMargin,
    "q144_pmi" ->
      """WITH t AS (SELECT string_split(text, ' ') ts FROM documents
        |      WHERE len(string_split(text, ' ')) >= 2),
        |uni AS (SELECT tok, count(*)::BIGINT c FROM (
        |        SELECT unnest(ts) tok FROM t) WHERE tok <> '' GROUP BY 1),
        |tt AS (SELECT sum(c)::BIGINT t_tot FROM uni),
        |bgf AS (SELECT ts[i] word_a, ts[i + 1] word_b
        |      FROM t, UNNEST(generate_series(1, len(ts) - 1)) AS g(i)
        |      WHERE ts[i] <> '' AND ts[i + 1] <> ''),
        |bt AS (SELECT count(*)::BIGINT b_tot FROM bgf),
        |bi AS (SELECT word_a, word_b, count(*)::BIGINT n_pair FROM bgf
        |      GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT bi.word_a, bi.word_b, bi.n_pair,
        |  round(ln(bi.n_pair::DOUBLE * tt.t_tot * tt.t_tot /
        |    (bt.b_tot::DOUBLE * ua.c * ub.c)), 6) AS pmi
        |FROM bi JOIN uni ua ON bi.word_a = ua.tok
        |JOIN uni ub ON bi.word_b = ub.tok
        |CROSS JOIN tt CROSS JOIN bt
        |ORDER BY pmi DESC, word_a, word_b LIMIT 100""".stripMargin,
    "q141_twap" ->
      """WITH g AS (SELECT event_type,
        |    CAST(round("value" * 100) AS BIGINT) cents,
        |    lead(epoch_us(ts)) OVER (PARTITION BY event_type
        |      ORDER BY epoch_us(ts), event_id) - epoch_us(ts) gap_us
        |  FROM events)
        |SELECT event_type, count(*) n,
        |  round(sum(gap_us * cents)::BIGINT /
        |    sum(gap_us)::BIGINT::DOUBLE / 100.0, 6) AS twap,
        |  round(sum(gap_us)::BIGINT / 1000000.0, 6) AS span_s
        |FROM g WHERE gap_us IS NOT NULL GROUP BY 1""".stripMargin,
    "q142_bounce" ->
      """WITH s AS (SELECT user_id,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |      THEN 1 ELSE 0 END brk, epoch_us(ts) ts_us, event_id
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        |i AS (SELECT user_id, ts_us, sum(brk) OVER (PARTITION BY user_id
        |    ORDER BY event_id ROWS UNBOUNDED PRECEDING) session_id
        |  FROM s),
        |p AS (SELECT user_id, session_id, count(*) n_events,
        |    max(ts_us) - min(ts_us) dur_us
        |  FROM i GROUP BY 1, 2),
        |a AS (SELECT count(*)::BIGINT n_sessions,
        |    sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::BIGINT n_bounce,
        |    sum(n_events)::BIGINT n_events, sum(dur_us)::BIGINT dur_us
        |  FROM p)
        |SELECT n_sessions, n_bounce,
        |  round(n_bounce / n_sessions::DOUBLE, 6) AS bounce_rate,
        |  round(n_events / n_sessions::DOUBLE, 6) AS avg_events,
        |  round(dur_us / n_sessions::DOUBLE / 1000000.0, 6)
        |    AS avg_duration_s
        |FROM a""".stripMargin,
    "q134_attribution" ->
      """WITH x AS (SELECT event_type, "value",
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type
        |      END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) touch
        |  FROM events)
        |SELECT coalesce(touch, 'none') AS touch,
        |  count(*) AS n_purchases,
        |  sum(CAST(round("value" * 100) AS BIGINT))::BIGINT AS rev_cents
        |FROM x WHERE event_type = 'purchase' GROUP BY 1""".stripMargin,
    "q136_activity_grid" ->
      """SELECT (epoch_us(ts) // 1000000 // 86400 + 3) % 7 AS dow,
        |  epoch_us(ts) // 1000000 % 86400 // 3600 AS hr,
        |  count(*) AS n_events,
        |  sum(CAST(round("value" * 100) AS BIGINT))::BIGINT AS val_cents
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q98_chunking" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') ts FROM documents),
        |s AS (SELECT doc_id, u.i AS start_tok, ts[(u.i + 1):(u.i + 8)] AS c
        |      FROM t, UNNEST(generate_series(0, len(ts) - 1, 6)) AS u(i))
        |SELECT doc_id, start_tok // 6 AS chunk_idx, start_tok,
        |  len(c)::BIGINT AS n_tokens, array_to_string(c, ' ') AS chunk_text
        |FROM s""".stripMargin,
    "q99_ngram_freq" ->
      """WITH t AS (SELECT string_split(text, ' ') ts FROM documents),
        |g AS (SELECT array_to_string(ts[u.i:(u.i + 1)], ' ') AS ngram
        |      FROM t, UNNEST(generate_series(1, len(ts) - 1)) AS u(i)
        |      WHERE len(ts) >= 2)
        |SELECT ngram, count(*) AS n_occurrences FROM g GROUP BY ngram
        |ORDER BY n_occurrences DESC, ngram ASC LIMIT 100""".stripMargin,
    "q100_grouping_sets" ->
      """SELECT n_name, o_orderpriority,
        |  GROUPING(n_name)::BIGINT AS g_nation,
        |  GROUPING(o_orderpriority)::BIGINT AS g_prio,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name, o_orderpriority), (n_name), ())""".stripMargin,
    "q101_skyline" ->
      """SELECT p_partkey, p_retailprice, p_size FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice
        |    AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice
        |      OR q.p_size > p.p_size))""".stripMargin,
    "q102_histogram" ->
      """WITH b AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx
        |           FROM orders),
        |v AS (SELECT CASE WHEN mx = mn THEN 0
        |        ELSE CAST(least(floor((o_totalprice - mn) / ((mx - mn) / 20)),
        |                        19) AS BIGINT) END AS bucket, mn, mx
        |      FROM orders CROSS JOIN b)
        |SELECT bucket,
        |  round(mn + bucket * ((mx - mn) / 20), 6) AS lo,
        |  round(mn + (bucket + 1) * ((mx - mn) / 20), 6) AS hi,
        |  count(*) AS n
        |FROM v GROUP BY bucket, mn, mx""".stripMargin,
    "q103_correlated" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |FROM orders o
        |WHERE round(o_totalprice * 100) > (
        |  SELECT 1.5 * avg(round(i.o_totalprice * 100))
        |  FROM orders i WHERE i.o_custkey = o.o_custkey)""".stripMargin,
    "q104_regional_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |      AS BIGINT)) AS BIGINT) AS rev_cents,
        |  count(*) AS n_items
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,
    "q105_seasonal_anomaly" ->
      """WITH c AS (SELECT event_type,
        |    (epoch_us(ts) // 3600000000) % 24 AS hr,
        |    count(*) AS n_events
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, hr, n_events,
        |  n_events * count(*) OVER (PARTITION BY event_type) >
        |    sum(n_events) OVER (PARTITION BY event_type) * 2 AS spike
        |FROM c""".stripMargin,
    "q106_fuzzy_dedup" ->
      """WITH d AS (SELECT doc_id, split_part(text, ' ', 1) AS ft,
        |    len(string_split(text, ' ')) AS nt,
        |    substr(text, 1, 40) AS pfx
        |  FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  levenshtein(a.pfx, b.pfx)::BIGINT AS edit_dist
        |FROM d a JOIN d b ON a.ft = b.ft AND a.doc_id < b.doc_id
        |WHERE abs(a.nt - b.nt) <= 2
        |  AND levenshtein(a.pfx, b.pfx) <= 10""".stripMargin,
    "q107_unpivot" ->
      """WITH w AS (SELECT l_returnflag,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS base_cents,
        |    CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT))
        |      AS BIGINT) AS disc_cents,
        |    CAST(sum(CAST(round(l_extendedprice * l_tax * 100) AS BIGINT))
        |      AS BIGINT) AS tax_cents
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, charge, cents FROM w
        |UNPIVOT (cents FOR charge IN (base_cents, disc_cents, tax_cents))""".stripMargin,
    "q108_transitions" ->
      """WITH x AS (SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type, count(*) AS n_transitions
        |FROM x WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, event_type""".stripMargin,
    "q109_running_distinct" ->
      """WITH f AS (SELECT user_id, min(epoch_us(ts) // 86400000000) AS day
        |  FROM events GROUP BY 1),
        |d AS (SELECT day, count(*) AS new_users FROM f GROUP BY 1)
        |SELECT day, new_users,
        |  CAST(sum(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS cum_users
        |FROM d""".stripMargin,
    "q110_benford" ->
      """WITH n AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS BIGINT) AS digit, count(*) AS n
        |  FROM orders GROUP BY 1),
        |t AS (SELECT sum(n) AS total FROM n)
        |SELECT digit, n, round(n::DOUBLE / total::DOUBLE, 6) AS observed,
        |  round(log10(1.0 + 1.0 / digit::DOUBLE), 6) AS benford
        |FROM n CROSS JOIN t""".stripMargin,
    "q111_moving_median" ->
      """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    count(*) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT day, n_orders,
        |  quantile_cont(n_orders, 0.5) OVER (ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7
        |FROM d""".stripMargin,
    "q112_survivorship" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events),
        |f AS (SELECT user_id, ts_us, event_id,
        |    CASE WHEN k % 7 = 0 THEN NULL ELSE 'd' || (k % 7) END AS dev,
        |    CASE WHEN k % 5 = 0 THEN NULL ELSE 'c' || (k % 5) END AS cty,
        |    CASE WHEN k % 3 = 0 THEN NULL ELSE 'p' || (k % 3) END AS pln
        |  FROM e),
        |g AS (SELECT user_id,
        |    first_value(dev IGNORE NULLS) OVER w AS device,
        |    first_value(cty IGNORE NULLS) OVER w AS country,
        |    first_value(pln IGNORE NULLS) OVER w AS plan,
        |    row_number() OVER wo AS rn
        |  FROM f
        |  WINDOW
        |    w AS (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
        |    wo AS (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC))
        |SELECT user_id, device, country, plan FROM g WHERE rn = 1""".stripMargin,
    "q113_set_ops_all" ->
      """WITH c AS (SELECT c_nationkey AS nationkey FROM customer),
        |s AS (SELECT s_nationkey AS nationkey FROM supplier),
        |ia AS (SELECT nationkey FROM c INTERSECT ALL SELECT nationkey FROM s),
        |ea AS (SELECT nationkey FROM c EXCEPT ALL SELECT nationkey FROM s)
        |SELECT nationkey, count(*) AS n, 'intersect_all' AS side
        |FROM ia GROUP BY nationkey
        |UNION ALL
        |SELECT nationkey, count(*) AS n, 'except_all' AS side
        |FROM ea GROUP BY nationkey""".stripMargin,
    "q114_lateral" ->
      """SELECT o.o_orderkey, t.l_linenumber, t.cents
        |FROM orders o
        |JOIN LATERAL (
        |  SELECT l_linenumber,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem
        |  WHERE l_orderkey = o.o_orderkey
        |  ORDER BY cents DESC, l_linenumber LIMIT 2) t ON true
        |WHERE o.o_orderpriority = '1-URGENT'""".stripMargin,
    "q115_equidepth" ->
      """WITH b AS (SELECT quantile_cont(l_extendedprice,
        |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
        |  FROM lineitem),
        |v AS (SELECT l_extendedprice AS v,
        |    len(list_filter(qs, q -> v >= q))::BIGINT AS bucket
        |  FROM lineitem CROSS JOIN b)
        |SELECT bucket, count(*) AS n, min(v) AS lo, max(v) AS hi
        |FROM v GROUP BY bucket""".stripMargin,
    "q116_chisquare" ->
      """WITH o AS (SELECT lang, source, count(*)::DOUBLE AS o
        |  FROM documents GROUP BY 1, 2),
        |w AS (SELECT lang, source, o,
        |    sum(o) OVER (PARTITION BY lang) AS r,
        |    sum(o) OVER (PARTITION BY source) AS c,
        |    sum(o) OVER () AS n
        |  FROM o),
        |t AS (SELECT lang, source,
        |    ((o - r * c / n) * (o - r * c / n)) / (r * c / n) AS v
        |  FROM w),
        |g AS (SELECT array_agg(v ORDER BY lang, source) AS vs FROM t),
        |d AS (SELECT count(DISTINCT lang) AS nl,
        |    count(DISTINCT source) AS ns FROM o)
        |SELECT round(list_reduce(list_prepend(0.0::DOUBLE, vs),
        |    (a, b) -> a + b), 6) AS chi2,
        |  ((nl - 1) * (ns - 1))::BIGINT AS dof
        |FROM g CROSS JOIN d""".stripMargin,
    "q117_gaps_islands" ->
      """WITH d AS (SELECT DISTINCT l_partkey AS p,
        |    CAST(l_shipdate AS DATE) AS day FROM lineitem),
        |x AS (SELECT p, day,
        |    row_number() OVER (PARTITION BY p ORDER BY day) AS rn FROM d)
        |SELECT p, min(day) AS start_day, max(day) AS end_day,
        |  count(*) AS len
        |FROM x GROUP BY p, day - to_days(rn::INTEGER)""".stripMargin,
    "q118_variant" ->
      """SELECT o_orderkey,
        |  CAST(json_extract_string(j, '$.order.id') AS BIGINT) AS id_ext,
        |  json_extract_string(j, '$.order.status') AS status_ext,
        |  json_extract_string(j, '$.order.tags[1]') AS tag1_ext,
        |  json_extract_string(j, '$.order.missing') AS missing_ext
        |FROM (SELECT o_orderkey,
        |        '{"order":{"id":' || o_orderkey || ',"status":"'
        |          || o_orderstatus || '","tags":["a","b"]}}' AS j
        |      FROM orders)""".stripMargin,
    "q119_filter_agg" ->
      """SELECT l_linestatus,
        |  count(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
        |  count(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |    FILTER (WHERE l_discount > 0.05) AS BIGINT) AS disc_cents,
        |  count(*) AS n_total
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "q120_pseudonymize" ->
      """WITH s AS (SELECT doc_id, source,
        |    'user' || doc_id || '@mail' || (doc_id % 7) || '.example' AS email,
        |    '10.0.' || (doc_id % 256) || '.' || (doc_id % 100) AS ip
        |  FROM documents)
        |SELECT doc_id,
        |  substr(sha256('s1' || split_part(email, '@', 1)), 1, 16)
        |    || '@' || split_part(email, '@', 2) AS masked_email,
        |  regexp_replace(ip,
        |    '(\b\d{1,3}\.\d{1,3}\.\d{1,3})\.\d{1,3}\b', '\1.x') AS masked_ip,
        |  substr(sha256('s1' || source), 1, 16) AS source_token
        |FROM s""".stripMargin,
    "q121_flat_json" ->
      """WITH s AS (SELECT o_orderkey, o_orderstatus,
        |    CASE o_orderkey % 3 WHEN 0 THEN '["a"]'
        |      WHEN 1 THEN '["a","b"]' ELSE '["a","b","c"]' END AS tags
        |  FROM orders),
        |j AS (SELECT o_orderkey,
        |    '{"order":{"id":' || o_orderkey || ',"status":"' || o_orderstatus
        |      || '","tags":' || tags || '}}' AS doc,
        |    (o_orderkey % 3) AS m3
        |  FROM s)
        |SELECT o_orderkey,
        |  json_extract_string(doc, '$.order.id') AS id_txt,
        |  json_extract_string(doc, '$.order.status') AS status_txt,
        |  json_extract_string(doc, '$.order.tags[2]') AS tag2,
        |  (2 + m3 + 1)::BIGINT AS n_keys
        |FROM j""".stripMargin
  )
}

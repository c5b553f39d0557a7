package graft.queries

import graft.core.Tables.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational operator surface (SURVEY.md §2.2–§2.8) expressed over
  * the driver test corpus. One named query per operator family; each has a
  * DuckDB-equivalent oracle in [[Relational.oracles]].
  *
  * Column names are aliased identically in the Spark plan and the oracle SQL
  * (the driver compare sorts columns by name before hashing). Double-valued
  * aggregates are rounded on both sides to absorb accumulation-order
  * differences between engines.
  *
  * Scale notes (100 TB): every query here is a declarative plan — filters
  * and projections push to the parquet scan, small dimensions are broadcast
  * explicitly, windows shuffle once on their partition keys, and nothing
  * collects to the driver.
  */
object Relational {

  /** TPC-H Q1-style wide aggregation (scan → pushed filter → partial+final
    * hash agg). Reference analogue: the curated-table rebuild projections
    * (ProcessDaily.usql:99-129) plus the aggregate surface the reference
    * lacks but any warehouse user needs.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .where(col("l_shipdate") <= to_timestamp(lit("1998-09-01")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        count(lit(1)).as("count_order")
      )

  /** Predicate family P2–P5/P7: equality, LIKE, IN-list, null checks,
    * prefix match (ProcessDaily.usql:131,636,893,1751; :291). All six
    * predicates reach the parquet scan as pushed filters.
    */
  def q2FilterPred(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "part")
      .where(
        col("p_type").like("%O%") &&
          col("p_brand").isin("Brand#1", "Brand#2", "Brand#3", "Brand#13", "Brand#19") &&
          col("p_name").startsWith("s") &&
          col("p_size").isNotNull &&
          col("p_retailprice") > lit(905.0)
      )
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"), col("p_size"))

  /** J1 inner equi-join with explicitly broadcast small dims (region,
    * nation) — the 100 TB-safe shape: fact side never shuffles for a
    * dimension join.
    */
  def q3JoinInner(spark: SparkSession, dir: String): DataFrame = {
    val customer = table(spark, dir, "customer")
    val nation = table(spark, dir, "nation")
    val region = table(spark, dir, "region")
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_cust"),
        round(avg(col("c_acctbal")), 2).as("avg_bal")
      )
  }

  /** J2 anti-join: the reference's LEFT JOIN … WHERE key IS NULL idiom
    * (ProcessDaily.usql:76-80) expressed directly as left_anti —
    * customers with no order above 300k (non-empty at every sf).
    */
  def q4JoinAnti(spark: SparkSession, dir: String): DataFrame = {
    val customer = table(spark, dir, "customer")
    val bigOrders = table(spark, dir, "orders")
      .where(col("o_totalprice") > lit(300000.0))
    customer
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  /** Semi-join (EXISTS): customers with at least one high-value order.
    * Dual of J2; Spark plans a shuffled/broadcast semi join with no
    * fan-out, unlike the inner-join+distinct a naive port would write.
    */
  def q5JoinSemi(spark: SparkSession, dir: String): DataFrame = {
    val customer = table(spark, dir, "customer")
    val orders = table(spark, dir, "orders")
      .where(col("o_totalprice") > lit(100000.0))
    customer
      .join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_nationkey"))
  }

  /** J3 multi-join fan-out (GetRepoData-unused.usql:35-105 shape): fact →
    * fact → dims chain, revenue per nation. Dims broadcast; the two fact
    * tables shuffle once on the join key (AQE picks the strategy).
    */
  def q6JoinFanout(spark: SparkSession, dir: String): DataFrame = {
    val lineitem = table(spark, dir, "lineitem")
    val orders = table(spark, dir, "orders")
    val customer = table(spark, dir, "customer")
    val nation = table(spark, dir, "nation")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .where(col("o_orderdate") >= to_timestamp(lit("1995-01-01")))
      .groupBy(col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_items")
      )
  }

  /** W1/P8 latest-version-wins: row_number over (partition by key order by
    * ts desc) → rank-1 filter — the reference's core merge idiom
    * (ProcessDaily.usql:137-140, 39 uses). Spark ≥3.5 plans this as
    * WindowGroupLimit: no full sort materialization per group.
    */
  def q7WindowLatest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    table(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
  }

  /** Top-k per group (k=3): generalization of the reference's k=1. */
  def q8WindowTopk(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    table(spark, dir, "orders")
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rnk"))
  }

  /** Running aggregate frame (rows between unbounded preceding and current):
    * cumulative quantity per order by line number. (l_orderkey,
    * l_linenumber) is NOT unique in the test corpus, so the frame order
    * carries a full deterministic tiebreak — rows tying on every tiebreak
    * column have equal quantities, leaving the output multiset invariant.
    */
  def q9WindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("l_orderkey"))
      .orderBy(
        col("l_linenumber"),
        col("l_partkey"),
        col("l_suppkey"),
        col("l_quantity"),
        col("l_extendedprice")
      )
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(spark, dir, "lineitem")
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        round(sum(col("l_quantity")).over(w), 2).as("running_qty")
      )
  }

  /** Analytic lag/lead over the events stream table: previous value and
    * next event type per user. Ordered by event_id (monotone with ts;
    * avoids the parquet ns-vs-µs timestamp truncation divergence between
    * engines documented in .claude/skills/verify/SKILL.md).
    */
  def q10WindowLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    table(spark, dir, "events")
      .select(
        col("user_id"),
        col("event_id"),
        col("event_type"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("event_type"), 1).over(w).as("next_type")
      )
  }

  /** A2 DISTINCT dedup aggregate (ProcessDaily.usql:44,60-61; 21 uses). */
  def q11Distinct(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"))
      .distinct()

  /** U1 UNION ALL merge of two branches (33 uses in the reference) —
    * unionByName, not positional, per SURVEY.md §2.7.
    */
  def q12Union(spark: SparkSession, dir: String): DataFrame = {
    val cust = table(spark, dir, "customer")
      .select(col("c_nationkey").as("nationkey"), lit("customer").as("side"))
    val supp = table(spark, dir, "supplier")
      .select(col("s_nationkey").as("nationkey"), lit("supplier").as("side"))
    cust
      .unionByName(supp)
      .groupBy(col("nationkey"), col("side"))
      .agg(count(lit(1)).as("n"))
  }

  /** A1 MAP_AGG re-assembly (ProcessDaily.usql:294-306, 11 uses): group
    * exploded entries back into one value per parent. Rendered as a
    * deterministic sorted "k=v" string so the oracle hash is stable across
    * engines' map orderings.
    */
  def q13MapAgg(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("user_id"))
      .agg(
        array_join(
          sort_array(collect_list(concat(col("event_type"), lit("="), col("cnt")))),
          ","
        ).as("type_counts")
      )

  /** G1 lateral explode (CROSS APPLY EXPLODE, 18 uses): tokenize documents
    * and count global token frequencies. split → explode is a narrow op;
    * the single shuffle is the count aggregation.
    */
  def q14Explode(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))

  /** Scalar function surface F1–F9: date formatting/parsing, zero-padded
    * string assembly, substring/instr/length, casts, prefix tests, and the
    * null-safe ternary (P6: null comparison → false branch, matching the
    * reference's C# `?:` semantics at ProcessDaily.usql:139).
    */
  def q15ScalarFuncs(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"),
        format_string("%09d", col("o_orderkey")).as("key_padded"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        (instr(col("o_orderpriority"), "N") > 0).as("has_n"),
        length(col("o_orderpriority")).as("prio_len"),
        floor(col("o_totalprice")).cast("long").as("price_int"),
        when(col("o_orderstatus") === "F", col("o_totalprice"))
          .otherwise(lit(0.0))
          .as("finished_price")
      )

  /** A3 multi-key GROUP BY with no metric aggregates — key-census shape
    * (ProcessDaily.usql:306; dedup via grouping alone).
    */
  def q16GroupMultikey(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key")
      )

  /** F8 / §1.2 document-model surface: typed null-lenient JSON path
    * extraction (the `Utility.Get*` UDF family re-expressed as
    * `get_json_object` + cast). The JSON is assembled in-query from table
    * columns — identically in the oracle — so extraction semantics
    * (nested paths, array indexing, null-on-absent) are what's compared.
    */
  def q28JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val j = concat(
      lit("""{"order":{"id":"""), col("o_orderkey").cast("string"),
      lit(""","status":""""), col("o_orderstatus"),
      lit("""","tags":["a","b"]}}"""))
    table(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        get_json_object(j, "$.order.id").cast("long").as("id_ext"),
        get_json_object(j, "$.order.status").as("status_ext"),
        get_json_object(j, "$.order.tags[1]").as("tag1_ext"),
        get_json_object(j, "$.order.missing").as("missing_ext"))
  }

  /** ROLLUP grouping sets: subtotals per (returnflag), (returnflag,
    * linestatus), and grand total — the hierarchical-report aggregate
    * surface. NULL marks the rolled-up level in both engines. */
  def q33Rollup(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n"))

  /** PIVOT: one column per order status, conditional-sum semantics.
    * Spark's native `pivot` with a fixed value list (no extra pass to
    * discover values — required at scale); the oracle spells the identical
    * conditional aggregation. */
  def q34Pivot(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(sum(col("o_totalprice")), 2))

  /** Exact interpolated percentiles per group (median, p90) — the
    * reporting surface; at 100 TB swap `percentile` for
    * `percentile_approx` (t-digest sketch, one pass, mergeable) when
    * exactness isn't required — approx results are engine-specific so
    * the oracle pins the exact variant. */
  def q35Percentile(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"))

  /** Statistical moments + correlation per group (sample stddev/variance,
    * Pearson corr) — rounded to absorb accumulation-order float drift
    * between engines. */
  def q36Stats(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"))

  /** CUBE grouping sets: all 2^2 subtotal combinations over (status,
    * priority) — completes the grouping-sets surface next to q33's
    * ROLLUP. */
  def q52Cube(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))

  /** INTERSECT / EXCEPT set operations (distinct semantics): nations that
    * have both customers and suppliers vs customer-only, tagged and
    * unioned — the set-op surface the reference never uses (§2.7) but an
    * engine must expose. */
  def q53SetOps(spark: SparkSession, dir: String): DataFrame = {
    val custNations = table(spark, dir, "customer").select(col("c_nationkey").as("nationkey"))
    val suppNations = table(spark, dir, "supplier").select(col("s_nationkey").as("nationkey"))
    val both = custNations.intersect(suppNations)
      .withColumn("side", lit("both"))
    val custOnly = custNations.except(suppNations)
      .withColumn("side", lit("customer_only"))
    both.unionByName(custOnly)
  }

  /** Calendar/date function surface: trunc, parts, arithmetic, end-of-
    * month — the reporting-dimension toolkit (F1/F2 generalized). Week
    * fields are avoided: ISO-week conventions differ across engines;
    * day-of-week is normalized to ISO (Mon=1..Sun=7) on both sides. */
  def q54DateFuncs(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
          .as("month_start"),
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        // Spark dayofweek: Sun=1..Sat=7 → ISO Mon=1..Sun=7
        pmod(dayofweek(col("o_orderdate")) + lit(5), lit(7)).plus(1).as("iso_dow"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd")
          .as("plus_3m"),
        datediff(col("o_orderdate"), to_date(lit("1995-01-01")))
          .as("days_since_95"))

  /** Array higher-order functions (transform / filter / aggregate) over
    * the tokenized document — the HOF surface. (Engine note: Spark
    * evaluates HOF lambdas interpreted, outside codegen — fine for
    * structural transforms like these, but hash/crypto per element
    * belongs in a native expression, see NGramShingles.) */
  def q55ArrayHof(spark: SparkSession, dir: String): DataFrame = {
    val toks = filter(split(col("text"), " "), t => t =!= "")
    table(spark, dir, "documents")
      .select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        size(filter(toks, t => length(t) > 4)).as("n_long"),
        array_join(slice(transform(toks, t => upper(t)), 1, 3), " ")
          .as("head_upper"),
        aggregate(toks, lit(0), (acc, t) => acc + length(t)).as("total_chars"))
  }

  /** Argmax/argmin aggregates (max_by / min_by ≡ DuckDB arg_max/arg_min):
    * per market segment, the customer holding the extreme unique key —
    * single-pass, no window. */
  def q56Argmax(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(
        max_by(col("c_name"), col("c_custkey")).as("latest_customer"),
        min_by(col("c_name"), col("c_custkey")).as("first_customer"),
        round(max(col("c_acctbal")), 2).as("max_bal"))

  /** URL component extraction via native `parse_url` (HOST / PATH / QUERY
    * / a single query parameter) — the web-corpus curation surface. URLs
    * are synthesized deterministically from `o_orderkey` so both engines
    * see identical inputs; every 13th URL carries no query string, pinning
    * the null behavior (`parse_url` → NULL, not empty string). The oracle
    * rebuilds the expected components arithmetically — it verifies the
    * parse, it doesn't re-implement it. */
  def q57UrlFuncs(spark: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    val base = concat(lit("https://shop"), pmod(k, lit(5)).cast("string"),
      lit(".example.com/c/"), pmod(k, lit(7)).cast("string"),
      lit("/item-"), k.cast("string"))
    val url = when(pmod(k, lit(13)) === 0, base).otherwise(concat(base,
      lit("?page="), pmod(k, lit(3)).cast("string"),
      lit("&ref=r"), pmod(k, lit(11)).cast("string")))
    table(spark, dir, "orders")
      .select(k.as("o_orderkey"), url.as("url"))
      .select(
        col("o_orderkey"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY")).as("query"),
        parse_url(col("url"), lit("QUERY"), lit("ref")).as("ref_param"))
  }

  /** Ordered string aggregation (LISTAGG / string_agg): per-nation
    * pipe-joined sorted supplier roster. `collect_list` order is
    * partition-nondeterministic by design — `array_sort` before the join
    * is what makes the operator distributable AND deterministic; the
    * oracle's `ORDER BY` inside string_agg pins the same contract. */
  def q58Listagg(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "supplier")
      .groupBy(col("s_nationkey"))
      .agg(
        count(lit(1)).as("n_suppliers"),
        array_join(array_sort(collect_list(col("s_name"))), "|").as("names"))

  /** Linear-regression aggregates (regr_slope/intercept/r2/avgx/avgy) of
    * extended price on quantity per return flag — single-pass moment
    * sketches, mergeable across partitions (the 100 TB path needs no
    * second scan). Rounded to absorb accumulation-order float drift. */
  def q59Regr(spark: SparkSession, dir: String): DataFrame = {
    val y = col("l_extendedprice"); val x = col("l_quantity")
    table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        regr_count(y, x).cast("long").as("n_pairs"),
        round(regr_slope(y, x), 4).as("slope"),
        round(regr_intercept(y, x), 2).as("intercept"),
        round(regr_r2(y, x), 4).as("r2"),
        round(regr_avgx(y, x), 4).as("avg_x"),
        round(regr_avgy(y, x), 2).as("avg_y"))
  }

  /** Map higher-order functions (map_from_entries / map_filter /
    * transform_values / map_keys / map_values / map_entries): per-order
    * line map (linenumber → quantity), filtered, transformed, and
    * rendered as deterministic strings (entry order pinned by
    * `array_sort` before map construction — the q13 technique, so the
    * hash is stable across engines' map orderings). */
  def q66MapFuncs(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      // the synthetic lineitem repeats linenumbers within an order —
      // collapse first; map keys must be unique (ANSI duplicate-key error)
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(round(sum(col("l_quantity")), 2).as("qty"))
      .groupBy(col("l_orderkey"))
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("l_linenumber"), col("qty")))))
        .as("m"))
      .select(
        col("l_orderkey"),
        size(col("m")).as("n_items"),
        round(aggregate(map_values(col("m")), lit(0.0), (a, v) => a + v), 2)
          .as("total_qty"),
        array_join(
          transform(map_keys(map_filter(col("m"), (_, v) => v >= 30)),
            _.cast("string")), ",").as("big_items"),
        array_join(
          transform(map_entries(transform_values(col("m"), (_, v) => v * 2)),
            e => concat(e.getField("key").cast("string"), lit("="),
              e.getField("value").cast("string"))), ",").as("doubled"))

  /** Bitwise and conditional scalar surface: AND/OR/XOR/shifts (hash
    * bucketing, flag packing) and greatest/least/nullif/coalesce (the
    * null-handling idioms) — all codegen'd projections. */
  def q67BitwiseCond(spark: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    table(spark, dir, "orders").select(
      k.as("o_orderkey"),
      k.bitwiseAND(lit(255L)).as("and255"),
      k.bitwiseOR(lit(16L)).as("or16"),
      k.bitwiseXOR(lit(85L)).as("xor85"),
      shiftleft(k, 3).as("shl3"),
      shiftright(k, 2).as("shr2"),
      greatest(pmod(k, lit(7L)), pmod(k, lit(11L))).as("gmax"),
      least(pmod(k, lit(7L)), pmod(k, lit(11L))).as("lmin"),
      nullif(pmod(k, lit(5L)), lit(0L)).as("nz"),
      coalesce(nullif(pmod(k, lit(5L)), lit(0L)), lit(-1L)).as("nzc"))
  }

  /** RANGE-frame rolling window: per-priority 7-day rolling order count
    * and revenue by order date — a VALUE-based frame (all rows within 6
    * days before the current row's date), not a row count; days are
    * epoch-day longs so the frame bound is exact integer arithmetic in
    * both engines. Completes the frame surface next to q9's ROWS frame. */
  def q72RollingRange(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // rolling revenue sums in exact integer CENTS: a sliding frame's
    // float summation order is engine-internal (DuckDB segment tree vs
    // sequential), so money math over the frame must be integral to be
    // reproducible — the same practice a real revenue pipeline follows
    val daily = table(spark, dir, "orders")
      .groupBy(col("o_orderpriority"), col("o_orderdate"))
      .agg(count(lit(1)).as("n"),
        // convert to cents PER ROW before summing: a float group-sum's
        // accumulation order is engine-internal, and a half-ulp at a
        // .xx5 boundary rounds to a different cent — same hazard as the
        // frame sum below, one operator earlier
        sum(round(col("o_totalprice") * 100, 0).cast("long")).as("tc"))
      .withColumn("epoch_day",
        datediff(col("o_orderdate"), to_date(lit("1970-01-01"))).cast("long"))
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("epoch_day")).rangeBetween(-6, 0)
    daily.select(
      col("o_orderpriority"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
      sum(col("n")).over(w).as("rolling_n"),
      (sum(col("tc")).over(w) / 100.0).as("rolling_rev"))
  }

  /** Full outer join: per-nation customer vs supplier counts, neither
    * side required — the join-type surface the reference never uses
    * (§2.3 is inner/semi/anti only) but reconciliation queries need;
    * null-coalesced counts make the mismatch visible. */
  def q75FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "customer").groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val s = table(spark, dir, "supplier")
      .where(col("s_acctbal") > 9000.0) // sparse side → unmatched nations
      .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
    c.join(s, col("c_nationkey") === col("s_nationkey"), "full_outer")
      .select(
        coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
  }

  /** The full ranking-function family in one window (rank, dense_rank,
    * percent_rank, cume_dist, ntile) — q7/q8 pin row_number; this pins
    * the rest, including tie semantics (same acctbal → same rank, gap in
    * rank, no gap in dense_rank). Tie-free ORDER BY for ntile: bucket
    * boundaries under ties are engine-specific, so the key is appended. */
  def q76RankFamily(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    // tied ordering: balance bucketed to thousands — many rows share a
    // key, so rank gaps / dense_rank compaction / cume_dist plateaus are
    // actually exercised (rank outputs are key-determined, hence
    // deterministic even with ties)
    val bucket = floor(col("c_acctbal") / 1000).cast("long")
    val wt = Window.partitionBy(col("c_mktsegment")).orderBy(bucket.desc)
    table(spark, dir, "customer").select(
      col("c_custkey"), col("c_mktsegment"),
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk"),
      round(percent_rank().over(w), 6).as("prnk"),
      round(cume_dist().over(w), 6).as("cdist"),
      ntile(4).over(w).as("quartile"),
      rank().over(wt).as("rnk_tied"),
      dense_rank().over(wt).as("drnk_tied"),
      round(cume_dist().over(wt), 6).as("cdist_tied"))
  }

  /** Value window functions with explicit frames: first_value over the
    * growing frame, last_value over the FULL partition (the default
    * frame's last_value ≡ current row — the classic trap, pinned here by
    * spelling the frame), nth_value(3), lag with default — completing
    * §2.5 next to q10's lag/lead and q76's ranking family. */
  def q78ValueFuncs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    val full = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val grow = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(spark, dir, "customer").select(
      col("c_custkey"), col("c_mktsegment"),
      first(col("c_name")).over(grow).as("richest"),
      last(col("c_name")).over(full).as("poorest"),
      nth_value(col("c_name"), 3).over(grow).as("third"),
      lag(col("c_custkey"), 2, -1L).over(base).as("lag2_key"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q78_value_funcs" -> q78ValueFuncs,
    "q76_rank_family" -> q76RankFamily,
    "q75_full_outer" -> q75FullOuter,
    "q72_rolling_range" -> q72RollingRange,
    "q67_bitwise_cond" -> q67BitwiseCond,
    "q66_map_funcs" -> q66MapFuncs,
    "q57_url_funcs" -> q57UrlFuncs,
    "q58_listagg" -> q58Listagg,
    "q59_regr" -> q59Regr,
    "q52_cube" -> q52Cube,
    "q53_set_ops" -> q53SetOps,
    "q54_date_funcs" -> q54DateFuncs,
    "q55_array_hof" -> q55ArrayHof,
    "q56_argmax" -> q56Argmax,
    "q28_json_extract" -> q28JsonExtract,
    "q33_rollup" -> q33Rollup,
    "q34_pivot" -> q34Pivot,
    "q35_percentile" -> q35Percentile,
    "q36_stats" -> q36Stats,
    "q1_agg" -> q1Agg,
    "q2_filter_pred" -> q2FilterPred,
    "q3_join_inner" -> q3JoinInner,
    "q4_join_anti" -> q4JoinAnti,
    "q5_join_semi" -> q5JoinSemi,
    "q6_join_fanout" -> q6JoinFanout,
    "q7_window_latest" -> q7WindowLatest,
    "q8_window_topk" -> q8WindowTopk,
    "q9_window_running" -> q9WindowRunning,
    "q10_window_lag" -> q10WindowLag,
    "q11_distinct" -> q11Distinct,
    "q12_union" -> q12Union,
    "q13_map_agg" -> q13MapAgg,
    "q14_explode" -> q14Explode,
    "q15_scalar_funcs" -> q15ScalarFuncs,
    "q16_group_multikey" -> q16GroupMultikey
  )

  val oracles: Map[String, String] = Map(
    "q78_value_funcs" ->
      """SELECT c_custkey, c_mktsegment,
        |  first_value(c_name) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS richest,
        |  last_value(c_name) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND UNBOUNDED FOLLOWING) AS poorest,
        |  nth_value(c_name, 3) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS third,
        |  coalesce(lag(c_custkey, 2) OVER w, -1) AS lag2_key
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal DESC, c_custkey ASC)""".stripMargin,
    "q76_rank_family" ->
      """SELECT c_custkey, c_mktsegment,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  round(percent_rank() OVER w, 6) AS prnk,
        |  round(cume_dist() OVER w, 6) AS cdist,
        |  ntile(4) OVER w AS quartile,
        |  rank() OVER wt AS rnk_tied,
        |  dense_rank() OVER wt AS drnk_tied,
        |  round(cume_dist() OVER wt, 6) AS cdist_tied
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal DESC, c_custkey ASC),
        |       wt AS (PARTITION BY c_mktsegment
        |              ORDER BY CAST(floor(c_acctbal / 1000) AS BIGINT) DESC)"""
        .stripMargin,
    "q75_full_outer" ->
      """SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
        |  coalesce(c.n_cust, 0) AS n_cust,
        |  coalesce(s.n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey, count(*) n_cust
        |      FROM customer GROUP BY c_nationkey) c
        |FULL OUTER JOIN
        |     (SELECT s_nationkey, count(*) n_supp
        |      FROM supplier WHERE s_acctbal > 9000.0
        |      GROUP BY s_nationkey) s
        |ON c.c_nationkey = s.s_nationkey""".stripMargin,
    "q72_rolling_range" ->
      """WITH daily AS (SELECT o_orderpriority, o_orderdate, count(*) n,
        |    sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) tc,
        |    date_diff('day', DATE '1970-01-01', o_orderdate) ed
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m-%d') AS day,
        |  CAST(sum(n) OVER w AS BIGINT) AS rolling_n,
        |  sum(tc) OVER w / 100.0 AS rolling_rev
        |FROM daily
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY ed
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q67_bitwise_cond" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS and255,
        |  o_orderkey | 16 AS or16,
        |  xor(o_orderkey, 85) AS xor85,
        |  o_orderkey << 3 AS shl3,
        |  o_orderkey >> 2 AS shr2,
        |  greatest(o_orderkey % 7, o_orderkey % 11) AS gmax,
        |  least(o_orderkey % 7, o_orderkey % 11) AS lmin,
        |  nullif(o_orderkey % 5, 0) AS nz,
        |  coalesce(nullif(o_orderkey % 5, 0), -1) AS nzc
        |FROM orders""".stripMargin,
    "q66_map_funcs" ->
      """WITH pre AS (SELECT l_orderkey, l_linenumber,
        |               round(sum(l_quantity), 2) AS qty
        |             FROM lineitem GROUP BY l_orderkey, l_linenumber),
        |g AS (SELECT l_orderkey,
        |             array_agg(l_linenumber ORDER BY l_linenumber) ks,
        |             array_agg(qty ORDER BY l_linenumber) vs
        |           FROM pre GROUP BY l_orderkey)
        |SELECT l_orderkey,
        |  len(ks)::INT AS n_items,
        |  round(list_sum(vs), 2) AS total_qty,
        |  coalesce(array_to_string(list_transform(
        |    list_filter(ks, (k, i) -> vs[i] >= 30), k -> k::VARCHAR), ','), '')
        |    AS big_items,
        |  array_to_string(list_transform(ks,
        |    (k, i) -> k::VARCHAR || '=' || (vs[i] * 2)::VARCHAR), ',')
        |    AS doubled
        |FROM g""".stripMargin,
    "q57_url_funcs" ->
      """SELECT o_orderkey,
        |  'shop' || (o_orderkey % 5) || '.example.com' AS host,
        |  '/c/' || (o_orderkey % 7) || '/item-' || o_orderkey AS path,
        |  CASE WHEN o_orderkey % 13 = 0 THEN NULL
        |       ELSE 'page=' || (o_orderkey % 3) || '&ref=r' || (o_orderkey % 11)
        |  END AS query,
        |  CASE WHEN o_orderkey % 13 = 0 THEN NULL
        |       ELSE 'r' || (o_orderkey % 11) END AS ref_param
        |FROM orders""".stripMargin,
    "q58_listagg" ->
      """SELECT s_nationkey, count(*) AS n_suppliers,
        |  string_agg(s_name, '|' ORDER BY s_name) AS names
        |FROM supplier GROUP BY s_nationkey""".stripMargin,
    "q59_regr" ->
      """SELECT l_returnflag,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
        |  round(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_x,
        |  round(regr_avgy(l_extendedprice, l_quantity), 2) AS avg_y
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q54_date_funcs" ->
      """SELECT o_orderkey,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(quarter(o_orderdate) AS INT) AS qtr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  CAST(isodow(o_orderdate) AS INT) AS iso_dow,
        |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
        |  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m,
        |  CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INT)
        |    AS days_since_95
        |FROM orders""".stripMargin,
    "q55_array_hof" ->
      """SELECT doc_id,
        |  CAST(len(toks) AS INT) AS n_tokens,
        |  CAST(len(list_filter(toks, t -> length(t) > 4)) AS INT) AS n_long,
        |  array_to_string(list_transform(toks, t -> upper(t))[1:3], ' ')
        |    AS head_upper,
        |  CAST(list_sum(list_transform(toks, t -> length(t))) AS INT)
        |    AS total_chars
        |FROM (SELECT doc_id,
        |        list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |      FROM documents)""".stripMargin,
    "q56_argmax" ->
      """SELECT c_mktsegment,
        |  arg_max(c_name, c_custkey) AS latest_customer,
        |  arg_min(c_name, c_custkey) AS first_customer,
        |  round(max(c_acctbal), 2) AS max_bal
        |FROM customer GROUP BY c_mktsegment""".stripMargin,
    "q52_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q53_set_ops" ->
      """SELECT nationkey, 'both' AS side FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  INTERSECT
        |  SELECT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT nationkey, 'customer_only' AS side FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  EXCEPT
        |  SELECT s_nationkey FROM supplier)""".stripMargin,
    "q35_percentile" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 2) AS p90
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q36_stats" ->
      """SELECT l_returnflag,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(stddev_samp(l_extendedprice), 4) AS sd_price,
        |  round(var_samp(l_quantity), 4) AS var_qty,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q33_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q34_pivot" ->
      """SELECT o_orderpriority,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS "F",
        |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS "O",
        |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS "P"
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q28_json_extract" ->
      """SELECT o_orderkey,
        |  CAST(json_extract_string(j, '$.order.id') AS BIGINT) AS id_ext,
        |  json_extract_string(j, '$.order.status') AS status_ext,
        |  json_extract_string(j, '$.order.tags[1]') AS tag1_ext,
        |  json_extract_string(j, '$.order.missing') AS missing_ext
        |FROM (SELECT o_orderkey,
        |        '{"order":{"id":' || o_orderkey || ',"status":"' || o_orderstatus
        |          || '","tags":["a","b"]}}' AS j
        |      FROM orders)""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_pred" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size
        |FROM part
        |WHERE p_type LIKE '%O%'
        |  AND p_brand IN ('Brand#1','Brand#2','Brand#3','Brand#13','Brand#19')
        |  AND p_name LIKE 's%'
        |  AND p_size IS NOT NULL
        |  AND p_retailprice > 905.0""".stripMargin,
    "q3_join_inner" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |  round(avg(c_acctbal), 2) AS avg_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q4_join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)""".stripMargin,
    "q5_join_semi" ->
      """SELECT c_custkey, c_nationkey
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)""".stripMargin,
    "q6_join_fanout" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |GROUP BY n_name""".stripMargin,
    "q7_window_latest" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin,
    "q8_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
        |    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |  FROM orders) WHERE rnk <= 3""".stripMargin,
    "q9_window_running" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(sum(l_quantity) OVER (
        |    PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
        |FROM lineitem""".stripMargin,
    "q10_window_lag" ->
      """SELECT user_id, event_id, event_type,
        |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value,
        |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS next_type
        |FROM events""".stripMargin,
    "q11_distinct" ->
      "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    "q12_union" ->
      """SELECT nationkey, side, count(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier)
        |GROUP BY nationkey, side""".stripMargin,
    "q13_map_agg" ->
      """SELECT user_id,
        |  string_agg(event_type || '=' || cnt, ',' ORDER BY event_type || '=' || cnt) AS type_counts
        |FROM (SELECT user_id, event_type, count(*) AS cnt
        |      FROM events GROUP BY user_id, event_type)
        |GROUP BY user_id""".stripMargin,
    "q14_explode" ->
      """SELECT token, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE token <> ''
        |GROUP BY token""".stripMargin,
    "q15_scalar_funcs" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_day,
        |  printf('%09d', o_orderkey) AS key_padded,
        |  substr(o_orderpriority, 1, 1) AS prio_code,
        |  instr(o_orderpriority, 'N') > 0 AS has_n,
        |  length(o_orderpriority) AS prio_len,
        |  CAST(floor(o_totalprice) AS BIGINT) AS price_int,
        |  CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END AS finished_price
        |FROM orders""".stripMargin,
    "q16_group_multikey" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  count(DISTINCT o_custkey) AS n_cust,
        |  min(o_orderkey) AS min_key,
        |  max(o_orderkey) AS max_key
        |FROM orders
        |GROUP BY o_orderstatus, o_orderpriority""".stripMargin
  )
}

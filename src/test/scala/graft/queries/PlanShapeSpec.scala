package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Physical-plan assertions: correctness tests prove WHAT each query
  * computes; these prove HOW — the properties that decide whether the same
  * plan survives a 100 TB cluster (filters reaching the scan, dimensions
  * broadcast, rank-1 windows using group limits, no accidental cartesian
  * products, codegen'd stages).
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    val df = graft.SparkEntry.queries(q)(spark, dir)
    df.collect() // materialize THIS plan so AQE reports its final form
    df.queryExecution.executedPlan.toString
  }

  test("filters and projections push down to the parquet scan") {
    val p = plan("q2_filter_pred")
    assert(p.contains("PushedFilters:") && p.contains("IsNotNull"),
      s"no pushed filters in:\n$p")
    // projection pruning: only the 5 selected + filter columns are read
    assert(p.contains("ReadSchema") && !p.contains("p_comment"),
      "scan reads columns the query never uses")
  }

  test("dimension joins broadcast; no shuffle of the fact side for dims") {
    val p = plan("q3_join_inner")
    assert(p.contains("BroadcastHashJoin"), s"dim join did not broadcast:\n$p")
  }

  test("anti and semi joins plan as joins, not filters over subqueries") {
    assert(plan("q4_join_anti").contains("LeftAnti"))
    assert(plan("q5_join_semi").contains("LeftSemi"))
  }

  test("rank-1 and top-k windows use WindowGroupLimit (no full sort output)") {
    assert(plan("q7_window_latest").contains("WindowGroupLimit"))
    assert(plan("q8_window_topk").contains("WindowGroupLimit"))
  }

  test("whole-stage codegen covers the aggregation hot path") {
    // codegen'd operators print with a "*(stageId)" marker
    val p = plan("q1_agg")
    assert(p.contains("*(1) HashAggregate") || p.contains("*(1) ColumnarToRow")
      || p.contains("*("), s"no codegen stage in:\n$p")
  }

  test("similarity join has no cartesian product and keys through shingles") {
    val p = plan("q18_ngram_jaccard")
    assert(!p.contains("CartesianProduct"), "similarity join went quadratic")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"))
  }

  test("similarity join: one cached doc frame, pair dedup is a hash agg on bare ids") {
    val p = plan("q18_ngram_jaccard")
    // the shingle subtree computes once (persisted), not per self-join arm
    assert(p.contains("InMemoryTableScan"), s"doc frame not cached:\n$p")
    // candidate-pair dedup must aggregate bare (doc_a, doc_b) — a
    // SortAggregate here means full shingle arrays are riding the dedup
    val agg = p.split("\n").filter(l =>
      l.contains("Aggregate") && l.contains("doc_a") && l.contains("doc_b"))
    assert(agg.nonEmpty && agg.forall(l => !l.contains("SortAggregate")),
      s"pair dedup sorts array payloads:\n${agg.mkString("\n")}")
    // joins key on the 60-bit hash (long), not shingle strings
    assert(p.contains("ngram_shingle_hashes"), s"string shingles in join:\n$p")
  }

  test("contamination probe broadcasts the eval shingle set") {
    val p = plan("q38_contamination")
    assert(p.contains("BroadcastHashJoin"), s"eval probe not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("repetition ratio is a pure projection — no exchange at all") {
    val p = plan("q39_repetition")
    assert(!p.contains("Exchange"), s"repetition ratio shuffles:\n$p")
  }

  test("cosine top-k broadcasts the corpus; window exchange is skinny") {
    val p = plan("q21_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
    // the exchange feeding the window must not carry embedding arrays
    val exchange = p.split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(exchange.nonEmpty && !exchange.exists(_.contains("embedding")),
      s"embeddings ride the window shuffle:\n${exchange.mkString("\n")}")
  }

  test("ANN top-k plans as the bounded-heap aggregate with a map-side partial") {
    // (q26/q41 still use a rank-1 window for CLUSTER ASSIGNMENT — only the
    // neighbor top-k must go through the heap aggregate)
    for (q <- Seq("q21_cosine_topk", "q26_ann_ivf", "q41_ann_nprobe")) {
      val p = plan(q)
      assert(p.contains("partial_topk_by_score"),
        s"$q lost the map-side heap partial:\n$p")
      assert(!p.contains("CartesianProduct"))
    }
    // the pure top-k query must not window at all
    assert(!plan("q21_cosine_topk").contains("WindowGroupLimit"))
  }

  test("token budget is one window shuffle, no join") {
    // executedPlan.toString prints Final + Initial AQE plans — count the
    // final section only
    val p = plan("q40_token_budget").split("== Initial Plan ==").head
    assert(!p.contains("Join"), s"token budget joins:\n$p")
    assert(p.split("\n").count(_.contains("Exchange hashpartitioning")) <= 1,
      s"extra exchanges:\n$p")
  }

  test("as-of join is union+window — no join operator, one key exchange") {
    val p = plan("q43_asof_join").split("== Initial Plan ==").head
    assert(!p.contains("Join"), s"as-of fell back to a pair join:\n$p")
    assert(p.split("\n").count(_.contains("Exchange hashpartitioning")) <= 1,
      s"as-of shuffles more than once:\n$p")
  }

  test("range join is a binned equi-join, not a nested-loop product") {
    val p = plan("q44_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join went quadratic:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"no equi-join on bins:\n$p")
  }

  test("tfidf corpus size joins as a 1-row broadcast, ranking group-limits") {
    val p = plan("q47_tfidf")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"corpus-size cross join not broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"), s"tfidf top-k fully sorts:\n$p")
  }

  test("weighted sample plans as WindowGroupLimit over a projection — no extra pass") {
    val p = plan("q48_weighted_sample").split("== Initial Plan ==").head
    assert(p.contains("WindowGroupLimit"), s"weighted sample fully sorts:\n$p")
    assert(p.split("\n").count(_.contains("Exchange hashpartitioning")) <= 1,
      s"extra exchanges:\n$p")
  }

  test("six-table flagship broadcasts the dim chain, no cartesian anywhere") {
    val p = plan("q104_regional_revenue")
    assert(p.contains("BroadcastHashJoin"),
      s"region→nation chain did not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"join graph degenerated:\n$p")
    // the ASIA filter reaches the region scan, not a post-join Filter
    assert(p.contains("PushedFilters") && p.contains("EqualTo(r_name,ASIA)"),
      s"region filter not pushed:\n$p")
  }

  test("correlated scalar subquery decorrelates to an aggregate equi-join") {
    val p = plan("q103_correlated")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"correlated subquery re-evaluated per row:\n$p")
    assert(p.contains("HashAggregate") &&
      (p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
        p.contains("BroadcastHashJoin")),
      s"no decorrelated agg-join:\n$p")
  }

  test("lateral top-2 subquery decorrelates to a group-limited window join") {
    val p = plan("q114_lateral")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"lateral subquery re-ran per outer row:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"per-order LIMIT 2 did not become a group limit:\n$p")
  }

  test("target encoding broadcasts the category frame — fact never shuffles") {
    val p = plan("q135_target_encode")
    assert(p.contains("BroadcastHashJoin"),
      s"category stats should broadcast onto the facts:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"fact table must not shuffle for a tiny category dim:\n$p")
  }

  test("table checksum is a single scan-and-aggregate — no shuffle but partials") {
    val p = plan("q138_table_checksum")
    assert(!p.contains("SortMergeJoin") && !p.contains("Window") &&
      p.contains("HashAggregate"), s"checksum plan grew extra stages:\n$p")
  }

  test("clustering coefficient wedge join is an equi-join, never cartesian") {
    val p = plan("q132_clustering_coef")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"triangle enumeration went quadratic:\n$p")
  }

  test("KS/MWU tests aggregate to distinct-value grain before any window") {
    // the unpartitioned cumulative window must run AFTER the groupBy —
    // its input is distinct quantized values, not raw rows
    val p = plan("q128_ks_test")
    assert(p.contains("HashAggregate") && p.contains("Window"),
      s"expected agg-then-window shape:\n$p")
  }

  test("fact reconciliation aggregates each side before the day-grain merge") {
    val p = plan("q148_fact_reconcile")
    assert(!p.contains("CartesianProduct"), s"fact-fact blowup:\n$p")
    // order-key join + two HashAggregates + a day-grain outer merge; the
    // day-grain merge joins aggregate outputs, never raw fact rows
    assert(p.contains("HashAggregate"), s"missing pre-aggregation:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must not global-sort:\n$p")
  }

  test("PMI joins dictionary-grain counts, top-k never global-sorts") {
    val p = plan("q144_pmi")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"),
      s"LIMIT 100 over scores should be a bounded heap:\n$p")
  }

  test("bitmap exact-distinct has no Expand and combines map-side") {
    val p = plan("q152_bitmap_distinct")
    assert(!p.contains("Expand"),
      s"bitmap path must not pay the count-distinct Expand:\n$p")
    assert(p.contains("partial_bitmap_construct_agg"),
      s"bitmaps must partial-aggregate map-side:\n$p")
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    import org.apache.spark.sql.functions.col
    // force the shuffle-join path (no broadcast) so the optimizer's only
    // lever is a runtime bloom filter built from the filtered dim side —
    // at 100 TB this is what spares the fact scan from shuffling rows the
    // join will drop anyway
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      // default guards target 10GB+ fact scans; drop them so the sf0.001
      // fixture qualifies — the PLAN SHAPE is what scales, not the fixture
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "0")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    try {
      val fact = graft.core.Tables.table(spark, dir, "lineitem")
      val dim = graft.core.Tables.table(spark, dir, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
      val j = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(org.apache.spark.sql.functions.sum(col("l_quantity")))
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("might_contain") && p.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n$p")
      // the filter must sit on the FACT scan side, before its exchange
      assert(p.linesIterator.exists(l =>
        l.contains("might_contain") && l.contains("l_orderkey")),
        s"bloom filter not applied to the fact key:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("staging scans prune by partition columns") {
    val root = scratch("plan-staging")
    import spark.implicits._
    val day = Seq(
      ("""{"_metadata":{"type":"commit","processedAt":"2024-01-01T00:00:00Z","links":{"self":{"href":"u1"}}},"sha":"s"}""")
    ).toDF("data")
    graft.ingest.Staging.writeStaging(
      graft.ingest.Staging.stage(day, "2024-01-01"), root)
    val scan = graft.ingest.Staging.readEntity(spark, root, "2024-01-01", "commit")
    val p = scan.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") &&
      (p.contains("ingest_date") || p.contains("entity_name")),
      s"partition pruning missing:\n$p")
  }

  test("classifier scoring (q179) is a pure projection — zero exchanges") {
    val p = plan("q179_classifier_score")
    assert(!p.contains("Exchange"),
      s"corpus-wide scoring must not shuffle:\n$p")
  }

  test("temperature mix (q180): budgets broadcast, ONE window shuffle on the corpus") {
    val p = plan("q180_temperature_mix")
    assert(p.contains("BroadcastExchange"),
      s"per-group budgets should broadcast:\n$p")
    // the corpus side must never sort-merge against the tiny budget/fold
    // frames (their own exchanges move a handful of group rows)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"corpus shuffled into a join it should broadcast:\n$p")
  }

  test("embed covariance (q185): cells generate map-side — no join, partial agg") {
    val p = plan("q185_embed_cov")
    assert(!p.contains("Join"),
      s"the Gram matrix must not self-join the corpus:\n$p")
    // partial aggregation collapses each partition to ≤ d(d+1)/2 rows
    // before the one exchange
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"expected map-side partial aggregation:\n$p")
    assert(p.sliding("Exchange".length).count(_ == "Exchange") <= 2,
      s"one tiny shuffle expected:\n$p")
  }

  test("related docs (q186): prefix-filtered candidates, never cartesian, heap top-k") {
    val p = plan("q186_related_docs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"similarity top-k must not go quadratic:\n$p")
    assert(p.contains("topk_by_score") || p.contains("TopKByScore"),
      s"per-doc ranking should use the bounded heap, not a window sort:\n$p")
  }

  test("assortativity (q189) reduces to one 6-moment aggregate — no window") {
    val p = plan("q189_assortativity")
    assert(!p.contains("Window"), s"closed-form Pearson needs no window:\n$p")
  }

  test("SRP-LSH pairs (q213) band-join — never cartesian, signatures are one projection") {
    val p = plan("q213_srp_lsh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"hamming pairing must ride the band equi-join:\n$p")
  }

  test("incremental join view (q210): empty dim-delta term prunes to nothing") {
    import org.apache.spark.sql.functions._
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val dim = spark.read.parquet(s"$dir/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
    val emptyDim = dim.where(lit(false))
    val delta = graft.ops.Incremental.joinViewDelta(
      orders, orders.limit(0), dim, emptyDim, Seq("o_custkey"))
    // Catalyst's PropagateEmptyRelation should eliminate BOTH delta terms
    // (ΔF and ΔD empty) — the O(delta) promise shows up as an empty plan
    val optimized = delta.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("Join"),
      s"empty deltas must optimize the join terms away:\n$optimized")
  }

  test("recursive CTE spine (q208): recursion is rows-per-level tiny, join stays on the aggregate") {
    val p = plan("q208_recursive_cte")
    assert(!p.contains("CartesianProduct"), s"spine join went quadratic:\n$p")
  }

  test("sole-late Q21 shape (q222): EXISTS/NOT EXISTS decorrelate to semi/anti joins") {
    val p = plan("q222_sole_late")
    assert(p.contains("LeftSemi"), s"EXISTS did not become a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS did not become an anti join:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("market share Q8 shape (q221): dimension chains broadcast, no cartesian") {
    val p = plan("q221_market_share")
    assert(p.contains("BroadcastHashJoin"), s"dims did not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
  }

  test("Q2/Q22 shapes decorrelate: scalar-min equality becomes a join, anti-EXISTS a LeftAnti") {
    val p235 = plan("q235_min_cost_supplier")
    assert(!p235.contains("CartesianProduct"),
      s"correlated min must decorrelate, not nest:\n$p235")
    val p237 = plan("q237_idle_customers")
    assert(p237.contains("LeftAnti"),
      s"filtered NOT EXISTS did not become an anti join:\n$p237")
    assert(!p237.contains("CartesianProduct"))
  }

  test("rolling actives (q234): coverage explode, no quadratic day join") {
    val p = plan("q234_rolling_active")
    assert(p.contains("Generate"), s"coverage explode missing:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
  }
  test("returned revenue Q10 shape (q246): date prunes at scan, top-20 is TakeOrdered") {
    val p = plan("q246_returned_revenue")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 should never global-sort:\n$p")
    assert(p.contains("BroadcastHashJoin"), "nation/customer chain should broadcast")
    assert(p.contains("PushedFilters") && p.contains("l_returnflag"),
      "returnflag must reach the lineitem scan")
  }

  test("big orders Q18 shape (q247): fact aggregates BEFORE the dim joins") {
    val p = plan("q247_big_orders")
    val aggIdx = p.indexOf("HashAggregate")
    val joinIdx = p.indexOf("Join")
    assert(aggIdx >= 0 && joinIdx >= 0 && aggIdx > joinIdx,
      "plan prints top-down: the join must sit ABOVE the order-grain aggregate " +
        s"(agg@$aggIdx join@$joinIdx)\n$p")
    assert(p.contains("BroadcastHashJoin"), "post-agg dim joins should broadcast")
  }

  test("brand brackets Q19 shape (q248): OR envelope pushes to both scans") {
    val p = plan("q248_brand_brackets")
    // Catalyst extracts p_brand IN (...) from the disjunction onto the part scan
    assert(p.contains("p_brand"), s"brand envelope missing:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("PushedFilters"))
  }

  test("pricing summary Q1 shape (q254): single-pass partial agg, date at scan") {
    val p = plan("q254_pricing_summary")
    // partial/final HashAggregate pair — map-side combine collapses to 6 rows
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"no partial aggregation pair:\n$p")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      "ship-date cut must reach the scan")
    assert(!p.contains("Exchange hashpartitioning") ||
      p.indexOf("Exchange") > 0, "unexpected plan")
  }

  test("local supplier volume Q5 shape (q255): all four dims broadcast") {
    val p = plan("q255_local_supplier_volume")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"dimension chain must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("PushedFilters") && p.contains("o_orderdate"),
      "year cut must prune orders at the scan")
  }

  test("market share Q8 shape (q256): two-role nation joins stay broadcast") {
    val p = plan("q256_market_share")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      s"two-alias nation + dims must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("order-count distribution Q13 shape (q259): outer join preserved") {
    val p = plan("q259_order_count_dist")
    assert(p.contains("LeftOuter") || p.contains("RightOuter"),
      s"zero-order customers must survive — outer join required:\n$p")
    // two aggregates: customer grain then count grain
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"double agg missing:\n$p")
  }

  test("top supplier Q15 shape (q260): scalar max replicates, never collects") {
    val p = plan("q260_top_supplier")
    // the 1-row max frame joins via broadcast nested loop (cross of 1 row)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"scalar-max must broadcast:\n$p")
  }

  test("HLL per-type distinct (q251): ONE pass, no per-group union of jobs") {
    // round-5 verdict: q251 ran hllBuild+hllEstimate once PER event type
    // and unioned the 1-row results — T+1 jobs, T scans of events. The
    // grouped API must plan as a single pass: no Union of per-type
    // branches, and `events` scanned at most twice (registers + the
    // exact-distinct comparison column).
    val p = plan("q251_hll_distinct")
    assert(!p.contains("Union"), s"per-group branches unioned:\n$p")
    // AQE prints Final + Initial sections; count scans in the FINAL only
    val finalP = p.split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(finalP).size
    assert(scans <= 2, s"events scanned $scans times — per-type loop is back:\n$p")
  }

  test("waiting suppliers Q21 shape (q262): aggregate cascade, no 4-way self-join blowup") {
    val p = plan("q262_waiting_suppliers")
    assert(!p.contains("CartesianProduct"), s"self-join went quadratic:\n$p")
    assert(p.contains("TakeOrderedAndProject"), "top-20 should never global-sort")
    // order-grain frames co-key on l_orderkey: SMJ/SHJ on the same key
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"))
  }

  test("global top-k ranks (bm25) never single-partition-sort the corpus") {
    // a no-partition row_number window moves everything to one partition;
    // the rank<=k filter must bound what reaches it — either
    // TakeOrderedAndProject (distributed bounded heap below the window,
    // what Spark actually plans here) or WindowGroupLimit (per-partition
    // local top-k). Without one of these, the window sorts the corpus.
    val p = plan("q85_bm25")
    assert(p.contains("TakeOrderedAndProject") || p.contains("WindowGroupLimit"),
      s"global rank fully sorts the corpus on one partition:\n$p")
  }

  test("PQ encode is ONE fused codegen expression — no 64KB interpreted fallback") {
    val p = plan("q173_pq_ann")
    assert(p.contains("pq_encode"),
      s"corpus-side encode lost the fused expression:\n$p")
    // the old m*k-literal spelling shows up as array_min over struct arrays
    assert(!p.contains("array_min"),
      s"literal argmin spelling is back (64KB codegen risk):\n$p")
  }

  test("auto-dial dedup assigns via the projection expression, no row expansion") {
    // q276's own executed plan is lineage-truncated by the CC
    // localCheckpoint, so probe the pair stage (the plan that carries the
    // assignment) directly at the same auto dial
    import org.apache.spark.sql.functions.col
    val df = graft.ops.Ann.cosineDupPairs(
      spark.read.parquet(s"$dir/embeddings.parquet"),
      "vec_id", "embedding", 64, threshold = 0.4, numCentroids = 0)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("nearest_centroid_idx"),
      s"assignment lost the projection expression:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("row_number"), s"assignment re-expanded:\n$p")
  }
}

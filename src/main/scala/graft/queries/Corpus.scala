package graft.queries

import graft.core.Tables.table
import graft.ops.{Ann, TextAnalysis, TextDedup}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4 corpus-curation additions: SemDeDup-style semantic dedup over
  * embeddings, C4-style chunk/line dedup, and BM25 relevance ranking.
  * Oracle conventions follow [[Training]] (fixed-order float arithmetic,
  * literal-for-literal expression mirroring).
  */
object Corpus {

  private val Dim = 64
  private def docs(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
  private def embs(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")

  /** SemDeDup: embedding near-dup pairs (IVF-blocked cosine ≥ 0.4, same
    * blocking as q30) → connected components → one survivor per semantic
    * group. [[Ann.semanticDedup]]. */
  def q83SemanticDedup(spark: SparkSession, dir: String): DataFrame =
    Ann.semanticDedup(embs(spark, dir), "vec_id", "embedding", Dim,
      threshold = 0.4, numCentroids = 16)

  /** q83's dedup with the granularity dial turned BY THE ENGINE:
    * `numCentroids <= 0` sizes K = ⌈n/512⌉ ([[Ann.autoGranularity]]) —
    * cell population pinned, so in-cell candidate volume stays linear
    * in corpus size (the 100×-probe lesson as a default instead of a
    * footnote; BASELINE.md dial table). The oracle replays the choice:
    * a scalar subquery computes the same K from the same count. */
  def q276AutoDialDedup(spark: SparkSession, dir: String): DataFrame =
    Ann.semanticDedup(embs(spark, dir), "vec_id", "embedding", Dim,
      threshold = 0.4, numCentroids = 0)

  /** Corpus-wide chunk dedup: 10-token chunks, first occurrence wins,
    * documents rebuilt from surviving chunks. [[TextDedup.lineDedup]]. */
  def q84LineDedup(spark: SparkSession, dir: String): DataFrame =
    TextDedup.lineDedup(docs(spark, dir), "doc_id", "text", chunkTokens = 10)

  /** BM25 top-100 for a 3-term query. k1 = 1.5 and b = 0.75 are exactly
    * representable doubles, so every constant in the scoring formula is
    * bit-identical across engines. [[TextAnalysis.bm25]]. */
  def q85Bm25(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.bm25(docs(spark, dir), "doc_id", "text",
      terms = bm25Terms, k = 100, k1 = 1.5, b = 0.75)

  private val bm25Terms = Seq("spark", "query", "join")

  /** Shannon entropy of each language's SOURCE distribution — the
    * corpus-balance diagnostic a data-mixing pipeline watches (entropy
    * collapsing toward 0 = one source dominating a language). Per-term
    * `p·ln p` is computed identically in both engines from exact integer
    * counts, then folded in source order with seed 0.0 — the q70
    * fixed-order float discipline, so the oracle hash-matches. */
  def q93SourceEntropy(spark: SparkSession, dir: String): DataFrame = {
    val counts = docs(spark, dir)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("c"))
    val withP = counts
      .withColumn("n", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))))
      .withColumn("v", (col("c").cast("double") / col("n").cast("double")) *
        log(col("c").cast("double") / col("n").cast("double")))
    withP.groupBy(col("lang"))
      .agg(sum(col("c")).as("n_docs"),
        count(lit(1)).as("n_sources"),
        sort_array(collect_list(struct(col("source"), col("v")))).as("arr"))
      .select(col("lang"), col("n_docs"), col("n_sources"),
        round(negate(aggregate(
          transform(col("arr"), e => e.getField("v")),
          lit(0.0), (a, x) => a + x)), 6).as("entropy"))
  }

  /** Deterministic epoch shuffle: the reproducible random order a
    * training run reads the corpus in ([[graft.ops.Sampling
    * .deterministicShuffle]]). The oracle replays the position key —
    * md5-derived, a pure function of (doc_id, epoch) — so the assigned
    * order is proven engine-independent; the spec covers the
    * range-partitioned mechanics (global sortedness without a global
    * sort). */
  def q162Shuffle(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.deterministicShuffle(
      docs(spark, dir).select(col("doc_id")), "doc_id", epoch = 1)

  /** Dictionary encoding of the source column ([[graft.ops.Encode]]):
    * codes by sorted value order (reproducible on any partitioning /
    * engine), dictionary broadcast back onto the corpus — the big table
    * never shuffles. */
  def q163DictEncode(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val dict = graft.ops.Encode.dictionary(d, "source")
    graft.ops.Encode.encode(d.select(col("doc_id"), col("source")),
      dict, "source")
  }

  /** Length-bucketed batching ([[graft.ops.Packing.lengthBuckets]]):
    * power-of-two token-length bands, longest-first batches of 32, and
    * the per-document padding waste a serving pipeline minimizes. Band
    * is computed via bit length, not float log2 — integer-exact in both
    * engines. */
  def q164LengthBatches(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("toks"))
    graft.ops.Packing.lengthBuckets(d, "doc_id", col("toks"), batchSize = 32)
      .select(col("doc_id"), col("band"), col("batch_idx"),
        col("batch_max"), col("pad_waste"))
  }

  /** Jaro–Winkler near-dup pairs over first-token-blocked prefixes —
    * the native [[graft.functions.JaroWinkler]] expression against
    * DuckDB's built-in `jaro_winkler_similarity` (same standard
    * definition: 0.7 boost threshold, ≤4-char prefix bonus). The q106
    * edit-distance complement for transposition-heavy near-dups. */
  def q165JaroWinkler(spark: SparkSession, dir: String): DataFrame =
    TextDedup.jaroWinklerPairs(docs(spark, dir), "doc_id", "text",
      prefixLen = 30, minSim = 0.9)

  /** Sorted-neighborhood linkage candidates: corpus sorted by a 20-char
    * text prefix, each record scored (Jaro–Winkler) against its 3
    * successors — pair generation is lead() over ONE window, zero joins
    * ([[TextDedup.sortedNeighborhoodPairs]]). Catches near-dup pairs
    * whose first token differs, which first-token equi-blocking (q165)
    * structurally misses. */
  def q166SortedNeighborhood(spark: SparkSession, dir: String): DataFrame =
    TextDedup.sortedNeighborhoodPairs(docs(spark, dir), "doc_id", "text",
      sortKey = substring(col("text"), 1, 20), windowSize = 3,
      prefixLen = 30, minSim = 0.9)

  /** End-to-end entity resolution: candidate pairs from BOTH blocking
    * families — first-token equi-blocks (q165) and sorted-neighborhood
    * (q166), each sound where the other is blind — unioned,
    * canonicalized, transitively closed into entities
    * ([[TextDedup.connectedComponentsStar]], O(log n) rounds); every doc
    * labeled with its entity, cluster size via ONE window over the
    * assignment (no join-back), canonical = lowest id. Same composition
    * discipline as q50/q83: every stage a verified distributed
    * primitive, no collect. */
  def q168EntityResolution(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val block = TextDedup.jaroWinklerPairs(d, "doc_id", "text",
      prefixLen = 30, minSim = 0.9).select(col("doc_a"), col("doc_b"))
    // sorted-neighborhood emits pairs in SORT order — canonicalize to
    // id order before the union so the two families dedup against each
    // other
    val sn = TextDedup.sortedNeighborhoodPairs(d, "doc_id", "text",
        sortKey = substring(col("text"), 1, 20), windowSize = 3,
        prefixLen = 30, minSim = 0.9)
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"))
    val pairs = block.unionByName(sn).distinct()
    val comp = TextDedup.connectedComponentsStar(pairs, "doc_a", "doc_b")
    val assigned = d.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("entity_id"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("entity_id")
    assigned.select(col("doc_id"), col("entity_id"),
      count(lit(1)).over(w).as("cluster_size"),
      (col("doc_id") === col("entity_id")).as("is_canonical"))
  }

  /** Flesch reading-ease per document from structural proxies
    * ([[TextAnalysis.fleschScore]]): projection-only, with the word /
    * syllable-run counts exposed for auditability. */
  def q171Readability(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_words"),
      graft.functions.CharClassRunCount.count(lower(col("text")), "aeiouy")
        .as("n_syllables"),
      TextAnalysis.fleschScore(col("text")).as("flesch"))

  /** Quality-classifier scoring pass ([[TextAnalysis.hashedLinearScore]])
    * — the fastText-style keep/drop gate LLM pipelines run corpus-wide.
    * Weights here are the closed-form pseudo-model
    * `w(b) = ((b·2654435761) mod 1000 − 500) / 1000` (so the oracle can
    * spell the identical model); swap [[TextAnalysis
    * .linearScoreWithWeights]] + a trained vector in production. */
  def q179ClassifierScore(spark: SparkSession, dir: String): DataFrame = {
    val w: Column => Column = b =>
      ((b * lit(2654435761L)) % lit(1000L) - lit(500L)).cast("double") / lit(1000.0)
    docs(spark, dir).select(col("doc_id"),
      round(TextAnalysis.hashedLinearScore(col("text"), 4096, w, bias = 0.1), 6)
        .as("score"),
      (TextAnalysis.hashedLinearScore(col("text"), 4096, w, bias = 0.1)
        >= 0.5).as("keep"))
  }

  /** Temperature-scaled source mixing (share ∝ n^0.5 — the multilingual
    * training-mix rule) over languages: √-scaled budgets from one sorted
    * fold, md5-ranked member selection ([[graft.ops.Sampling
    * .temperatureMix]]) — reproducible on any engine or partitioning. */
  def q180TemperatureMix(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.temperatureMix(
      docs(spark, dir).select(col("doc_id"), col("lang")),
      "lang", "doc_id", total = 300)
      .select(col("doc_id"), col("lang"), col("rnk"), col("budget"))

  /** Reliability table for the q179 classifier: decile buckets of the
    * predicted score vs the observed rate of the q23 quality heuristic —
    * the calibration check run before trusting a keep/drop gate
    * corpus-wide. Scores quantize to exact 1e-6-unit longs before the
    * group mean (order-independent sums; two final float divisions mirror
    * the oracle op-for-op). One projection + one 10-group aggregate. */
  def q191Calibration(spark: SparkSession, dir: String): DataFrame = {
    val w: Column => Column = b =>
      ((b * lit(2654435761L)) % lit(1000L) - lit(500L)).cast("double") / lit(1000.0)
    val score =
      round(TextAnalysis.hashedLinearScore(col("text"), 4096, w, bias = 0.1), 6)
    docs(spark, dir)
      .select(least(floor(score * 10).cast("int"), lit(9)).as("bucket"),
        round(score * 1e6, 0).cast("long").as("__s6"),
        when(TextAnalysis.qualityScore(col("text")) >= 0.5, 1L)
          .otherwise(0L).as("__pos"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("__s6")).cast("double") / lit(1000000.0) /
          count(lit(1)), 6).as("mean_score"),
        round(sum(col("__pos")).cast("double") / count(lit(1)), 6)
          .as("pos_rate"))
  }

  /** Training-shard manifest: the corpus hash-assigned to 8 shards
    * ([[graft.ops.Export.shardAssign]], salt-rotated layout) with the
    * per-shard doc/token totals and order-independent content
    * signatures a trainer validates before reading
    * ([[graft.ops.Export.shardManifest]]). */
  def q216ShardManifest(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Export.shardManifest(
      graft.ops.Export.shardAssign(docs(spark, dir), "doc_id",
        numShards = 8, salt = "e1"),
      "doc_id", "text")

  /** Intra-source boilerplate share: per source, the fraction of
    * (doc, 3-gram) pairs whose gram recurs in ≥2 docs of the SAME source
    * — the "template text" score that flags scraped mirrors and
    * autogenerated pages before they skew training. One explode + two
    * exact-integer aggregates over 60-bit shingle hashes (8-byte keys
    * through both shuffles). */
  def q217Boilerplate(spark: SparkSession, dir: String): DataFrame = {
    val pairs = docs(spark, dir).select(col("source"),
      explode(TextDedup.shingleHashes(col("text"), 3)).as("sh"))
    pairs.groupBy(col("source"), col("sh"))
      // shingles are distinct within a doc, so count(*) = docs containing
      .agg(count(lit(1)).as("nd"))
      .groupBy(col("source"))
      .agg(sum(col("nd")).as("n_pairs"),
        sum(when(col("nd") > 1, col("nd")).otherwise(0L)).as("n_repeated"))
      .select(col("source"), col("n_pairs"), col("n_repeated"),
        round(col("n_repeated").cast("double") /
          col("n_pairs").cast("double"), 6).as("boilerplate_share"))
  }

  /** Cross-source vocabulary overlap matrix: for every source pair, the
    * count of SHARED distinct 3-gram hashes and the set Jaccard — the
    * "are these crawls the same corpus wearing two names" screen (exact
    * cross-source duplicate TEXTS are zero on this corpus; gram overlap
    * is where leakage actually shows). Distinct (source, gram) frame
    * self-joins on the gram key — an equi-join that scales, never a
    * doc-level cross join. */
  def q218SourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val e = docs(spark, dir).select(col("source"),
        explode(TextDedup.shingleHashes(col("text"), 3)).as("sh"))
      .distinct()
    val sizes = e.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val shared = e.select(col("source").as("source_a"), col("sh"))
      .join(e.select(col("source").as("source_b"), col("sh")), Seq("sh"))
      .where(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(broadcast(sizes.select(col("source").as("source_a"),
        col("n").as("na"))), Seq("source_a"))
      .join(broadcast(sizes.select(col("source").as("source_b"),
        col("n").as("nb"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        round(col("n_shared").cast("double") /
          (col("na") + col("nb") - col("n_shared")).cast("double"), 6)
          .as("jaccard"))
  }

  /** Quality-gate yield curve: for thresholds 0.0 … 0.9, how many docs
    * and tokens survive `quality ≥ t` — the knob-tuning table a curator
    * reads before committing a corpus-wide keep/drop (pairs with q191's
    * calibration). Ten broadcast threshold rows against the scored
    * projection; conditional integer sums. */
  def q219ThresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    val scored = docs(spark, dir).select(
      TextAnalysis.qualityScore(col("text")).as("q"),
      size(split(col("text"), " ")).cast("long").as("toks"))
    val th = spark.range(10)
      .select((col("id").cast("double") / 10.0).as("threshold"))
    scored.crossJoin(broadcast(th))
      .groupBy(col("threshold"))
      .agg(sum(when(col("q") >= col("threshold"), 1L).otherwise(0L))
          .as("n_docs_kept"),
        sum(when(col("q") >= col("threshold"), col("toks")).otherwise(0L))
          .as("n_tokens_kept"))
  }

  /** Heaps-law BIGRAM vocabulary growth every 50 docs in id order
    * ([[TextAnalysis.vocabGrowth]] — first-appearance trick: one token
    * aggregate, no per-checkpoint rescans; bigram grain because the
    * synthetic unigram vocab saturates inside the first bucket). */
  def q227VocabGrowth(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabGrowth(docs(spark, dir), "doc_id", "text",
      bucket = 50L, n = 2)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q216_shard_manifest" -> q216ShardManifest,
    "q227_vocab_growth" -> q227VocabGrowth,
    "q217_boilerplate" -> q217Boilerplate,
    "q218_source_overlap" -> q218SourceOverlap,
    "q219_threshold_sweep" -> q219ThresholdSweep,
    "q191_calibration" -> q191Calibration,
    "q171_readability" -> q171Readability,
    "q179_classifier_score" -> q179ClassifierScore,
    "q180_temperature_mix" -> q180TemperatureMix,
    "q168_entity_resolution" -> q168EntityResolution,
    "q166_sorted_neighborhood" -> q166SortedNeighborhood,
    "q93_source_entropy" -> q93SourceEntropy,
    "q83_semantic_dedup" -> q83SemanticDedup,
    "q276_auto_dial_dedup" -> q276AutoDialDedup,
    "q84_line_dedup" -> q84LineDedup,
    "q85_bm25" -> q85Bm25,
    "q162_shuffle" -> q162Shuffle,
    "q163_dict_encode" -> q163DictEncode,
    "q164_length_batches" -> q164LengthBatches,
    "q165_jaro_winkler" -> q165JaroWinkler
  )

  /** Fixed left-associated Σ a[i]·b[i] (1-based DuckDB lists) — the same
    * summation order [[Ann.dot]] pins. */
  private def dotSql(a: String, b: String): String =
    (1 to Dim).map(i => s"$a.embedding[$i]::DOUBLE * $b.embedding[$i]::DOUBLE")
      .mkString(" + ")

  /** Hashed word-3-gram rows per (source, doc) — shared by q217/q218. */
  private val srcShingleCtes =
    """w AS (SELECT doc_id, source, string_split(text, ' ') ws
      |      FROM documents),
      |s AS (SELECT doc_id, source,
      |        list_transform(
      |          list_distinct([ws[g] || ' ' || ws[g+1] || ' ' || ws[g+2]
      |                         for g in generate_series(1, len(ws)-2)]),
      |          g -> ('0x' || substr(md5(g), 1, 15))::BIGINT) shs
      |      FROM w),
      |e AS (SELECT doc_id, source, unnest(shs) sh FROM s)""".stripMargin

  val oracles: Map[String, String] = Map(
    // same first-appearance trick: token → min(doc_id) → bucket counts →
    // running sum; the curve never rescans the corpus per checkpoint
    "q227_vocab_growth" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') ws
        |  FROM documents),
        |t AS (SELECT doc_id,
        |    unnest(list_distinct([ws[g] || ' ' || ws[g + 1]
        |                          for g in generate_series(1, len(ws) - 1)]))
        |      tok
        |  FROM w),
        |f AS (SELECT tok, min(doc_id) fd FROM t
        |      WHERE length(tok) > 0 GROUP BY 1),
        |b AS (SELECT fd // 50 bkt, count(*) new_tokens FROM f GROUP BY 1)
        |SELECT (bkt + 1) * 50 AS docs_seen,
        |  CAST(new_tokens AS BIGINT) AS new_tokens,
        |  CAST(sum(new_tokens) OVER (ORDER BY bkt
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size
        |FROM b""".stripMargin,
    "q217_boilerplate" ->
      s"""WITH $srcShingleCtes,
         |g AS (SELECT source, sh, count(*) nd FROM e GROUP BY 1, 2)
         |SELECT source, CAST(sum(nd) AS BIGINT) AS n_pairs,
         |  CAST(sum(CASE WHEN nd > 1 THEN nd ELSE 0 END) AS BIGINT)
         |    AS n_repeated,
         |  round(sum(CASE WHEN nd > 1 THEN nd ELSE 0 END)::DOUBLE
         |    / sum(nd)::DOUBLE, 6) AS boilerplate_share
         |FROM g GROUP BY 1""".stripMargin,
    "q218_source_overlap" ->
      s"""WITH $srcShingleCtes,
         |d AS (SELECT DISTINCT source, sh FROM e),
         |sz AS (SELECT source, count(*) n FROM d GROUP BY 1),
         |sh AS (SELECT a.source source_a, b.source source_b, count(*) ns
         |       FROM d a JOIN d b ON a.sh = b.sh AND a.source < b.source
         |       GROUP BY 1, 2)
         |SELECT source_a, source_b, ns AS n_shared,
         |  round(ns::DOUBLE / (za.n + zb.n - ns)::DOUBLE, 6) AS jaccard
         |FROM sh JOIN sz za ON za.source = source_a
         |        JOIN sz zb ON zb.source = source_b""".stripMargin,
    "q219_threshold_sweep" -> {
      val en = graft.queries.Training.stopwordIn
      s"""WITH f AS (SELECT text, string_split(text, ' ') ws FROM documents),
         |m AS (SELECT
         |    round(len(regexp_extract_all(lower(text), '[^a-z0-9 ]'))::DOUBLE
         |      / length(text), 6) punct_ratio,
         |    round(len(list_filter(ws, t -> t IN $en))::DOUBLE
         |      / len(ws), 6) stopword_ratio,
         |    length(text) n_chars, len(ws) toks
         |  FROM f),
         |q AS (SELECT round((
         |      (CASE WHEN n_chars BETWEEN 100 AND 5000 THEN 1.0 ELSE 0.0 END)
         |    + (CASE WHEN punct_ratio <= 0.1 THEN 1.0 ELSE 0.0 END)
         |    + (CASE WHEN stopword_ratio > 0 THEN 1.0 ELSE 0.0 END)) / 3.0, 6)
         |      q, toks FROM m),
         |t AS (SELECT g::DOUBLE / 10.0 threshold
         |      FROM generate_series(0, 9) s(g))
         |SELECT threshold,
         |  CAST(sum(CASE WHEN q >= threshold THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_docs_kept,
         |  CAST(sum(CASE WHEN q >= threshold THEN toks ELSE 0 END) AS BIGINT)
         |    AS n_tokens_kept
         |FROM q CROSS JOIN t GROUP BY 1""".stripMargin
    },
    // same md5-mod assignment and signature hashes; % ≡ pmod on the
    // non-negative 60-bit hash
    "q216_shard_manifest" ->
      """WITH a AS (SELECT doc_id, text,
        |    ('0x' || substr(md5(doc_id::VARCHAR || '|e1'), 1, 15))::BIGINT
        |      % 8 AS shard_id
        |  FROM documents),
        |h AS (SELECT shard_id,
        |    ('0x' || substr(md5(doc_id::VARCHAR || '|' || md5(text)),
        |      1, 15))::BIGINT hh,
        |    len(string_split(text, ' ')) nt
        |  FROM a)
        |SELECT shard_id, count(*) AS n_docs,
        |  CAST(sum(nt) AS BIGINT) AS n_tokens,
        |  bit_xor(hh)::BIGINT AS xor_sig,
        |  CAST(sum(hh % 1048573) AS BIGINT) AS sum_sig
        |FROM h GROUP BY 1""".stripMargin,
    // q179's score chain + q23's quality chain, joined and decile-bucketed;
    // scores quantize to 1e-6 longs before the mean (order-free sums) and
    // the two final divisions mirror the engine op-for-op
    "q191_calibration" -> {
      val en = TextAnalysis.stopwords.head._2
        .map(t => s"'$t'").mkString("(", ",", ")")
      s"""WITH t AS (SELECT doc_id,
         |  list_reduce(list_prepend(0.1::DOUBLE,
         |    list_transform(string_split(text, ' '),
         |      t -> (((('0x' || substr(md5(t), 1, 15))::BIGINT % 4096)
         |             * 2654435761) % 1000 - 500)::DOUBLE / 1000.0)),
         |    (a, x) -> a + x) z
         |  FROM documents),
         |sc AS (SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 6) AS score
         |       FROM t),
         |f AS (SELECT doc_id, text, string_split(text, ' ') ws
         |      FROM documents),
         |m AS (SELECT doc_id,
         |  round(len(regexp_extract_all(lower(text), '[^a-z0-9 ]'))::DOUBLE
         |    / length(text), 6) punct_ratio,
         |  round(len(list_filter(ws, t -> t IN $en))::DOUBLE / len(ws), 6)
         |    stopword_ratio,
         |  length(text) n_chars FROM f),
         |q AS (SELECT doc_id,
         |  round(((CASE WHEN n_chars BETWEEN 100 AND 5000 THEN 1.0 ELSE 0.0 END)
         |       + (CASE WHEN punct_ratio <= 0.1 THEN 1.0 ELSE 0.0 END)
         |       + (CASE WHEN stopword_ratio > 0 THEN 1.0 ELSE 0.0 END))
         |    / 3.0, 6) AS quality
         |  FROM m),
         |lab AS (SELECT least(CAST(floor(sc.score * 10) AS INTEGER), 9)
         |            AS bucket,
         |          CAST(round(sc.score * 1000000) AS BIGINT) AS s6,
         |          CASE WHEN q.quality >= 0.5 THEN 1 ELSE 0 END AS pos
         |        FROM sc JOIN q ON sc.doc_id = q.doc_id)
         |SELECT bucket, count(*) AS n_docs,
         |  round(CAST(sum(s6) AS DOUBLE) / 1000000.0 / count(*), 6)
         |    AS mean_score,
         |  round(CAST(sum(pos) AS DOUBLE) / count(*), 6) AS pos_rate
         |FROM lab GROUP BY bucket""".stripMargin
    },
    "q180_temperature_mix" ->
      """WITH c AS (SELECT lang, count(*)::BIGINT n FROM documents GROUP BY 1),
        |s AS (SELECT lang, sqrt(n::DOUBLE) sv FROM c),
        |tot AS (SELECT list_reduce(list_prepend(0.0::DOUBLE,
        |          list(sv ORDER BY lang)), (a, x) -> a + x) S FROM s),
        |b AS (SELECT s.lang,
        |        CAST(floor(300.0 * s.sv / tot.S) AS BIGINT) budget
        |      FROM s, tot),
        |r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |        ORDER BY ('0x' || substr(md5(doc_id::VARCHAR || ':t0'), 1, 15))::BIGINT,
        |          doc_id) rnk
        |      FROM documents)
        |SELECT r.doc_id, r.lang, r.rnk, b.budget
        |FROM r JOIN b ON b.lang = r.lang WHERE r.rnk <= b.budget""".stripMargin,
    // bias rides as the fold seed via list_prepend → the IEEE sequence
    // ((bias + w1) + w2)… matches the engine's seeded fold exactly
    "q179_classifier_score" ->
      """WITH t AS (SELECT doc_id,
        |  list_reduce(list_prepend(0.1::DOUBLE,
        |    list_transform(string_split(text, ' '),
        |      t -> (((('0x' || substr(md5(t), 1, 15))::BIGINT % 4096)
        |             * 2654435761) % 1000 - 500)::DOUBLE / 1000.0)),
        |    (a, x) -> a + x) z
        |  FROM documents)
        |SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 6) AS score,
        |  1.0 / (1.0 + exp(-z)) >= 0.5 AS keep
        |FROM t""".stripMargin,
    "q171_readability" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_words,
        |  len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables,
        |  round(206.835
        |    - 1.015 * (len(string_split(text, ' '))::DOUBLE
        |        / greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::DOUBLE)
        |    - 84.6 * (len(regexp_extract_all(lower(text), '[aeiouy]+'))::DOUBLE
        |        / len(string_split(text, ' '))::DOUBLE), 6) AS flesch
        |FROM documents""".stripMargin,
    "q168_entity_resolution" ->
      """WITH RECURSIVE
        |base AS (SELECT doc_id, string_split(text, ' ')[1] ft,
        |    substr(text, 1, 30) pfx, substr(text, 1, 20) sk FROM documents),
        |blk AS (SELECT a.doc_id doc_a, b.doc_id doc_b
        |  FROM base a JOIN base b ON a.ft = b.ft AND a.doc_id < b.doc_id
        |  WHERE round(jaro_winkler_similarity(a.pfx, b.pfx), 6) >= 0.9),
        |o AS (SELECT *, row_number() OVER (ORDER BY sk, doc_id) rn FROM base),
        |sn AS (SELECT least(a.doc_id, b.doc_id) doc_a,
        |         greatest(a.doc_id, b.doc_id) doc_b
        |  FROM o a JOIN o b ON b.rn BETWEEN a.rn + 1 AND a.rn + 3
        |  WHERE round(jaro_winkler_similarity(a.pfx, b.pfx), 6) >= 0.9),
        |p AS (SELECT * FROM blk UNION SELECT * FROM sn),
        |und AS (SELECT doc_a u, doc_b v FROM p
        |        UNION SELECT doc_b, doc_a FROM p),
        |reach(u, v) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM und)
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
        |comp AS (SELECT u doc_id, min(v) entity FROM reach GROUP BY u),
        |asg AS (SELECT d.doc_id, coalesce(c.entity, d.doc_id) entity_id
        |  FROM documents d LEFT JOIN comp c USING (doc_id))
        |SELECT doc_id, entity_id,
        |  count(*) OVER (PARTITION BY entity_id) AS cluster_size,
        |  doc_id = entity_id AS is_canonical
        |FROM asg""".stripMargin,
    "q166_sorted_neighborhood" ->
      """WITH base AS (SELECT doc_id AS doc_a, substr(text, 1, 30) pfx,
        |    substr(text, 1, 20) sk FROM documents),
        |o AS (SELECT *, row_number() OVER (ORDER BY sk, doc_a) rn FROM base)
        |SELECT a.doc_a, b.doc_a AS doc_b,
        |  round(jaro_winkler_similarity(a.pfx, b.pfx), 6) AS jw_sim
        |FROM o a JOIN o b ON b.rn BETWEEN a.rn + 1 AND a.rn + 3
        |WHERE round(jaro_winkler_similarity(a.pfx, b.pfx), 6) >= 0.9""".stripMargin,
    "q165_jaro_winkler" ->
      """WITH base AS (SELECT doc_id, string_split(text, ' ')[1] ft,
        |    substr(text, 1, 30) pfx FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  round(jaro_winkler_similarity(a.pfx, b.pfx), 6) AS jw_sim
        |FROM base a JOIN base b ON a.ft = b.ft AND a.doc_id < b.doc_id
        |WHERE round(jaro_winkler_similarity(a.pfx, b.pfx), 6) >= 0.9""".stripMargin,
    "q163_dict_encode" ->
      """WITH dict AS (SELECT source,
        |    (row_number() OVER (ORDER BY source) - 1)::INT AS code
        |  FROM (SELECT DISTINCT source FROM documents))
        |SELECT d.doc_id, d.source, dict.code AS source_code
        |FROM documents d JOIN dict USING (source)""".stripMargin,
    "q164_length_batches" ->
      """WITH t AS (SELECT doc_id,
        |    len(string_split(text, ' '))::BIGINT AS toks FROM documents),
        |b AS (SELECT doc_id, toks,
        |        (len(bin(greatest(toks, 1))) - 1)::INT AS band FROM t),
        |r AS (SELECT *, row_number() OVER (PARTITION BY band
        |        ORDER BY toks DESC, doc_id) rn FROM b)
        |SELECT doc_id, band, ((rn - 1) // 32)::BIGINT AS batch_idx,
        |  max(toks) OVER (PARTITION BY band, (rn - 1) // 32)::BIGINT
        |    AS batch_max,
        |  (max(toks) OVER (PARTITION BY band, (rn - 1) // 32)
        |    - toks)::BIGINT AS pad_waste
        |FROM r""".stripMargin,
    "q162_shuffle" ->
      """SELECT doc_id,
        |  ('0x' || substr(md5(doc_id::VARCHAR || ':epoch1'), 1, 15))::BIGINT
        |    AS shuffle_pos
        |FROM documents""".stripMargin,
    "q93_source_entropy" ->
      """WITH c AS (SELECT lang, source, count(*) c
        |           FROM documents GROUP BY 1, 2),
        |w AS (SELECT lang, source,
        |        (c::DOUBLE / sum(c) OVER (PARTITION BY lang)::DOUBLE) *
        |          ln(c::DOUBLE / sum(c) OVER (PARTITION BY lang)::DOUBLE) v,
        |        c
        |      FROM c),
        |g AS (SELECT lang, sum(c)::BIGINT n_docs, count(*) n_sources,
        |        array_agg(v ORDER BY source) vs
        |      FROM w GROUP BY lang)
        |SELECT lang, n_docs, n_sources,
        |  round(-list_reduce(list_prepend(0.0::DOUBLE, vs),
        |    (a, b) -> a + b), 6) AS entropy
        |FROM g""".stripMargin,
    // q30's pair CTE (same blocking, threshold, rounding-free compare)
    // + q42's transitive closure + keep-min labeling
    "q83_semantic_dedup" ->
      s"""WITH RECURSIVE
         |n AS (SELECT vec_id, embedding, sqrt(${dotSql("e", "e")}) nrm
         |      FROM embeddings e),
         |c AS (SELECT vec_id cid, embedding, nrm FROM n WHERE vec_id < 16),
         |asg AS (SELECT vec_id, embedding, nrm, cid FROM (
         |  SELECT v.vec_id, v.embedding, v.nrm, c.cid,
         |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |      (${dotSql("v", "c")}) / (v.nrm * c.nrm) DESC, c.cid) rn
         |  FROM n v CROSS JOIN c) WHERE rn = 1),
         |p AS (SELECT a.vec_id vec_a, b.vec_id vec_b
         |      FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
         |      WHERE (${dotSql("a", "b")}) / (a.nrm * b.nrm) >= 0.4),
         |und AS (SELECT vec_a u, vec_b v FROM p
         |        UNION SELECT vec_b, vec_a FROM p),
         |reach(u, v) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM und)
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
         |comp AS (SELECT u vec_id, min(v) component FROM reach GROUP BY u)
         |SELECT em.vec_id,
         |  coalesce(comp.component, em.vec_id) AS component,
         |  (em.vec_id = coalesce(comp.component, em.vec_id)) AS keep
         |FROM embeddings em LEFT JOIN comp ON comp.vec_id = em.vec_id""".stripMargin,
    // q83's replay with the seed cutoff computed the way the engine
    // computes it: K = ceil(n / 512) by scalar subquery
    "q276_auto_dial_dedup" ->
      s"""WITH RECURSIVE
         |n AS (SELECT vec_id, embedding, sqrt(${dotSql("e", "e")}) nrm
         |      FROM embeddings e),
         |c AS (SELECT vec_id cid, embedding, nrm FROM n
         |      WHERE vec_id < (SELECT CAST(ceil(count(*) / 512.0) AS BIGINT)
         |                      FROM embeddings)),
         |asg AS (SELECT vec_id, embedding, nrm, cid FROM (
         |  SELECT v.vec_id, v.embedding, v.nrm, c.cid,
         |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |      (${dotSql("v", "c")}) / (v.nrm * c.nrm) DESC, c.cid) rn
         |  FROM n v CROSS JOIN c) WHERE rn = 1),
         |p AS (SELECT a.vec_id vec_a, b.vec_id vec_b
         |      FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
         |      WHERE (${dotSql("a", "b")}) / (a.nrm * b.nrm) >= 0.4),
         |und AS (SELECT vec_a u, vec_b v FROM p
         |        UNION SELECT vec_b, vec_a FROM p),
         |reach(u, v) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM und)
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
         |comp AS (SELECT u vec_id, min(v) component FROM reach GROUP BY u)
         |SELECT em.vec_id,
         |  coalesce(comp.component, em.vec_id) AS component,
         |  (em.vec_id = coalesce(comp.component, em.vec_id)) AS keep
         |FROM embeddings em LEFT JOIN comp ON comp.vec_id = em.vec_id""".stripMargin,
    "q84_line_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') ts FROM documents),
        |ch AS (SELECT doc_id, i AS idx,
        |         array_to_string(ts[(i*10+1):(i*10+10)], ' ') chunk
        |       FROM t, UNNEST(generate_series(0,
        |         CAST(ceil(len(ts)/10.0) AS INT) - 1)) AS u(i)),
        |k AS (SELECT *, row_number() OVER (PARTITION BY md5(chunk)
        |        ORDER BY doc_id, idx) rn FROM ch)
        |SELECT doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  string_agg(chunk, ' ' ORDER BY idx) FILTER (WHERE rn = 1)
        |    AS clean_text
        |FROM k GROUP BY doc_id""".stripMargin,
    "q85_bm25" -> {
      val d = bm25Terms.indices.map(i =>
        s"len(list_filter(ts, x -> x = '${bm25Terms(i)}'))::DOUBLE tf_$i")
        .mkString(", ")
      val st = bm25Terms.indices.map(i =>
        s"sum(CASE WHEN tf_$i > 0 THEN 1.0 ELSE 0.0 END) df_$i").mkString(", ")
      val score = bm25Terms.indices.map(i =>
        s"ln((n - df_$i + 0.5) / (df_$i + 0.5) + 1.0) * (tf_$i * 2.5) / " +
          s"(tf_$i + 1.5 * (0.25 + 0.75 * dl / avgdl))").mkString(" + ")
      s"""WITH f AS (SELECT doc_id, string_split(text, ' ') ts FROM documents),
         |d AS (SELECT doc_id, len(ts)::DOUBLE dl, $d FROM f),
         |st AS (SELECT count(*)::DOUBLE n, avg(dl) avgdl, $st FROM d)
         |SELECT doc_id, score, "rank" FROM (
         |  SELECT doc_id, score,
         |    row_number() OVER (ORDER BY score DESC, doc_id ASC) AS "rank"
         |  FROM (SELECT doc_id, round($score, 6) AS score
         |        FROM d CROSS JOIN st)
         |  WHERE score > 0) WHERE "rank" <= 100""".stripMargin
    }
  )
}

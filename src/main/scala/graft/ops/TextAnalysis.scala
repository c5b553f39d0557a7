package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-document text analysis for training-data curation: language
  * identification, quality scoring, token counting, and content
  * fingerprinting. All narrow, codegen'd column expressions — zero
  * shuffles except the fingerprint's per-doc aggregation; at 100 TB these
  * run at scan speed as a single projection pass.
  *
  * Every function is engine-independent (no JVM-specific hashing, fixed
  * expression order) so the DuckDB oracle replays it exactly.
  */
object TextAnalysis {

  /** Stopword profiles for the n-gram/stopword language-ID heuristic.
    * Deliberately tiny and fixed: the operator contract is the scoring
    * machinery, not the lexicon. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "is", "in"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "de" -> Seq("der", "die", "und", "das", "nicht"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des")
  )

  private def words(text: Column): Column = split(text, " ")

  // ≡ size(filter(words(text), t => t.isin(list))) — but that filter
  // lambda is a CodegenFallback evaluated once per profile per row
  // (langId runs 4), the same interpreted-full-corpus-projection class
  // the sf100 probe measured super-linear on punctRatio's regex. The
  // native scan keeps occurrence multiplicity (array_intersect would
  // drop duplicate hits) and the whole projection compiled.
  private def stopCount(text: Column, list: Seq[String]): Column =
    graft.functions.TokenSetCount.count(text, list)

  /** Language ID: score each profile by stopword hits per token, pick the
    * best (ties resolved in fixed profile order); zero hits → "und".
    * A fastText-class model would slot in behind the same column contract. */
  def langId(text: Column): Column = {
    val scores = stopwords.map { case (l, ws) => l -> stopCount(text, ws) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && s > 0, lit(l)).otherwise(acc)
    }
  }

  /** Confidence of [[langId]]: best-profile hits / token count. */
  def langScore(text: Column): Column = {
    val best = stopwords.map { case (_, ws) => stopCount(text, ws) }
      .reduce((a, b) => greatest(a, b))
    round(best.cast("double") / size(words(text)), 6)
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(words(text))

  /** BPE-ish subword proxy count: alpha runs, digit runs, and single
    * punctuation marks each count as one token — the standard cheap
    * stand-in for a real tokenizer when budgeting training data.
    * Spelled as a native class-transition scan
    * ([[graft.functions.BpeTokenCount]]): the regex form
    * `size(regexp_extract_all(text, "[a-z]+|[0-9]+|[^a-z0-9\\s]"))`
    * allocates one UTF8String per TOKEN corpus-wide — the exact
    * allocation-bound super-linear pattern the round-8 sf100 probe
    * caught in punctRatio (BASELINE.md). Value-identical: the three
    * alternatives are disjoint char classes, so greedy runs ≡ runs. */
  def bpeTokenCount(text: Column): Column =
    graft.functions.BpeTokenCount.count(text)

  /** Mean word length (chars / words, separators excluded). */
  def avgWordLen(text: Column): Column = {
    val n = tokenCount(text)
    round((length(text) - (n - 1)).cast("double") / n, 6)
  }

  /** Non-alphanumeric (punctuation/symbol) character ratio. Case-folded
    * first — without `lower()` every CAPITAL letter counted as
    * punctuation, so ordinary title-case prose blew past qualityScore's
    * 0.1 punctuation gate purely for not being pre-lowercased
    * ([[fleschScore]] already folded; this aligns the family). */
  def punctRatio(text: Column): Column = {
    // count the chars NOT in [a-z0-9 ] by deleting the ones that ARE:
    // `translate` with an empty replacement is a straight per-char map,
    // value-identical to size(regexp_extract_all(folded, "[^a-z0-9 ]"))
    // for every string (unicode included — chars outside the deletion
    // alphabet survive and are counted, exactly as the negated class
    // matched them). The regex spellings measured 19×-per-decade on the
    // sf100 probe's quality gate (383 s for 5M docs vs 3 s of scan —
    // java.util.regex per-row cost plus per-match allocation, GC-bound
    // and flat from 14→32 threads); the translate spelling is a
    // codegen'd char loop with one output string per row.
    val folded = lower(text)
    round(length(translate(folded,
        "abcdefghijklmnopqrstuvwxyz0123456789 ", "")).cast("double") /
      length(text), 6)
  }

  /** English stopword ratio — the classic fluency proxy. */
  def stopwordRatio(text: Column): Column =
    round(stopCount(text, stopwords.head._2).cast("double") / tokenCount(text), 6)

  /** Composite quality score in [0,1]: length band + low punctuation +
    * stopword presence, equally weighted. The weights are the contract;
    * callers recalibrate per corpus. */
  def qualityScore(text: Column): Column = {
    val lenOk = when(length(text).between(100, 5000), lit(1.0)).otherwise(lit(0.0))
    val punctOk = when(punctRatio(text) <= 0.1, lit(1.0)).otherwise(lit(0.0))
    // "any stopword present" ≡ stopwordRatio > 0, spelled as the native
    // codegen'd arrays_overlap instead of the interpreted filter-lambda
    // HOF behind stopCount — the gate is the full-corpus hot path and a
    // CodegenFallback per row there measured GC-bound at the sf100 probe
    // (stopwordRatio itself keeps the exact-count contract for q23)
    val stopOk = when(
      arrays_overlap(words(text), typedlit(stopwords.head._2)),
      lit(1.0)).otherwise(lit(0.0))
    round((lenOk + punctOk + stopOk) / 3.0, 6)
  }

  /** Hashing-trick linear text scorer — the fastText/CCNet-style quality
    * classifier shape LLM pipelines apply corpus-wide: `score = σ(bias +
    * Σ_tokens w[hash60(token) mod dim])`. `weightOf` maps a bucket-id
    * column to its weight column (production: `element_at` into a
    * broadcast weight literal via [[linearScoreWithWeights]]; oracles:
    * a closed-form pseudo-weight both engines can spell). The token sum
    * folds in DOCUMENT order (seeded with the bias — DuckDB replays with
    * `list_prepend` + `list_reduce`), so the float sequence is pinned;
    * scoring is a pure projection, scan-speed at any corpus size. */
  def hashedLinearScore(text: Column, dim: Int, weightOf: Column => Column,
      bias: Double): Column = {
    val terms = transform(split(text, " "),
      t => weightOf(pmod(TextDedup.hash60(t), lit(dim.toLong))))
    val z = aggregate(terms, lit(bias), (acc, w) => acc + w)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** [[hashedLinearScore]] with a concrete trained weight vector riding
    * the plan as a literal (broadcast to every task — `dim` doubles,
    * corpus-independent). */
  def linearScoreWithWeights(text: Column, weights: Seq[Double],
      bias: Double): Column =
    hashedLinearScore(text, weights.size,
      b => element_at(typedlit(weights), (b + 1).cast("int")), bias)

  /** Distributed logistic-regression TRAINING for the hashed classifier —
    * the other half of [[hashedLinearScore]]: full-batch gradient descent,
    * one corpus pass per round. Per round: score every doc with the
    * current weights (plan literals), QUANTIZE each doc's residual
    * `σ(z) − y` to exact 1e-9 longs, and sum residuals per feature
    * bucket — integer sums are order-independent, so the learned model
    * is bit-identical on any partitioning or executor count (the
    * float-gradient spelling drifts a ulp per reduce order and two
    * "identical" training runs diverge). Only the ≤ dim+1 gradient
    * cells (corpus-independent) return to the driver each round.
    * Returns (weights, bias, per-round mean log-loss). */
  def trainLinearClassifier(df: DataFrame, textCol: String,
      labelCol: String, dim: Int, rounds: Int, lr: Double):
      (Array[Double], Double, Seq[Double]) = {
    require(dim >= 1 && rounds >= 0 && lr > 0)
    val Q = 1e9
    val w = Array.fill(dim)(0.0)
    var bias = 0.0
    val losses = Seq.newBuilder[Double]
    val n = df.count().toDouble
    for (_ <- 1 to rounds) {
      val z = hashedLinearScore(col(textCol), dim,
        b => element_at(typedlit(w.toSeq), (b + 1).cast("int")), bias)
      val scored = df.select(col(textCol).as("__t"),
        col(labelCol).cast("double").as("__y"), z.as("__p"))
        .withColumn("__rq", round((col("__p") - col("__y")) * lit(Q), 0)
          .cast("long"))
        .withColumn("__lq",
          round(-(col("__y") * log(col("__p"))
            + (lit(1.0) - col("__y")) * log(lit(1.0) - col("__p"))) * lit(Q), 0)
            .cast("long"))
      val agg = scored.select(
        explode(concat(
          transform(split(col("__t"), " "),
            t => pmod(TextDedup.hash60(t), lit(dim.toLong))),
          array(lit(-1L)))).as("__b"),
        col("__rq"), col("__lq"))
      val cells = agg.groupBy("__b")
        .agg(sum(col("__rq")).as("__g"), sum(col("__lq")).as("__l"))
        .collect()
      var lossSum = 0L
      cells.foreach { r =>
        val b = r.getLong(0)
        val g = r.getLong(1) / Q
        if (b < 0) { bias -= lr * g / n; lossSum = r.getLong(2) }
        else w(b.toInt) -= lr * g / n
      }
      losses += lossSum / Q / n
    }
    (w, bias, losses.result())
  }

  /** Flesch reading-ease score from cheap structural proxies: sentences =
    * terminator runs (`[.!?]+`, min 1), syllables = vowel-group runs per
    * document (the standard heuristic). `206.835 − 1.015·(words/sentences)
    * − 84.6·(syllables/words)` — one division, one multiply, one subtract
    * per term in fixed order, so an engine replaying the same expression
    * is bit-identical even though the constants aren't exact binary.
    * Projection-only: scan-speed over any corpus size. */
  def fleschScore(text: Column): Column = {
    // run counts via the codegen'd CharClassRunCount scan, not
    // `size(regexp_extract_all(...))` — the regex spelling allocates one
    // UTF8String per match corpus-wide (the measured super-linear class;
    // see functions/TextScan.scala). Value-identical: both classes are
    // pure ASCII, and the syllable scan keeps the same lower() input.
    val w = tokenCount(text).cast("double")
    val sentences = greatest(
      graft.functions.CharClassRunCount.count(text, ".!?"), lit(1))
      .cast("double")
    val syllables =
      graft.functions.CharClassRunCount.count(lower(text), "aeiouy")
        .cast("double")
    round(lit(206.835) - lit(1.015) * (w / sentences)
      - lit(84.6) * (syllables / w), 6)
  }

  /** Bottom-k sketch fingerprint: the `k` smallest engine-independent
    * 60-bit hashes of the document's distinct word `n`-grams, sorted and
    * comma-joined. Two documents share most of the sketch iff they share
    * most shingles (it is a MinHash-style content signature with one
    * identity permutation); equal texts → equal fingerprints. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String, n: Int = 3,
      k: Int = 8): DataFrame =
    TextDedup.shingleRows(df, idCol, textCol, n)
      .select(col("__id"), TextDedup.hash60(col("__sh")).as("__h"))
      .groupBy("__id")
      .agg(array_join(
        slice(sort_array(collect_set(col("__h"))), 1, k).cast("array<string>"),
        ",").as("fingerprint"))

  /** Duplicate word-n-gram fraction: 1 − distinct/total n-grams — the
    * within-document repetition signal the standard quality-rule sets
    * threshold on (heavily repeated boilerplate scores high). Pure
    * projection over the native shingle pass: total n-grams = tokens−n+1,
    * distinct from [[TextDedup.shingles]]; docs shorter than n words
    * score 0. */
  def repetitionRatio(text: Column, n: Int = 2): Column = {
    val total = size(words(text)) - (n - 1)
    val distinctN = size(TextDedup.shingles(text, n))
    round(when(total > 0,
      lit(1.0) - distinctN.cast("double") / total.cast("double"))
      .otherwise(lit(0.0)), 6)
  }

  /** Benchmark-contamination scan: the fraction of each corpus document's
    * distinct word-n-gram shingles that also occur anywhere in `evalSet` —
    * the decontamination primitive (drop or flag training docs that leak
    * eval data). The eval shingle set is orders of magnitude smaller than
    * the corpus, so the membership probe is a broadcast left-semi join and
    * the whole scan is one pass + one per-doc aggregation; hashed 60-bit
    * shingles keep the probe key 8 bytes. Docs with fewer than `n` words
    * have no shingles and are absent from the output (nothing to test). */
  def contamination(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    val rows = TextDedup.hashedShingleRows(corpus, idCol, textCol, n)
    val evalShingles = TextDedup.hashedShingleRows(evalSet, idCol, textCol, n)
      .select("__sh").distinct()
    rows
      .join(broadcast(evalShingles).withColumn("__hit", lit(1)),
        Seq("__sh"), "left_outer")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(col("__hit")).as("n_contaminated"))
      .withColumn("contamination",
        round(col("n_contaminated").cast("double") / col("n_shingles"), 6))
  }

  /** PII patterns in scrub order (email before URL: an address inside a
    * query string should redact as email, not vanish into `<URL>`). All
    * patterns are RE2-compatible (no lookaround/backrefs) so the DuckDB
    * oracle and any RE2-based engine replay them byte-identically. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", "https?://[^\\s]+", "<URL>"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("phone", "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b|\\b555-[0-9]{4}\\b",
      "<PHONE>"))

  /** Redact emails, URLs, IPv4s, and phone numbers — the standard
    * pre-training PII scrub. Pure projection (codegen'd regexes), runs at
    * scan speed; swap/extend [[piiPatterns]] per policy. */
  def scrubPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, pat, rep)) =>
      regexp_replace(c, pat, rep)
    }

  /** (name, pattern, replacement) normalization chain applied in order by
    * [[cleanText]] — C4-style: drop control/zero-width chars, normalize
    * curly quotes and long dashes to ASCII, collapse runs of whitespace,
    * trim. RE2-safe character classes (no lookaround, no backrefs) so the
    * SAME patterns replay verbatim in the DuckDB oracle. */
  val cleanPatterns: Seq[(String, String, String)] = Seq(
    ("controls", "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f\\u200b\\u200c\\u200d\\ufeff]", ""),
    ("quotes", "[\\u2018\\u2019\\u201a\\u201b]", "'"),
    ("dquotes", "[\\u201c\\u201d\\u201e\\u201f]", "\""),
    ("dashes", "[\\u2012\\u2013\\u2014\\u2015]", "-"),
    ("spaces", "[\\s\\u00a0\\u2000-\\u200a\\u2028\\u2029\\u202f\\u3000]+", " "))

  /** Normalize raw crawled text for training: strip control and
    * zero-width characters, ASCII-fold typographic quotes/dashes,
    * collapse all whitespace runs to one space, trim, and hard-cap at
    * `maxChars` (defense against pathological megadocs — truncation is a
    * LENGTH policy, applied after cleaning so the cap counts clean
    * characters). Pure projection — codegen'd regex chain at scan
    * speed, no UDF. */
  def cleanText(text: Column, maxChars: Int = 1 << 20): Column =
    substring(
      trim(cleanPatterns.foldLeft(text) { case (c, (_, pat, rep)) =>
        regexp_replace(c, pat, rep)
      }),
      1, maxChars)

  /** Per-kind PII match counts on the raw text (audit metric alongside
    * [[scrubPii]]). */
  def piiCounts(text: Column): Seq[(String, Column)] =
    piiPatterns.map { case (kind, pat, _) =>
      // regexp_count: same match count, but no per-match UTF8String array
      // materialization (the patterns themselves must stay regex — they
      // are real PII shapes, not char-class runs)
      s"n_$kind" -> regexp_count(text, lit(pat)).cast("integer")
    }

  /** Top-`k` TF-IDF terms per document: tf = in-doc term count, idf =
    * ln((N+1)/(df+1)) with add-one smoothing, ranked (score desc, term
    * asc). Two hash aggregations + one broadcast of the (token, df)
    * side? No — df joins back on the token key (dictionary-sized, usually
    * broadcast by AQE); the corpus size N is a 1-row broadcast. Ranking is
    * a WindowGroupLimit — no full per-doc sort at scale. */
  def tfidf(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tokens = df.select(col(idCol).as("__id"),
      explode(words(col(textCol))).as("token"))
      .where(col("token") =!= "")
    val tf = tokens.groupBy(col("__id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("__n"))
    val scored = tf.join(dfreq, "token")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log((col("__n") + lit(1.0)) / (col("df") + lit(1.0))), 6))
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("tfidf").desc, col("token").asc)
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("__id"), col("token"), col("tfidf"), col("rnk"))
  }

  /** BM25 relevance (Robertson/Spärck Jones; the Lucene `+1` idf variant,
    * always positive) of every document against a literal term set.
    *
    * Because the terms are literals, per-term tf is a PROJECTION
    * (`filter` over the token array — no explode, no per-token shuffle);
    * corpus stats (N, avgdl, per-term df) are ONE tiny aggregate row
    * broadcast back. Per-term scores are summed in fixed term order, so
    * the float result is reproducible across partitionings and engines.
    * Docs matching no term are dropped — at 100 TB that candidate set is
    * exactly what a [[TextIndex]] postings lookup feeds this scorer.
    *
    * Output: (doc_id, score, rank), rank by (score desc, id) within the
    * whole corpus, top `k`. */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int = 100,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(terms.nonEmpty, "bm25 needs at least one term")
    val base = df.select(col(idCol).as("doc_id"),
        words(col(textCol)).as("__toks"))
      .withColumn("__dl", size(col("__toks")).cast("double"))
    val withTf = terms.zipWithIndex.foldLeft(base) { case (acc, (t, i)) =>
      acc.withColumn(s"__tf_$i",
        size(filter(col("__toks"), x => x === lit(t))).cast("double"))
    }.drop("__toks")
    // N, avgdl, df per term: integer-valued doubles, so the partial-agg
    // sum order cannot change the result (exact below 2^53)
    val aggs =
      count(lit(1)).cast("double").as("__n") +:
      avg(col("__dl")).as("__avgdl") +:
      terms.indices.map(i =>
        sum(when(col(s"__tf_$i") > 0, 1.0).otherwise(0.0)).as(s"__df_$i"))
    val stats = withTf.agg(aggs.head, aggs.tail: _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val termScore = terms.indices.map { i =>
      val tf = col(s"__tf_$i"); val dfi = col(s"__df_$i")
      log((col("__n") - dfi + lit(0.5)) / (dfi + lit(0.5)) + lit(1.0)) *
        (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl")))
    }.reduceLeft(_ + _) // fixed left-to-right term order: reproducible sum
    val w = Window.orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("score", round(termScore, 6))
      .where(col("score") > 0)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("score"), col("rank"))
  }

  /** RAG-style document chunking: fixed token windows of `chunkTokens`
    * words starting every `stride` tokens (overlap = chunkTokens −
    * stride), the retrieval-corpus prep step. One projection + one
    * generator — no shuffle, no UDF; chunk starts come from `sequence`
    * and each window is a map-side `slice`, so the whole op stays inside
    * whole-stage codegen and scales linearly with corpus bytes. Tail
    * chunks shorter than `chunkTokens` are kept (standard sliding-window
    * semantics). Output: one row per chunk with its 0-based index, start
    * token offset, token count, and text. */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 8, stride: Int = 6): DataFrame = {
    require(chunkTokens >= 1 && stride >= 1, "chunkTokens/stride must be >= 1")
    df.select(col(idCol), words(col(textCol)).as("__ts"))
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0), size(col("__ts")) - 1, lit(stride)),
          s => slice(col("__ts"), s + 1, lit(chunkTokens))))
          .as(Seq("chunk_idx", "__c")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        (col("chunk_idx") * stride).cast("long").as("start_tok"),
        size(col("__c")).cast("long").as("n_tokens"),
        array_join(col("__c"), " ").as("chunk_text"))
  }

  /** Corpus-wide top-`k` word `n`-grams by occurrence count — the
    * boilerplate-discovery / stopphrase-mining pass run before dedup
    * threshold tuning. Map-side generator + partial aggregation absorb
    * the head-heavy skew (hot n-grams combine within each task before
    * the single shuffle), and the top-k is a TakeOrderedAndProject —
    * nothing global ever sorts the full n-gram set. Deterministic
    * tiebreak on the n-gram itself. */
  def topNgrams(df: DataFrame, textCol: String, n: Int = 2,
      k: Int = 100): DataFrame = {
    require(n >= 1 && k >= 1, "n/k must be >= 1")
    val grams = transform(
      sequence(lit(1), size(col("__ts")) - (n - 1)),
      i => array_join(slice(col("__ts"), i, lit(n)), " "))
    df.select(words(col(textCol)).as("__ts"))
      .where(size(col("__ts")) >= n)
      .select(explode(grams).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("ngram").asc)
      .limit(k)
  }

  /** Distributed BPE TRAINING (Sennrich et al. 2016), `rounds` merges:
    * the iterated version of [[bpePairs]] — each round counts adjacent
    * token pairs over the weighted vocabulary, picks the most frequent
    * (pair-string tiebreak → fully deterministic), and applies the merge
    * left-to-right greedily to every word, exactly like a reference BPE
    * trainer. Returns the merge table (round, left, right, freq) — the
    * artifact a tokenizer ships.
    *
    * Scale shape per round: the corpus collapsed once to a word
    * histogram (|vocab| rows, NOT corpus tokens); pair counting and
    * merge application are map-side HOFs over that frame; the winning
    * pair is a 1-row broadcast joined back — no driver-side collect,
    * `localCheckpoint` truncates the per-round lineage. Rounds are
    * inherently sequential (that IS the algorithm); each costs one
    * vocab-frame aggregate.
    */
  def bpeTrain(df: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var vocab = df.select(explode(words(col(textCol))).as("w"))
      .where(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .select(col("wc"), split(col("w"), "").as("toks"))
      .localCheckpoint()
    var merges: DataFrame = null
    for (r <- 1 to rounds) {
      val top = vocab
        // fully-merged single-token words pair with nothing (and
        // sequence(1,0) would DESCEND, not empty — the Spark gotcha)
        .where(size(col("toks")) >= 2)
        .select(col("wc"), explode(transform(
            sequence(lit(1), size(col("toks")) - 1),
            i => struct(element_at(col("toks"), i).as("left"),
              element_at(col("toks"), i + 1).as("right")))).as("p"))
        .groupBy(col("p.left").as("left"), col("p.right").as("right"))
        .agg(sum(col("wc")).as("freq"))
        .orderBy(col("freq").desc, col("left"), col("right"))
        .limit(1)
        .withColumn("round", lit(r.toLong))
        // 1-row checkpoint: `merges` must not lazily reference a vocab
        // round whose checkpoint the roll below is about to free (the
        // final merges evaluation would find truncated lineage with its
        // blocks gone) — and it also spares the closing evaluation from
        // re-running every round's aggregate
        .localCheckpoint()
      merges = if (merges == null) top else merges.unionByName(top)
      // apply the winning merge greedily left-to-right to every word:
      // fold the token array, replacing the trailing `left` with
      // `left||right` whenever `right` follows it
      vocab = graft.core.Ckpt.roll(vocab.crossJoin(broadcast(
          top.select(col("left").as("__l"), col("right").as("__r"))))
        .select(col("wc"), aggregate(col("toks"),
          array().cast("array<string>"),
          (acc, t) => when(
            size(acc) > 0 &&
              element_at(acc, -1) === col("__l") && t === col("__r"),
            concat(slice(acc, lit(1), size(acc) - 1),
              array(concat(col("__l"), col("__r")))))
            .otherwise(concat(acc, array(t)))).as("toks"))
        , vocab)
    }
    graft.core.Ckpt.free(vocab) // only `merges` leaves the function
    merges.select(col("round"), col("left"), col("right"), col("freq"))
  }

  /** BPE ENCODE — apply a trained merge table ([[bpeTrain]]'s output)
    * in round order to the corpus VOCABULARY; returns
    * (word, wc, toks). The tokenize-the-corpus counterpart of training:
    * merges replay over the |vocab|-row word histogram, never over
    * corpus tokens, and a caller maps documents to token streams by
    * joining words back on this frame (broadcast when the vocab is
    * small, shuffle join on `word` when it isn't).
    *
    * The merge table is collected to the driver in round order — R rows,
    * the tokenizer's shipped model artifact, the same bounded-collect
    * class as k-means centroids. Each round is then ONE narrow
    * higher-order-function projection with the pair as literals (no join
    * at all), `localCheckpoint` every 4 rounds truncating lineage.
    *
    * Greedy left-to-right non-overlap per round: after a merge the new
    * token `l+r` can never immediately re-merge (it would require
    * l+r = l), so the array fold is EXACTLY non-overlapping
    * left-to-right string replacement over bracket-delimited tokens —
    * which is how the DuckDB oracle replays it (q266). */
  def bpeApply(df: DataFrame, textCol: String, merges: DataFrame): DataFrame = {
    val ms = merges.orderBy(col("round"))
      .select(col("left"), col("right")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    var vocab = df.select(explode(words(col(textCol))).as("word"))
      .where(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .select(col("word"), col("wc"), split(col("word"), "").as("toks"))
      .localCheckpoint()
    var lastCkpt = vocab
    ms.zipWithIndex.foreach { case ((l, r), i) =>
      vocab = vocab.select(col("word"), col("wc"),
        aggregate(col("toks"), array().cast("array<string>"),
          (acc, t) => when(
            size(acc) > 0 && element_at(acc, -1) === lit(l) && t === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
            .otherwise(concat(acc, array(t)))).as("toks"))
      if ((i + 1) % 4 == 0) {
        // roll: the previous checkpoint 4 merges back is dead once the
        // new one materializes (prior is first in the chained plan)
        val prev = lastCkpt
        vocab = graft.core.Ckpt.roll(vocab, prev)
        lastCkpt = vocab
      }
    }
    vocab
  }

  /** Pointwise-mutual-information collocations (Church & Hanks 1990):
    * adjacent word pairs that co-occur far more than their unigram
    * frequencies predict — the multi-word-expression miner ("new york",
    * "machine learning") run before tokenizer training.
    *
    * PMI = ln(p(x,y) / (p(x)·p(y))) with p(x,y) = c_xy/B over bigram
    * positions and p(x) = c_x/T over token positions. All counts are
    * exact longs; the closing formula multiplies as DOUBLES in a pinned
    * literal order (`c_xy·T·T / (B·c_x·c_y)`), so the score — and
    * therefore the top-k cut — is engine-identical. `minCount` suppresses
    * the low-support noise PMI is infamous for.
    *
    * Scale shape: two map-side-combined aggregations (bigram and unigram
    * grain), a vocab-sized join back, and a TakeOrderedAndProject top-k —
    * the corpus shuffles nothing but combined counts.
    */
  def pmiCollocations(df: DataFrame, textCol: String, minCount: Int = 5,
      k: Int = 100): DataFrame = {
    val toks = df.select(words(col(textCol)).as("__ts"))
      .where(size(col("__ts")) >= 2)
    val uni = toks.select(explode(col("__ts")).as("tok"))
      .where(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val tTot = uni.agg(sum(col("c")).as("t_tot"))
    val bigrams = toks.select(explode(transform(
        sequence(lit(1), size(col("__ts")) - 1),
        i => struct(element_at(col("__ts"), i).as("word_a"),
          element_at(col("__ts"), i + 1).as("word_b")))).as("p"))
      .select(col("p.word_a"), col("p.word_b"))
      .where(col("word_a") =!= "" && col("word_b") =!= "")
    val bi = bigrams.groupBy(col("word_a"), col("word_b"))
      .agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minCount)
    val bTot = bigrams.groupBy().agg(count(lit(1)).as("b_tot"))
    bi.join(uni.select(col("tok"), col("c").as("c_a")),
        col("word_a") === col("tok")).drop("tok")
      .join(uni.select(col("tok"), col("c").as("c_b")),
        col("word_b") === col("tok")).drop("tok")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(bTot))
      .select(col("word_a"), col("word_b"), col("n_pair"),
        round(log(col("n_pair").cast("double") * col("t_tot") *
          col("t_tot") /
          (col("b_tot").cast("double") * col("c_a") * col("c_b"))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("word_a"), col("word_b"))
      .limit(k)
  }

  /** One round of byte-pair-encoding statistics (Sennrich et al., "Neural
    * Machine Translation of Rare Words with Subword Units" — the merge-
    * candidate count): whitespace pre-tokenization, each word read as its
    * character sequence, adjacent character pairs counted weighted by word
    * frequency. The top pair is what a BPE trainer would merge next; the
    * full ranked table is the vocabulary-induction diagnostic.
    *
    * Scale shape: the corpus collapses to a word histogram first (one
    * map-side-combined shuffle); the pair explosion then runs over the
    * DISTINCT-WORD frame (|vocab|, not corpus tokens), and the final
    * top-k is a TakeOrderedAndProject — no global sort materializes.
    * Deterministic tiebreak on the pair string.
    */
  def bpePairs(df: DataFrame, textCol: String, k: Int = 50): DataFrame = {
    val vocab = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .where(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    val pairs = vocab.select(col("wc"), explode(
      transform(sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
    val top = pairs.groupBy(col("pair"))
      .agg(sum(col("wc")).as("freq"))
      .orderBy(col("freq").desc, col("pair").asc)
      .limit(k)
    top.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("freq").desc, col("pair").asc)).cast("long"))
  }

  /** The full per-document analysis projection. */
  def analyze(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("pred_lang", langId(t))
      .withColumn("lang_score", langScore(t))
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("n_bpe_tokens", bpeTokenCount(t))
      .withColumn("avg_word_len", avgWordLen(t))
      .withColumn("punct_ratio", punctRatio(t))
      .withColumn("stopword_ratio", stopwordRatio(t))
      .withColumn("quality", qualityScore(t))
  }

  /** Gopher-style repetition-free quality rules (Rae et al. 2021's
    * published heuristic family, adapted to the corpus's single-line
    * documents): per-document rule booleans plus the conjunction —
    * the classic pre-training keep/drop gate, kept as SEPARATE columns
    * so a curation run can report per-rule kill counts, not just a
    * survivor total. Projection-only (no shuffle, no state); every
    * ratio rounds to 6 places before its threshold compare so the gate
    * is engine-exact. */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val t = col(textCol)
    val ws = split(t, " ")
    val nWords = size(ws)
    val meanWordLen = round((length(t) - (nWords - 1)).cast("double") /
      nWords, 6)
    val alphaFrac = round(size(filter(ws, w => w.rlike("[a-z]")))
      .cast("double") / nWords, 6)
    val stopArr = typedlit(stopwords.head._2)
    val nStopDistinct = size(array_distinct(
      filter(ws, w => array_contains(stopArr, w))))
    df.select(col(idCol), nWords.as("n_words"),
        meanWordLen.as("mean_word_len"), alphaFrac.as("alpha_frac"),
        nStopDistinct.as("n_stop_distinct"))
      .withColumn("rule_word_count",
        col("n_words").between(minWords, maxWords))
      .withColumn("rule_word_len", col("mean_word_len").between(3.0, 10.0))
      .withColumn("rule_alpha", col("alpha_frac") >= 0.8)
      .withColumn("rule_stopwords", col("n_stop_distinct") >= 2)
      .withColumn("passes", col("rule_word_count") && col("rule_word_len") &&
        col("rule_alpha") && col("rule_stopwords"))
  }

  /** Held-out n-gram novelty: for each TEST-split document, the fraction
    * of its token n-gram windows never seen in the TRAIN split — the
    * memorization-risk / generalization-gap monitor an eval pipeline runs
    * before trusting held-out perplexity (novelty ≈ 0 means the "held
    * out" text is substring-covered by training data). Splits come from
    * [[Sampling.assignSplits]]' hash rule, so the metric composes exactly
    * with the q71 train/val/test assignment.
    *
    * Window hashes are 60-bit md5 prefixes over the joined token window —
    * engine-exact, 8-byte join keys. Shape: one explode to window grain,
    * a distinct on train windows, one left join + per-doc counter
    * aggregate. At 100 TB put a bloom filter on the train-window set in
    * front of the join ([[BloomJoin]]) — novelty is typically high, so
    * most test windows miss and the bloom absorbs them without
    * shuffling. */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5, trainFrac: Double = 0.8,
      salt: String = "sp0"): DataFrame = {
    require(n >= 1 && n <= 50, s"n must be in [1, 50], got $n")
    require(trainFrac > 0 && trainFrac < 1, "trainFrac must be in (0, 1)")
    val withSplit = Sampling.assignSplits(df, idCol,
      Seq("train" -> trainFrac, "test" -> (1 - trainFrac)), kFolds = 1,
      salt = salt)
    val toks = withSplit
      .select(col(idCol).as("__id"), col("split"),
        split(col(textCol), " ").as("__t"))
      .where(size(col("__t")) >= n)
    val wins = toks.select(col("__id"), col("split"),
      explode(transform(sequence(lit(0), size(col("__t")) - n),
        i => TextDedup.hash60(array_join(slice(col("__t"), i + 1, lit(n)), " "))))
        .as("__h"))
    val trainSet = wins.where(col("split") === "train")
      .select(col("__h")).distinct()
    wins.where(col("split") === "test")
      .join(trainSet.withColumn("__seen", lit(1)), Seq("__h"), "left")
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("n_novel"))
      .select(col(idCol), col("n_windows"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_windows"), 6)
          .as("novelty"))
  }

  /** Vocabulary-growth curve (Heaps' law): distinct vocabulary size after
    * every `bucket` documents, in id order — the "is this corpus still
    * teaching new words" saturation signal that sizes tokenizer vocab
    * and flags repetitive crawls.
    *
    * Computed via the FIRST-APPEARANCE trick: a token's contribution to
    * the curve is fully determined by `min(doc_id)` over its
    * occurrences, so the whole curve is ONE token aggregate + a
    * bucket-count + a cumulative window over ≤ (corpus/bucket) rows —
    * never a per-checkpoint rescan (the naive spelling is
    * O(checkpoints · corpus); this is O(corpus)). */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
      bucket: Long, n: Int = 1): DataFrame = {
    require(bucket >= 1, s"bucket must be positive, got $bucket")
    require(n >= 1, s"n must be positive, got $n")
    import org.apache.spark.sql.expressions.Window
    // n > 1 tracks n-GRAM vocabulary (distinct within doc via the native
    // shingle expression) — the right grain when the unigram vocab
    // saturates in the first bucket
    val toks =
      if (n == 1) words(col(textCol))
      else TextDedup.shingles(col(textCol), n)
    val first = df
      .select(col(idCol).cast("long").as("__id"),
        explode(toks).as("__tok"))
      .where(length(col("__tok")) > 0)
      .groupBy(col("__tok")).agg(min(col("__id")).as("__fd"))
    val w = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    first.groupBy((floor(col("__fd") / bucket)).as("__bkt"))
      .agg(count(lit(1)).as("new_tokens"))
      .select(((col("__bkt") + 1) * bucket).as("docs_seen"),
        col("new_tokens"), sum(col("new_tokens")).over(w).as("vocab_size"))
  }
}

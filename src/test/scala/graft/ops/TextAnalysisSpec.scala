package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langId picks the profile with most stopword hits, und on none") {
    val out = Seq(
      "the cat sat on the mat and a dog",  // en
      "el perro y la casa de que",         // es
      "qqq www zzz"                        // none
    ).toDF("t")
      .select(TextAnalysis.langId(col("t"))).as[String].collect()
    assert(out.toSeq == Seq("en", "es", "und"))
  }

  test("token counts: whitespace vs BPE-ish") {
    val r = Seq("ab c12 d!e").toDF("t").select(
      TextAnalysis.tokenCount(col("t")),
      TextAnalysis.bpeTokenCount(col("t"))).head()
    assert(r.getInt(0) == 3)
    // ab | c | 12 | d | ! | e
    assert(r.getInt(1) == 6)
  }

  test("avgWordLen and punctRatio are exact") {
    val r = Seq("ab cd!").toDF("t").select(
      TextAnalysis.avgWordLen(col("t")),
      TextAnalysis.punctRatio(col("t"))).head()
    assert(r.getDouble(0) == 2.5)          // (6-1)/2
    assert(r.getDouble(1) == math.round(1.0 / 6 * 1e6) / 1e6)
  }

  test("qualityScore combines the three signals") {
    val good = ("the quick brown fox and the lazy dog " * 5).trim
    val r = Seq(good, "x!").toDF("t")
      .select(TextAnalysis.qualityScore(col("t"))).as[Double].collect()
    assert(r(0) == 1.0)
    assert(r(1) == 0.0)
  }

  test("fingerprint: equal texts equal, k bounds sketch size") {
    val df = Seq(
      (1L, "a b c d e f g h i j k l m"),
      (2L, "a b c d e f g h i j k l m"),
      (3L, "z y x w v u t s r q p o n")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
    assert(fps(1L).split(",").length == 8)
  }

  test("repetitionRatio: duplicate-bigram fraction, 0 below n words") {
    val out = Seq(
      (1L, "a b a b a b"),   // bigrams: ab ba ab ba ab → 5 total, 2 distinct
      (2L, "a b c d"),       // all distinct → 0
      (3L, "word")           // shorter than n → 0
    ).toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.repetitionRatio(col("text"), 2).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 0.6) // 1 - 2/5
    assert(out(2L) == 0.0)
    assert(out(3L) == 0.0)
  }

  test("contamination: fraction of shingles present in the eval set") {
    val evalSet = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox runs"), // shingles: tqb qbf bfr — 2 of 3 in eval
      (2L, "totally unrelated text here") // 0 of 2
    ).toDF("doc_id", "text")
    val out = TextAnalysis.contamination(corpus, evalSet, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((3L, 2L, 0.666667)))
    assert(out(2L) == ((2L, 0L, 0.0)))
  }

  test("scrubPii redacts emails, urls, ips, and phones; counts match") {
    val txt = "mail a.b+c@sub.example.org see https://x.io/p?q=1 " +
      "host 192.168.0.1 dial 415-555-1234 or 555-0042 done"
    val df = Seq((1L, txt)).toDF("id", "text")
    val scrubbed = df.select(TextAnalysis.scrubPii(col("text"))).head.getString(0)
    assert(scrubbed ===
      "mail <EMAIL> see <URL> host <IP> dial <PHONE> or <PHONE> done")
    val counts = df.select(TextAnalysis.piiCounts(col("text"))
      .map { case (n, c) => c.as(n) }: _*).head()
    assert(counts.getInt(0) === 1) // email
    assert(counts.getInt(1) === 1) // url
    assert(counts.getInt(2) === 1) // ip
    assert(counts.getInt(3) === 2) // phones
  }

  test("scrubPii leaves clean text untouched") {
    val txt = "no pii here just words 123 and a-b"
    val out = Seq((1L, txt)).toDF("id", "text")
      .select(TextAnalysis.scrubPii(col("text"))).head.getString(0)
    assert(out === txt)
  }

  test("tfidf ranks distinctive terms above ubiquitous ones") {
    val df = Seq(
      (1L, "apple apple banana common"),
      (2L, "banana cherry common"),
      (3L, "common cherry cherry")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidf(df, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3)))
    // doc 1: apple (tf=2, df=1) is the clear top term
    assert(out.collect { case (1L, t, 1) => t }.head === "apple")
    // 'common' (df=3 of N=3, idf=0) never outranks a distinctive term
    val commonRanks = out.collect { case (_, "common", rnk) => rnk }
    assert(commonRanks.forall(_ == 2))
    // every doc emits exactly k=2 rows
    assert(out.groupBy(_._1).values.forall(_.length == 2))
  }

  test("chunkDocs: windows tile the doc, overlap by chunk−stride, rebuild it") {
    val text = ('a' to 'z').map(_.toString).mkString(" ") // 26 tokens
    val df = Seq((7L, text)).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkDocs(df, "doc_id", "text",
        chunkTokens = 8, stride = 6)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    // starts every 6 tokens while any token remains: 0,6,12,18,24
    assert(chunks.map(_._2).toSeq == Seq(0L, 6L, 12L, 18L, 24L))
    // full windows are 8 tokens; the tail (starting at 24 of 26) is short
    assert(chunks.init.forall(_._3 == 8L) && chunks.last._3 == 2L)
    // consecutive chunks overlap by exactly chunkTokens − stride = 2
    chunks.sliding(2).foreach { case Array(a, b) =>
      val at = a._4.split(" ").takeRight(2).toSeq
      assert(b._4.split(" ").take(2).toSeq == at, "overlap broken")
    case _ => ()
    }
    // de-overlapped concatenation rebuilds the document exactly
    val rebuilt = (chunks.head._4 +:
      chunks.tail.map(_._4.split(" ").drop(2).mkString(" ")).toSeq)
      .filter(_.nonEmpty).mkString(" ")
    assert(rebuilt == text)
  }

  test("chunkDocs: short doc yields one short chunk; pure projection plan") {
    val df = Seq((1L, "x y z")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocs(df, "doc_id", "text", 8, 6)
    val rows = out.collect()
    assert(rows.length == 1 && rows.head.getLong(3) == 3L &&
      rows.head.getString(4) == "x y z")
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
  }

  test("topNgrams counts across docs with deterministic tiebreak") {
    val df = Seq("a b c", "a b", "b c a b", "z").map(Tuple1(_)).toDF("text")
    // bigrams: "a b"×3, "b c"×2, "c a"×1 — "z" (1 token) contributes none
    val out = TextAnalysis.topNgrams(df, "text", n = 2, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("a b", 3L), ("b c", 2L)))
    // tie at the cut: k=3 over equal counts resolves by n-gram order
    val tied = TextAnalysis.topNgrams(df, "text", 2, 3)
      .collect().map(_.getString(0)).toSeq
    assert(tied == Seq("a b", "b c", "c a"))
  }

  test("topNgrams plans as TakeOrdered, never a global sort of all n-grams") {
    val df = Seq("a b c d e f g").map(Tuple1(_)).toDF("text")
    val out = TextAnalysis.topNgrams(df, "text", 2, 5)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"top-k sorted globally:\n$p")
  }

  test("bpePairs counts adjacent char pairs weighted by word frequency") {
    // "abab" ×2 and "ba" ×1 → pairs: ab(2·2)=4... per word "abab":
    // ab, ba, ab → ab 2, ba 1 each occurrence; two occurrences → ab 4,
    // ba 2; plus the standalone "ba" → ba 3. Single chars drop out.
    val df = Seq("abab ba x abab").map(Tuple1(_)).toDF("text")
    val got = TextAnalysis.bpePairs(df, "text", k = 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("ab", 4L, 1L), ("ba", 3L, 2L)))
  }

  test("bpePairs explodes the vocabulary frame, not the corpus") {
    // 1000 repetitions of one word must not multiply the pair counts' cost
    // driver: the word histogram collapses first. Verify the counts weight
    // by frequency and the plan takes top-k without a global sort.
    val df = Seq.fill(1000)("hello").map(Tuple1(_)).toDF("text")
    val out = TextAnalysis.bpePairs(df, "text", k = 3)
    val got = out.as[(String, Long, Long)].collect().toSeq
    // pairs of "hello": he el ll lo, all ×1000; rank = (freq desc, pair asc)
    assert(got == Seq(("el", 1000L, 1L), ("he", 1000L, 2L), ("ll", 1000L, 3L)))
    assert(out.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }

  test("analyze attaches the full projection") {
    val cols = TextAnalysis.analyze(Seq((1L, "the a b")).toDF("id", "text"), "text").columns
    assert(Seq("pred_lang", "lang_score", "n_tokens", "n_bpe_tokens",
      "avg_word_len", "punct_ratio", "stopword_ratio", "quality")
      .forall(cols.contains))
  }

  test("bpeTrain: merges chain across rounds exactly like a BPE trainer") {
    import spark.implicits._
    // corpus: "low" ×5, "lower" ×2 → chars l o w (e r)
    // round 1: pairs lo×7, ow×7, we×2, er×2 → tie lo/ow broken by pair
    //   string: "lo" wins (l<o). words become [lo,w]×5, [lo,w,e,r]×2
    // round 2: (lo,w)×7 wins → [low]×5, [low,e,r]×2
    // round 3: (low,e)×2 vs (e,r)×2 → "e"<"low"? left compare: ("e","r")
    //   vs ("low","e"): "e" < "low" → (e,r) wins
    val df = (Seq.fill(5)("low") ++ Seq.fill(2)("lower"))
      .map(Tuple1(_)).toDF("text")
    val merges = TextAnalysis.bpeTrain(df, "text", rounds = 3)
      .collect().map(r => r.getAs[Long]("round") ->
        ((r.getString(1), r.getString(2), r.getAs[Long]("freq")))).toMap
    assert(merges(1L) == (("l", "o", 7L)))
    assert(merges(2L) == (("lo", "w", 7L)))
    assert(merges(3L) == (("e", "r", 2L)))
  }

  test("hashed linear scorer: weight-vector path ≡ formula path, σ-bounded") {
    import spark.implicits._
    import org.apache.spark.sql.Column
    val dim = 64
    val wf: Column => Column = b =>
      ((b * lit(7L)) % lit(5L) - lit(2L)).cast("double") / lit(10.0)
    val weights = (0 until dim).map(b => ((b.toLong * 7) % 5 - 2).toDouble / 10.0)
    val df = Seq("alpha beta gamma", "one two three four five", "x")
      .map(Tuple1(_)).toDF("text")
    val got = df.select(
        TextAnalysis.hashedLinearScore(col("text"), dim, wf, bias = 0.2)
          .as("s1"),
        TextAnalysis.linearScoreWithWeights(col("text"), weights, bias = 0.2)
          .as("s2"))
      .collect()
    got.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"literal-vector path diverged: ${r.getDouble(0)} vs ${r.getDouble(1)}")
      assert(r.getDouble(0) > 0.0 && r.getDouble(0) < 1.0)
    }
  }

  test("trainLinearClassifier: loss falls, separates, partition-invariant") {
    import spark.implicits._
    val docs = (0 until 100).map { i =>
      if (i % 2 == 0) (s"good great fine extra$i", 1)
      else (s"bad awful poor extra$i", 0)
    }.toDF("text", "label")
    val (w, b, losses) = TextAnalysis.trainLinearClassifier(
      docs, "text", "label", dim = 256, rounds = 20, lr = 2.0)
    assert(losses.head > losses.last,
      s"loss did not fall: ${losses.head} -> ${losses.last}")
    val acc = docs.select(
        TextAnalysis.linearScoreWithWeights(col("text"), w.toSeq, b).as("p"),
        col("label"))
      .collect()
      .count(r => (r.getDouble(0) >= 0.5) == (r.getInt(1) == 1)) / 100.0
    assert(acc >= 0.95, s"trained accuracy $acc")
    // integer-quantized gradients ⇒ training is BIT-IDENTICAL under any
    // partitioning — the property float gradient sums cannot give
    val (w2, b2, losses2) = TextAnalysis.trainLinearClassifier(
      docs.repartition(13), "text", "label", dim = 256, rounds = 20, lr = 2.0)
    assert(w.toSeq == w2.toSeq && b == b2 && losses == losses2)
  }

  test("bpeTrain greedy apply is left-to-right non-overlapping") {
    import spark.implicits._
    // "aaa" ×3: round 1 pairs (a,a)×2 per word ⇒ freq 6, merge (a,a);
    // apply greedily: [a,a,a] → [aa,a] (the merged token does not re-pair
    // with the consumed char). round 2 then sees (aa,a)×3.
    val df = Seq.fill(3)("aaa").map(Tuple1(_)).toDF("text")
    val merges = TextAnalysis.bpeTrain(df, "text", rounds = 2)
      .collect().map(r => r.getAs[Long]("round") ->
        ((r.getString(1), r.getString(2), r.getAs[Long]("freq")))).toMap
    assert(merges(1L) == (("a", "a", 6L)))
    assert(merges(2L) == (("aa", "a", 3L)))
  }

  test("bpeApply: encodes the vocab exactly as the trainer evolved it") {
    import spark.implicits._
    val df = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++ Seq.fill(3)("aaa"))
      .map(Tuple1(_)).toDF("text")
    val merges = TextAnalysis.bpeTrain(df, "text", rounds = 3)
    val enc = TextAnalysis.bpeApply(df, "text", merges)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getSeq[String](2).toList))).toMap
    // corpus merges: (l,o)x7 then (lo,w)x7 then (a,a)x6 — replaying them
    // over each word must give the trainer's final segmentation
    assert(enc("low") == ((5L, List("low"))))
    assert(enc("lower") == ((2L, List("low", "e", "r"))))
    assert(enc("aaa") == ((3L, List("aa", "a"))),
      "greedy fold must not re-merge the freshly merged token")
  }

  test("bpeApply on unseen words: merges apply where they fit, else chars") {
    import spark.implicits._
    val train = Seq.fill(4)("ab").map(Tuple1(_)).toDF("text")
    val merges = TextAnalysis.bpeTrain(train, "text", rounds = 1) // (a,b)
    val enc = TextAnalysis.bpeApply(
        Seq("abab", "ba", "cd").map(Tuple1(_)).toDF("text"), "text", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(enc("abab") == List("ab", "ab"))
    assert(enc("ba") == List("b", "a"))
    assert(enc("cd") == List("c", "d"))
  }

  test("ngramNovelty: identical corpus → 0, disjoint-vocab corpus → 1") {
    import spark.implicits._
    // identical text everywhere: every test window exists in train
    val same = (1L to 50L).map(i => (i, "w1 w2 w3 w4 w5 w6 w7"))
      .toDF("doc_id", "text")
    val zero = TextAnalysis.ngramNovelty(same, "doc_id", "text")
      .collect()
    assert(zero.nonEmpty, "hash split must put some docs in test")
    assert(zero.forall(_.getDouble(3) == 0.0))
    assert(zero.forall(r => r.getLong(1) == 3 && r.getLong(2) == 0))
    // per-doc unique vocab: every test window is novel
    val disjoint = (1L to 50L).map(i =>
        (i, (1 to 7).map(j => s"t${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val one = TextAnalysis.ngramNovelty(disjoint, "doc_id", "text")
      .collect()
    assert(one.nonEmpty && one.forall(_.getDouble(3) == 1.0))
  }
}

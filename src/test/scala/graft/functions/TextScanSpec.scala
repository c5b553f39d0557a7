package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class TextScanSpec extends SparkSpec {
  import spark.implicits._

  // the replaced spellings, re-run HERE as independent oracles
  private def bpeRegex(s: String): Int = {
    val m = java.util.regex.Pattern
      .compile("[a-z]+|[0-9]+|[^a-z0-9\\s]").matcher(s)
    var c = 0
    while (m.find()) c += 1
    c
  }
  private def stopFilter(s: String, words: Seq[String]): Int =
    s.split(" ", -1).count(words.contains)

  private val battery = Seq(
    "",
    " ",
    "   ",
    "the cat sat",
    "the  cat", // consecutive spaces → empty segment
    "the", "thee", "athe the the", // exact-match boundaries + duplicates
    "abc123def", "123 456", "a1b2c3",
    "Hello World", // uppercase = per-char 'other' tokens
    "a\tb\ncd\fe\rf", // the java \s set
    "über café naïve", // 2-byte UTF-8
    "日本語テキスト", // 3-byte UTF-8, no spaces
    "emoji 😀 mid", // 4-byte UTF-8 (surrogate pair in the String)
    "mixed CASE und der die 42 words!",
    "punct!!!runs???", "trailing space ", " leading",
    "el la de que y los", "the a of to and is in"
  )

  test("BpeTokenCount ≡ size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]'))") {
    for (s <- battery) {
      assert(BpeTokenCount.compute(UTF8String.fromString(s)) == bpeRegex(s),
        s"mismatch on ${s.getBytes("UTF-8").map("%02x".format(_)).mkString(" ")}")
    }
  }

  test("BpeTokenCount ≡ the regex spelling on random ASCII+unicode strings") {
    val rnd = new scala.util.Random(42)
    // whole code points (the 😀 stays a paired surrogate in the String)
    val tokens = Seq("a", "b", "c", "z", "0", "1", "9", " ", "A", "Z",
      "!", "?", ".", "\t", "\n", "é", "中", "😀")
    for (_ <- 1 to 500) {
      val s = (1 to rnd.nextInt(40)).map(_ =>
        tokens(rnd.nextInt(tokens.length))).mkString
      assert(BpeTokenCount.compute(UTF8String.fromString(s)) == bpeRegex(s),
        s"mismatch on ${s.getBytes("UTF-8").map("%02x".format(_)).mkString(" ")}")
    }
  }

  test("TokenSetCount ≡ size(filter(split(text,' '), isin)) incl. multiplicity") {
    val en = graft.ops.TextAnalysis.stopwords.head._2
    for (s <- battery; words <- Seq(en, Seq("the"), Seq("über", "café"))) {
      val e = TokenSetCount(GraftShimForTest.expr(lit(s)), words)
      assert(e.compute(UTF8String.fromString(s)) == stopFilter(s, words),
        s"mismatch on '$s' vs $words")
    }
    // duplicates MUST count every occurrence (array_intersect would not)
    val dup = TokenSetCount(GraftShimForTest.expr(lit("x")), Seq("the"))
    assert(dup.compute(UTF8String.fromString("the the the")) == 3)
  }

  test("column surface runs in whole-stage codegen, no ScalaUDF, null-safe") {
    val df = Seq(Some("the cat and 42 dogs!"), Some(""), None)
      .toDF("text").repartition(2)
      .select(
        BpeTokenCount.count(col("text")).as("bpe"),
        TokenSetCount.count(col("text"),
          graft.ops.TextAnalysis.stopwords.head._2).as("stops"))
    val rows = df.collect()
    val byNull = rows.partition(_.isNullAt(0))
    assert(byNull._1.length == 1 && byNull._1.head.isNullAt(1))
    val vals = byNull._2.map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1)
    // "the cat and 42 dogs!" → the|cat|and|42|dogs|! = 6 bpe; the,and = 2 stops
    assert(vals.toSeq == Seq((0, 0), (6, 2)))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Project")))
  }

  test("SQL registration: bpe_token_count / token_set_count") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT bpe_token_count('abc 123!'), token_set_count('the a the', 'the', 'a')")
      .head()
    assert(r.getInt(0) == 3 && r.getInt(1) == 3)
  }

  test("non-literal word/class args raise the contract error, not an internal one") {
    graft.plans.GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(("a b", "aeiou")).toDF("t", "cls")
    df.createOrReplaceTempView("tsc_fold")
    // pre-fix, eval(null) on the unbound column died with an internal
    // unbound-attribute error; the foldable gate must surface the contract
    val e1 = intercept[Exception] {
      spark.sql("SELECT char_class_run_count(t, cls) FROM tsc_fold").collect()
    }
    assert(e1.getMessage.contains("must be a string literal"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT token_set_count(t, cls) FROM tsc_fold").collect()
    }
    assert(e2.getMessage.contains("must be string literals"), e2.getMessage)
  }

  test("langId/bpeTokenCount projections match the pre-swap HOF/regex spellings") {
    // the full operator surface over a corpus slice: new spellings vs the
    // OLD column spellings evaluated side by side on the same frame
    val docs = battery.zipWithIndex.map(_.swap).toDF("id", "text")
    val words = split(col("text"), " ")
    val old = docs.select(col("id"),
      size(regexp_extract_all(col("text"),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("bpe_old"),
      size(filter(words, t => t.isin(
        graft.ops.TextAnalysis.stopwords.head._2.map(lit): _*))).as("stop_old"))
    val neu = docs.select(col("id"),
      graft.ops.TextAnalysis.bpeTokenCount(col("text")).as("bpe_new"),
      TokenSetCount.count(col("text"),
        graft.ops.TextAnalysis.stopwords.head._2).as("stop_new"))
    val joined = old.join(neu, "id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Int]("bpe_old") == r.getAs[Int]("bpe_new"), r.toString)
      assert(r.getAs[Int]("stop_old") == r.getAs[Int]("stop_new"), r.toString)
    }
  }

  // the round-9 third sibling: run counts over an ASCII char class
  private def runRegex(s: String, cls: String): Int = {
    val m = java.util.regex.Pattern
      .compile("[" + java.util.regex.Pattern.quote(cls) + "]+").matcher(s)
    var c = 0
    while (m.find()) c += 1
    c
  }

  test("CharClassRunCount ≡ size(regexp_extract_all(text, '[cls]+')) on the battery") {
    for (s <- battery; cls <- Seq(".!?", "aeiouy")) {
      assert(CharClassRunCount(GraftShimForTest.expr(lit(s)), cls)
        .compute(UTF8String.fromString(s)) == runRegex(s, cls),
        s"cls=$cls on ${s.getBytes("UTF-8").map("%02x".format(_)).mkString(" ")}")
    }
  }

  test("CharClassRunCount ≡ the regex spelling on random ASCII+unicode strings") {
    val rnd = new scala.util.Random(43)
    val tokens = Seq("a", "e", "y", "z", ".", "!", "?", ",", " ", "X",
      "é", "中", "😀", "aa", "!?", "...")
    for (_ <- 1 to 500) {
      val s = (1 to rnd.nextInt(40)).map(_ =>
        tokens(rnd.nextInt(tokens.length))).mkString
      for (cls <- Seq(".!?", "aeiouy"))
        assert(CharClassRunCount(GraftShimForTest.expr(lit(s)), cls)
          .compute(UTF8String.fromString(s)) == runRegex(s, cls),
          s"cls=$cls on ${s.getBytes("UTF-8").map("%02x".format(_)).mkString(" ")}")
    }
  }

  test("fleschScore / q171 projections match the pre-swap regex spellings") {
    val docs = battery.zipWithIndex.map(_.swap).toDF("id", "text")
    val old = docs.select(col("id"),
      size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
        .as("sent_old"),
      size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
        .as("syl_old"))
    val neu = docs.select(col("id"),
      CharClassRunCount.count(col("text"), ".!?").as("sent_new"),
      CharClassRunCount.count(lower(col("text")), "aeiouy").as("syl_new"))
    old.join(neu, "id").collect().foreach { r =>
      assert(r.getAs[Int]("sent_old") == r.getAs[Int]("sent_new"), r.toString)
      assert(r.getAs[Int]("syl_old") == r.getAs[Int]("syl_new"), r.toString)
    }
  }

  test("piiCounts regexp_count spelling ≡ size(regexp_extract_all) per kind") {
    val texts = Seq(
      "mail me at a.b@example.com or c@d.org today",
      "call 415-555-1234 x2 or +1 (212) 555-9876",
      "ssn 123-45-6789 and card 4111 1111 1111 1111",
      "nothing sensitive here", "")
    val docs = texts.zipWithIndex.map(_.swap).toDF("id", "text")
    graft.ops.TextAnalysis.piiPatterns.foreach { case (kind, pat, _) =>
      val pairs = docs.select(
        size(regexp_extract_all(col("text"), lit(pat), lit(0))).as("old"),
        regexp_count(col("text"), lit(pat)).cast("integer").as("neu"))
        .collect()
      pairs.foreach(r =>
        assert(r.getAs[Int]("old") == r.getAs[Int]("neu"), s"$kind: $r"))
    }
  }
}

/** Test-only bridge to build expressions from Columns. */
object GraftShimForTest {
  def expr(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftSqlShim.expression(c)
}

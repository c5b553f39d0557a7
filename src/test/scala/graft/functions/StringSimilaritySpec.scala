package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StringSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.jaroWinkler(a, b)

  test("textbook values match the standard (DuckDB-verified) constants") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    // odd raw transposition count: the halving FLOORS (DuckDB-verified)
    assert(math.abs(jw("stream slow customer a row has",
      "stream row customer a batch sm") - 0.9312820512820513) < 1e-15)
    assert(math.abs(jw("dwayne", "duane") - 0.8400000000000001) < 1e-15)
    assert(math.abs(jw("aaa", "aaaaaaaaaa") - 0.8366666666666667) < 1e-15)
    assert(jw("abcd", "abcd") == 1.0)
    assert(jw("ab", "ba") == 0.0) // window 0: transposed pair never matches
    assert(jw("", "abc") == 0.0 && jw("abc", "") == 0.0)
  }

  test("prefix bonus applies only above the 0.7 jaro threshold") {
    // shared prefix but jaro <= 0.7: NO boost (DuckDB semantics)
    assert(jw("abcdef", "abzzzz") == JaroWinkler.jaro("abcdef", "abzzzz"))
    assert(jw("ab", "az") == JaroWinkler.jaro("ab", "az"))
    // above threshold: bonus capped at 4 prefix chars
    val j = JaroWinkler.jaro("abcdefgh", "abcdefxx")
    assert(j > 0.7)
    assert(math.abs(jw("abcdefgh", "abcdefxx") - (j + 4 * 0.1 * (1 - j))) < 1e-15)
  }

  test("column/SQL surface evaluates in codegen without a ScalaUDF") {
    // repartition prevents ConvertToLocalRelation from pre-evaluating the
    // projection — the expression must run inside a codegen stage
    val df = Seq(("martha", "marhta"), ("dwayne", "duane"), (null, "x"))
      .toDF("a", "b").repartition(2)
      .select(col("a"), JaroWinkler.jaroWinklerCol(col("a"), col("b")).as("s"))
    val rows = df.collect().sortBy(r => Option(r.getString(0)).getOrElse(""))
    assert(rows(0).isNullAt(1)) // null-safe
    assert(math.abs(rows(2).getDouble(1) - 0.9611111111111111) < 1e-15)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    // '*(n)' prefixes a WholeStageCodegen stage in the plan rendering —
    // the projection carrying jarowinkler() must sit inside one
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("Project")))
    // SQL registration path
    graft.plans.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta')").head().getDouble(0)
    assert(math.abs(viaSql - 0.9611111111111111) < 1e-15)
  }

  test("jaroWinklerPairs: blocked join, no cartesian, catches transpositions") {
    val docs = Seq(
      (1L, "acme corp annual report 2024"),
      (2L, "acme crop annual report 2024"), // transposition of 'corp'
      (3L, "acme totally different text here"),
      (4L, "zeta unrelated document")
    ).toDF("doc_id", "text")
    val pairs = graft.ops.TextDedup.jaroWinklerPairs(docs, "doc_id", "text",
      prefixLen = 30, minSim = 0.9)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L))) // 3 shares the block but scores < 0.9
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }
}

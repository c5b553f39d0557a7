package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro–Winkler similarity — the record-linkage scorer for short
  * strings (names, titles, identifiers) where edit distance over-penalizes
  * transpositions. Spark ships levenshtein but no Jaro family; this fills
  * the gap as a codegen'd primitive (whole-stage codegen emits one static
  * call — no ScalaUDF SerDe, no interpreted fallback).
  *
  * Standard definition (matches DuckDB's `jaro_winkler_similarity`, which
  * the oracle replays): match window `max(|a|,|b|)/2 - 1`, transpositions
  * counted over matched sequences and halved, prefix bonus
  * `l·0.1·(1−jaro)` with `l = common prefix ≤ 4` applied only when
  * `jaro > 0.7`. Identical formula order on both engines; the driver
  * compare rounds to 9 significant digits, which absolute-ULP-identical
  * double division satisfies.
  *
  * O(|a|·|b|) per pair — like levenshtein, this is a VERIFY-stage scorer:
  * generate candidates with a blocked equi-join first
  * ([[graft.ops.TextDedup.editDistancePairs]]' first-token blocking, LSH,
  * or a sorted-neighborhood key), never a cross join.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler needs (string, string), got " +
        s"(${left.dataType}, ${right.dataType})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static entry shared by interpreted eval and generated code. */
  def compute(a: UTF8String, b: UTF8String): Double =
    jaroWinkler(a.toString, b.toString)

  def jaroWinkler(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j <= 0.7) return j
    var l = 0
    val maxL = math.min(4, math.min(s1.length, s2.length))
    while (l < maxL && s1.charAt(l) == s2.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  def jaro(s1: String, s2: String): Double = {
    val n1 = s1.length
    val n2 = s2.length
    if (n1 == 0 || n2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val window = math.max(math.max(n1, n2) / 2 - 1, 0)
    val m1 = new Array[Boolean](n1)
    val m2 = new Array[Boolean](n2)
    var matches = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - window)
      val hi = math.min(n2 - 1, i + window)
      var k = lo
      var found = false
      while (k <= hi && !found) {
        if (!m2(k) && s1.charAt(i) == s2.charAt(k)) {
          m1(i) = true; m2(k) = true; matches += 1; found = true
        }
        k += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched chars out of relative order, halved with
    // INTEGER division — an odd raw count floors, matching DuckDB /
    // rapidfuzz / Apache Commons (a fractional half-transposition is the
    // other convention; engines disagree, so the floor is pinned here and
    // exercised by an odd-count spec case)
    var t = 0
    var k2 = 0
    i = 0
    while (i < n1) {
      if (m1(i)) {
        while (!m2(k2)) k2 += 1
        if (s1.charAt(i) != s2.charAt(k2)) t += 1
        k2 += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / n1 + m / n2 + (m - (t / 2)) / m) / 3.0
  }

  /** Column API: `jaro_winkler(a, b)` in [0, 1]. */
  def jaroWinklerCol(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      JaroWinkler(
        org.apache.spark.sql.GraftSqlShim.expression(a),
        org.apache.spark.sql.GraftSqlShim.expression(b)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass, allocation-free text scanners for the full-corpus curation
  * projections (language-ID, token budgeting, quality gating).
  *
  * Why Expressions and not `functions`: both replaced spellings are
  * members of a measured scale-bug class. The sf100 probe (5M docs)
  * caught `punctRatio`'s `regexp_extract_all` running super-linear —
  * java.util.regex allocates one UTF8String per MATCH, so a token-count
  * regex allocates once per token corpus-wide, is GC-bound, and its
  * throughput stayed flat from 14→32 threads (BASELINE.md, round-8 q64
  * dissection: 2411 s → 134.8 s after removing ONE such expression). The
  * two siblings fixed here:
  *
  *  - `size(regexp_extract_all(text, "[a-z]+|[0-9]+|[^a-z0-9\\s]"))`
  *    (BPE-proxy token count) → [[BpeTokenCount]], a char-class
  *    transition count over the UTF-8 bytes: one counter, zero
  *    allocation, value-identical (the regex's three alternatives are
  *    disjoint char classes, so greedy runs ≡ class runs).
  *  - `size(filter(split(text, " "), t => t.isin(stopwords)))` (stopword
  *    occurrence count) → [[TokenSetCount]]. Lambda HOFs are
  *    CodegenFallback — interpreted per row, and langId evaluates one
  *    per language profile per row. The count case cannot use
  *    `arrays_overlap` (boolean) or `size(array_intersect)` (drops
  *    duplicate hits — the oracle counts occurrences); this scans the
  *    text bytes once per profile, comparing each space-delimited
  *    segment against the tiny profile lexicon in place.
  *
  * Both run in whole-stage codegen (the generated code calls one static/
  * reference method per row) and keep the enclosing projection compiled.
  */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_token_count"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count needs string, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any =
    BpeTokenCount.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeTokenCount.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeTokenCount {

  /** Token count under the BPE-proxy grammar `[a-z]+|[0-9]+|[^a-z0-9\s]`:
    * one token per maximal lowercase-alpha run, per maximal digit run,
    * and per OTHER non-whitespace code point (uppercase and every
    * non-ASCII code point each count singly — exactly how the negated
    * class matches one code point at a time; `\s` is java.regex's ASCII
    * set). Byte-level scan: ASCII classifies directly; a UTF-8 lead byte
    * is one "other" code point; continuation bytes are interior to an
    * already-counted code point and skipped. */
  def compute(s: UTF8String): Int = {
    val n = s.numBytes()
    var count = 0
    var prev = 0 // 0 = boundary (start/ws/other), 1 = alpha run, 2 = digit run
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if ((b & 0x80) == 0) {
        if (b >= 'a' && b <= 'z') { if (prev != 1) count += 1; prev = 1 }
        else if (b >= '0' && b <= '9') { if (prev != 2) count += 1; prev = 2 }
        else if (b == ' ' || b == '\t' || b == '\n' || b == 0x0b ||
          b == '\f' || b == '\r') prev = 0
        else { count += 1; prev = 0 }
      } else if ((b & 0xc0) == 0xc0) { count += 1; prev = 0 }
      i += 1
    }
    count
  }

  /** Column API: BPE-proxy token count of `text`. */
  def count(text: Column): Column =
    GraftSqlShim.column(BpeTokenCount(GraftSqlShim.expression(text)))
}

/** Count of maximal runs of characters from an ASCII class — ≡
  * `size(regexp_extract_all(text, "[<chars>]+", 0))` for a class of ASCII
  * characters (continuation bytes of multi-byte code points are ≥ 0x80
  * and can never match, so the byte scan sees exactly the code points the
  * regex sees). Third member of the round-8/9 scanner family: the regex
  * spelling allocates one UTF8String per MATCH corpus-wide (the measured
  * super-linear class — see the object scaladoc above); this is one
  * counter, zero allocation, whole-stage codegen. */
case class CharClassRunCount(child: Expression, chars: String)
    extends UnaryExpression {
  require(chars.nonEmpty && chars.forall(_ < 0x80),
    "char_class_run_count needs a non-empty ASCII char class")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "char_class_run_count"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"char_class_run_count needs string, got ${child.dataType}")
  }

  // O(1) membership: 128-slot ASCII table
  private lazy val member: Array[Boolean] = {
    val t = new Array[Boolean](128)
    chars.foreach(c => t(c) = true)
    t
  }

  def compute(s: UTF8String): Int = {
    val m = member
    val n = s.numBytes()
    var count = 0
    var inRun = false
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 0 && m(b)) { if (!inRun) count += 1; inRun = true }
      else inRun = false
      i += 1
    }
    count
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("runCounter", this,
      classOf[CharClassRunCount].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharClassRunCount {

  /** Column API: maximal runs of `chars` members in `text`. */
  def count(text: Column, chars: String): Column =
    GraftSqlShim.column(CharClassRunCount(GraftSqlShim.expression(text), chars))
}

/** Occurrence count of `words` members among the single-space-split
  * segments of the text — ≡ `size(filter(split(text, " "), t =>
  * t.isin(words)))` including empty-segment behavior (consecutive spaces
  * yield empty segments; no lexicon word is empty, so they never match).
  * Duplicate hits count every time — the multiplicity the lang-ID oracle
  * requires. One pass over the text bytes; segment boundaries are literal
  * 0x20 bytes, which cannot occur inside a multi-byte UTF-8 sequence. */
case class TokenSetCount(child: Expression, words: Seq[String])
    extends UnaryExpression {
  require(words.nonEmpty && words.forall(_.nonEmpty),
    "token_set_count needs a non-empty lexicon of non-empty words")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_set_count"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"token_set_count needs string, got ${child.dataType}")
  }

  // UTF-8 lexicon bytes, deduplicated (isin semantics ignore duplicates)
  private lazy val wordBytes: Array[Array[Byte]] =
    words.distinct.map(_.getBytes("UTF-8")).toArray

  def compute(s: UTF8String): Int = {
    val wb = wordBytes
    val n = s.numBytes()
    var count = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.getByte(i) == 0x20) {
        val len = i - start
        var w = 0
        var hit = false
        while (!hit && w < wb.length) {
          val cand = wb(w)
          if (cand.length == len) {
            var j = 0
            while (j < len && cand(j) == s.getByte(start + j)) j += 1
            hit = j == len
          }
          w += 1
        }
        if (hit) count += 1
        start = i + 1
      }
      i += 1
    }
    count
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("counter", this, classOf[TokenSetCount].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenSetCount {

  /** Column API: occurrences of any `words` member among the space-split
    * tokens of `text`. */
  def count(text: Column, words: Seq[String]): Column =
    GraftSqlShim.column(TokenSetCount(GraftSqlShim.expression(text), words))
}

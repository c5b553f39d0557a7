package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a pre-split token array, as one native
  * pass — as strings (`hashed=false`) or as 60-bit md5-prefix hashes
  * (`hashed=true`, `array<long>`).
  *
  * The composable string spelling —
  * `array_distinct(transform(sequence(...), i => array_join(slice(words, i,
  * n), " ")))` — allocates a sequence array, n-element slices, and joined
  * strings per shingle, then runs an O(k²) distinct; it measured ~1 ms per
  * document, which multiplied across the 4–6 recomputations a
  * similarity-join plan makes of its shingle subtree dominated the whole
  * query. This expression builds each shingle once (UTF8String concat, no
  * intermediate arrays) and dedups through a hash set, preserving
  * first-occurrence order — the same contents `list_distinct` of the
  * composable form yields, so DuckDB oracle parity is unaffected.
  *
  * The hashed form exists because the obvious composable spelling —
  * `transform(shingles, s => conv(substring(md5(s),1,15),16,10))` — runs
  * the md5/conv subtree INTERPRETED (higher-order-function lambdas are not
  * whole-stage-codegen'd) and round-trips through a hex string; measured
  * ~10× slower end-to-end on the similarity queries. Here the hash is the
  * first 60 bits of the raw digest (== DuckDB
  * `('0x' || substr(md5(s),1,15))::BIGINT`, the engine-independent oracle
  * form), computed digest→long with no hex detour.
  */
case class NGramShingles(child: Expression, n: Int, hashed: Boolean = false)
    extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType =
    if (hashed) ArrayType(LongType, containsNull = false)
    else ArrayType(StringType, containsNull = false)
  override def prettyName: String =
    if (hashed) "ngram_shingle_hashes" else "ngram_shingles"

  private val space = UTF8String.fromString(" ")

  /** One pass over the token array; called from both interpreted eval and
    * the generated code (via an object reference — the loop body is not
    * worth inlining into janino). */
  def compute(words: ArrayData): ArrayData = {
    val m = words.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](math.max(8, m * 2))
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) { window(j) = words.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(space, window: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    if (hashed) {
      val md = NGramShingles.digest.get()
      while (it.hasNext) {
        md.reset()
        val d = md.digest(it.next().getBytes)
        // first 15 hex chars of the digest == top 60 bits: big-endian
        // long of bytes 0..7, dropping the low nibble of byte 7
        var v = 0L
        var b = 0
        while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
        out(k) = v >>> 4
        k += 1
      }
    } else {
      while (it.hasNext) { out(k) = it.next(); k += 1 }
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingler", this, classOf[NGramShingles].getName)
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($w);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NGramShingles {
  /** Per-thread MessageDigest: expression instances are shared across task
    * threads via the codegen reference object, and MessageDigest is not
    * thread-safe. */
  private val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Column API: distinct word n-grams of `words` (an array<string>). */
  def shingles(words: Column, n: Int): Column =
    GraftSqlShim.column(NGramShingles(GraftSqlShim.expression(words), n))

  /** Column API: 60-bit md5-prefix hashes of the distinct word n-grams of
    * `words`, hashed in the same native pass (`array<long>`). */
  def shingleHashes(words: Column, n: Int): Column =
    GraftSqlShim.column(NGramShingles(GraftSqlShim.expression(words), n, hashed = true))
}

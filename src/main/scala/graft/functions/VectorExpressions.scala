package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for float-vector dot products.
  *
  * Why an Expression and not `functions`: the composable alternatives are
  * (a) a 64-term unrolled `a[i]*b[i]` tree — interpreted at ~15 µs/row when
  * the enclosing stage (e.g. a BroadcastNestedLoopJoin) falls outside
  * whole-stage codegen, and enormous generated code when inside it; or
  * (b) `aggregate(zip_with(...))` higher-order functions — ~5 µs/row with
  * per-element lambda dispatch and array allocation. This expression is a
  * tight primitive loop over the columnar `ArrayData` (no boxing, no
  * allocation) in BOTH codegen and interpreted modes: ~0.1 µs/row, and it
  * works for any dimension without exploding the plan.
  *
  * Summation is left-associated ascending-index double accumulation — the
  * exact order the engine's DuckDB oracles replay, so scores hash-match
  * bit-for-bit.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double s = 0.0;
         |for (int i = 0; i < n; i++) {
         |  s += (double) $a.getFloat(i) * (double) $b.getFloat(i);
         |}
         |${ev.value} = s;
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level API for the vector expressions. */
object VectorFunctions {

  /** Σ a[i]·b[i] in doubles, fixed ascending order (null if either side
    * is null; length mismatch truncates to the shorter vector). */
  def vecDot(a: Column, b: Column): Column =
    GraftSqlShim.column(FloatVecDot(
      GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  /** L2 norm with the same summation order. */
  def vecNorm(a: Column): Column = sqrt(vecDot(a, a))

  /** Cosine similarity from precomputed norms — callers should compute
    * norms once per vector, not once per pair. */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    vecDot(a, b) / (normA * normB)
}

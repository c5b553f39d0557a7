package graft.functions

import graft.json.Docs
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `flat_json(json)` — the reference's FlatJson flatten as a NATIVE
  * Catalyst expression: raw JSON string → `map<string,string>` of dotted
  * paths / `field[i]` array entries (SURVEY §1.2), null on malformed
  * input (`silent: true`).
  *
  * Exists because the UDF spelling ([[graft.json.Docs.flattenUdf]])
  * round-trips every row through the Catalyst↔Scala converters (external
  * `Map` allocation + re-encoding) and blocks whole-stage codegen at the
  * projection. This expression evaluates UTF8String→MapData inside the
  * generated code via a reference object — no SerDe boundary, codegen
  * span intact. Parse semantics are byte-identical: both paths call
  * [[Docs.flatten]].
  */
case class FlatJsonMap(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = false)
  override def nullable: Boolean = true // malformed input → null row value
  override def prettyName: String = "flat_json"

  override protected def nullSafeEval(input: Any): Any =
    FlatJsonMap.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = FlatJsonMap.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.util.MapData) $cls.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FlatJsonMap {
  /** Shared by interpreted eval, generated code, and the flatjson V2
    * connector's PartitionReader — one definition of the flatten. */
  def compute(s: UTF8String): MapData = {
    val m = Docs.flatten(s.toString)
    if (m == null) null
    else {
      val keys = new Array[AnyRef](m.size)
      val vals = new Array[AnyRef](m.size)
      var i = 0
      m.foreach { case (k, v) =>
        keys(i) = UTF8String.fromString(k)
        vals(i) = UTF8String.fromString(v)
        i += 1
      }
      new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
    }
  }

  /** Column API: `flatJson(col("raw"))`. */
  def flatJson(c: Column): Column =
    GraftSqlShim.column(FlatJsonMap(GraftSqlShim.expression(c)))
}

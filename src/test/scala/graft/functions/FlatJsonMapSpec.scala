package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native flat_json expression: UDF-path equivalence, null-on-
  * malformed, SQL registration, and the no-ScalaUDF plan contract.
  */
class FlatJsonMapSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    """{"a":{"b":1},"c":[{"d":"x"},{"d":"y"}],"e":null,"f":true}""",
    """broken {""",
    """{"s":"plain"}""")

  test("flatten semantics match the UDF path exactly; malformed → null") {
    val df = docs.toDF("raw")
    val native = df.select(FlatJsonMap.flatJson(col("raw")).as("m"))
      .as[Option[Map[String, String]]].collect().toSeq
    val viaUdf = df.select(graft.json.Docs.flattenUdf(col("raw")).as("m"))
      .as[Option[Map[String, String]]].collect().toSeq
    assert(native == viaUdf)
    assert(native(0).get == Map("a.b" -> "1", "c[0].d" -> "x",
      "c[1].d" -> "y", "f" -> "true"))
    assert(native(1).isEmpty)
  }

  test("registered in SQL as flat_json; plan carries no ScalaUDF") {
    graft.plans.GraftExtensions.register(spark)
    // a real file scan — over a literal local relation Catalyst constant-
    // folds the whole expression away, which proves evaluation but hides
    // the plan shape this test pins
    val dir = scratch("fjm")
    docs.toDF("raw").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("fjm_raw")
    val out = spark.sql(
      "SELECT flat_json(raw)['a.b'] AS ab FROM fjm_raw WHERE flat_json(raw) IS NOT NULL")
    assert(out.collect().map(_.getString(0)).toSet == Set("1", null))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF"), s"native expression fell back to UDF:\n$p")
    assert(p.contains("flat_json"), s"expression missing from plan:\n$p")
    assert(p.contains("*("), s"projection not whole-stage codegen'd:\n$p")
  }

  test("null input stays null (nullSafeEval contract)") {
    val r = Seq[String](null).toDF("raw")
      .select(FlatJsonMap.flatJson(col("raw"))).head()
    assert(r.isNullAt(0))
  }
}

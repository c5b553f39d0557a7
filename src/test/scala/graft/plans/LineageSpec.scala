package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Column lineage off the analyzed plan: projections, aggregates,
  * joins, windows, constants, and the PII taint query. */
class LineageSpec extends SparkSpec {
  import spark.implicits._

  /** Round-trip through parquet so the leaf relation carries REAL column
    * names (a bare `toDF` leaf is an anonymous `_1/_2/...` LocalRelation
    * under a rename Project — lineage correctly reports those positional
    * names, which is not what this spec wants to pin). */
  private def tbl(df: org.apache.spark.sql.DataFrame, name: String) = {
    val p = s"${scratch(s"lineage-$name")}/$name"
    df.write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  test("projection and aggregate lineage resolves through aliases") {
    val t = tbl(Seq((1L, "a", 2.0)).toDF("id", "name", "amt"), "t")
    val q = t.groupBy(col("name").as("grp"))
      .agg(sum(col("amt") * 2).as("rev"), count(lit(1)).as("n"))
    val lin = Lineage.columnLineage(q)
    assert(lin("grp").exists(_.endsWith(".name")))
    assert(lin("rev").exists(_.endsWith(".amt")))
    assert(lin("n") == Set.empty, s"count(1) has no source cols: $lin")
  }

  test("join lineage keeps both sides' sources distinct") {
    val a = tbl(Seq((1L, "x")).toDF("k", "va"), "a")
    val b = tbl(Seq((1L, 9.0)).toDF("k", "vb"), "b")
    val q = a.join(b, "k").select(col("va"),
      (col("vb") * 2).as("dbl"), concat(col("va"), col("vb")).as("both"))
    val lin = Lineage.columnLineage(q)
    assert(lin("va").size == 1 && lin("va").head.endsWith(".va"))
    assert(lin("dbl").size == 1 && lin("dbl").head.endsWith(".vb"))
    assert(lin("both").size == 2)
  }

  test("window expressions and chained aliases resolve to leaves") {
    import org.apache.spark.sql.expressions.Window
    val t = tbl(Seq((1L, "g", 3.0)).toDF("id", "g", "x"), "w")
    val q = t.withColumn("r", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("x"))))
      .withColumn("r2", col("r") + 1)
      .select(col("r2"))
    val lin = Lineage.columnLineage(q)
    // row_number depends on partition/order keys g and x
    assert(lin("r2").exists(_.endsWith(".g")) &&
      lin("r2").exists(_.endsWith(".x")), s"window lineage lost: $lin")
  }

  test("taintedBy flags outputs reachable from a PII source column") {
    val users = tbl(Seq((1L, "ann@x.org", "US")).toDF("uid", "email", "cc"), "users")
    val facts = tbl(Seq((1L, 5.0)).toDF("uid", "v"), "facts")
    val rpt = facts.join(users, "uid").select(
      col("cc"), (col("v") * 2).as("dv"),
      sha2(col("email"), 256).as("contact_hash"))
    assert(Lineage.taintedBy(rpt, Seq("email")) == Seq("contact_hash"))
    assert(Lineage.taintedBy(rpt, Seq("uid"))
      .isEmpty, "uid feeds only the join keys, not surviving outputs")
  }

  test("explode output and 2nd union branch carry taint (no false negatives)") {
    import org.apache.spark.sql.functions._
    // parquet-backed sources so the LEAF attributes carry real names
    // (a toDF over a tuple LocalRelation names its leaves _1/_2)
    val d = scratch("lineage-gu")
    Seq((1L, Seq("a@x", "b@y"))).toDF("id", "emails")
      .write.parquet(s"$d/src")
    Seq((1L, "ok")).toDF("id", "v").write.parquet(s"$d/l")
    Seq((2L, "pii@x")).toDF("id", "secret").write.parquet(s"$d/r")
    // generator output: a column exploded straight out of a PII array
    val gen = spark.read.parquet(s"$d/src")
      .select(explode(col("emails")).as("e"))
    assert(Lineage.taintedBy(gen, Seq("emails")) == Seq("e"),
      "explode output must inherit the array's taint")
    // union: a source feeding only the SECOND branch must be reported
    val l = spark.read.parquet(s"$d/l")
    val r = spark.read.parquet(s"$d/r")
      .select(col("id"), col("secret").as("v"))
    val u = l.unionByName(r)
    assert(Lineage.taintedBy(u, Seq("secret")).contains("v"),
      "2nd union branch's source must taint the output")
    // and the FIRST branch's source still reports too
    assert(Lineage.taintedBy(u, Seq("v")).contains("v"))
  }
}

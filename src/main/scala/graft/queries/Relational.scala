package graft.queries

import graft.core.Tables.table
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generic relational operator surface (SURVEY.md §2.2–§2.8) expressed over
  * the driver test corpus. One named query per operator family; each has a
  * DuckDB-equivalent oracle in [[Relational.oracles]].
  *
  * Column names are aliased identically in the Spark plan and the oracle SQL
  * (the driver compare sorts columns by name before hashing).
  */
object Relational {

  /** TPC-H Q1-style wide aggregation (scan → filter → hash agg).
    * Doubles are summed exactly: quantities are integral; prices carry two
    * decimals, so sums are rounded to 2 before compare to absorb
    * accumulation-order differences between engines.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .where(col("l_shipdate") <= to_timestamp(lit("1998-09-01")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        count(lit(1)).as("count_order")
      )

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> q1Agg
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin
  )
}

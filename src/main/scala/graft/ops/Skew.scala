package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-mitigation operators. AQE handles skewed *joins* at runtime
  * (`spark.sql.adaptive.skewJoin`), but a skewed *window* — e.g. rank-1
  * dedup where one URN holds 10^8 versions, the reference's popular-repo
  * hazard (SURVEY.md §7.4) — still funnels every row of the hot key
  * through one task. Salting splits that task `salts` ways.
  */
object Skew {

  /** Two-stage top-k per key, equivalent to
    * `row_number over (partition by keys order by order) <= k` but safe
    * under key skew: stage 1 ranks within (key, salt) — a hot key's rows
    * spread across `salts` tasks, each keeping at most k survivors — and
    * stage 2 re-ranks the ≤ salts·k survivors per key. Output is
    * IDENTICAL to the unsalted window when `order` is a total order
    * (deterministic tiebreaks), because the global top-k of a union of
    * per-salt top-k's is the global top-k.
    *
    * Cost: two shuffles instead of one, the second over ≤ salts·k rows
    * per key. Use when the hottest key exceeds what one task should sort;
    * otherwise prefer the plain window (one shuffle + WindowGroupLimit).
    */
  def topKPerKeySalted(df: DataFrame, keys: Seq[String], order: Seq[Column],
      k: Int, salts: Int = 16): DataFrame = {
    require(k >= 1 && salts >= 1)
    val salt = pmod(hash(df.columns.map(col): _*), lit(salts))
    val stage1 = df
      .withColumn("__rn1", row_number().over(
        Window.partitionBy((keys.map(col) :+ salt): _*).orderBy(order: _*)))
      .where(col("__rn1") <= k)
      .drop("__rn1")
    val w2 = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    stage1
      .withColumn("__rn", row_number().over(w2))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /** Latest-version-wins under skew: salted k=1 — drop-in for
    * [[Merges.latestByKey]] when a dedup key is pathologically hot. */
  def latestByKeySalted(df: DataFrame, keys: Seq[String],
      order: Seq[Column], salts: Int = 16): DataFrame =
    topKPerKeySalted(df, keys, order, 1, salts)
}

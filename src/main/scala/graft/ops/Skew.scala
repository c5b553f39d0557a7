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

  /** Manually salted equi-join for a hot key when AQE's skew-join can't
    * help (disabled, streaming micro-batches, or a build side too big to
    * broadcast but small enough to replicate `salts`×): the BIG side gets
    * a row-hash salt, the SMALL side replicates once per salt value, and
    * the join runs on (key, salt) — a hot key's rows spread across
    * `salts` tasks instead of funneling through one. Result is row-
    * identical to the plain equi-join (every big row still meets every
    * matching small row exactly once). Cost: `salts`× the small side's
    * shuffle bytes — keep `salts` ≈ hot-key-rows / healthy-task-rows.
    * Both inputs must share the join column name. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(big.columns.contains(key) && small.columns.contains(key),
      s"both sides need join column '$key'")
    val salt = pmod(hash(big.columns.map(col): _*), lit(salts))
    val b = big.withColumn("__salt", salt)
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}

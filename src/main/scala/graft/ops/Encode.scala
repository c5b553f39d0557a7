package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dictionary (label) encoding for categorical columns — the feature-
  * engineering step that turns strings into dense integer codes before
  * training, with a persistable dictionary so train- and inference-time
  * encodings agree.
  *
  * Codes are assigned by SORTED VALUE ORDER (code 0 = smallest string),
  * not first-seen order: sorted assignment is a pure function of the
  * value set, so re-runs, repartitionings, and other engines produce the
  * same dictionary — the [[Sampling]] determinism rule applied to
  * encoding. (First-seen order is partition-order-dependent and
  * irreproducible on a cluster.)
  *
  * 100 TB shape: the dictionary is `distinct` on one column (map-side
  * partial dedup absorbs the volume) and is SMALL — categorical columns
  * have bounded cardinality, or they should not be dictionary-encoded
  * (the `require` cap makes that contract explicit rather than letting a
  * single-task window absorb a high-cardinality column silently). The
  * code assignment window runs over the dictionary only, and the encode
  * join broadcasts it — the big table never shuffles.
  */
object Encode {

  /** The dictionary for `colName`: (value, code) with codes 0..n-1 in
    * sorted value order. `maxCardinality` is the contract guard. */
  def dictionary(df: DataFrame, colName: String,
      maxCardinality: Int = 1 << 20): DataFrame = {
    val distinct = df.select(col(colName)).where(col(colName).isNotNull)
      .distinct()
    val n = distinct.count()
    require(n <= maxCardinality,
      s"$colName has $n distinct values (> $maxCardinality); " +
        "dictionary-encoding a high-cardinality column needs hashing, " +
        "not a dictionary")
    distinct.withColumn("code",
      row_number().over(Window.orderBy(col(colName))) - 1)
  }

  /** Encode `colName` as `<colName>_code` via a broadcast join against
    * `dict` (from [[dictionary]], possibly persisted from a previous
    * run). Values absent from the dictionary get code -1 — the standard
    * unknown-category convention at inference time. */
  def encode(df: DataFrame, dict: DataFrame, colName: String): DataFrame =
    df.join(broadcast(dict.withColumnRenamed(colName, "__dv")),
        df(colName) === col("__dv"), "left")
      .withColumn(s"${colName}_code",
        coalesce(col("code"), lit(-1)).cast("int"))
      .drop("__dv", "code")
}

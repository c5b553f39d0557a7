package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level PII governance — the engine-side half of the reference's
  * `GetPiiString` convention (ProcessDaily.usql:109-114,3159-3167 marks
  * exactly which curated columns carry emails/names; `entities.Specs`
  * preserves those flags as `Field(pii = true)`).
  *
  * Masking is deterministic pseudonymization, not redaction: equal
  * inputs map to equal tokens, so masked tables still JOIN on identity
  * (the property analytics needs) while exposing nothing readable.
  * Every function is a codegen'd column expression — masking a 100 TB
  * table is a projection at scan speed.
  */
object Governance {

  /** Deterministic pseudonym: first 16 hex chars of salted SHA-256 —
    * linkable within one salt epoch, unlinkable across epochs (rotate
    * the salt to sever history). */
  def pseudonym(c: Column, salt: String = ""): Column =
    substring(sha2(concat(lit(salt), c.cast("string")), 256), 1, 16)

  /** Email mask that preserves the domain (the analytically useful
    * part): local part → pseudonym, domain kept. Non-email values mask
    * WHOLE — the shape test is strict (one `@`, no whitespace, dotted
    * domain) because the earlier `contains('@')` test let any PII
    * free-text with an `@` ("DM me @john", "x@internal-host") publish
    * everything after the last `@` verbatim in the "masked" column. A
    * well-formed email takes the same branch either way, so consumers
    * masking real emails are value-identical. */
  def maskEmail(c: Column, salt: String = ""): Column =
    when(c.rlike("^[^@\\s]+@[^@\\s]+\\.[^@\\s]+$"),
      concat(pseudonym(substring_index(c, "@", 1), salt),
        lit("@"), substring_index(c, "@", -1)))
      .otherwise(pseudonym(c, salt))

  /** IPv4 mask preserving the /24 network (geo/abuse analytics keep
    * working): last octet → x. */
  def maskIp(c: Column): Column =
    regexp_replace(c, "(\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3})\\.\\d{1,3}\\b", "$1.x")

  /** Mask every listed column of `df` in one projection; non-listed
    * columns pass through untouched. Drives from `entities.Specs`'
    * `pii = true` flags:
    * {{{
    *   Governance.maskColumns(commit, Specs.commit.fields.filter(_.pii).map(_.out))
    * }}} */
  def maskColumns(df: DataFrame, piiCols: Seq[String],
      salt: String = ""): DataFrame = {
    require(piiCols.forall(df.columns.contains),
      s"unknown pii columns: ${piiCols.filterNot(df.columns.contains).mkString(",")}")
    val pii = piiCols.toSet
    df.select(df.columns.map { c =>
      if (pii(c))
        when(col(c).isNull, lit(null))
          .otherwise(maskEmail(col(c), salt)).as(c)
      else col(c)
    }: _*)
  }

  /** k-anonymity / l-diversity audit over a quasi-identifier grouping:
    * one row per quasi-identifier combination with its population
    * (`group_size`), the number of distinct sensitive values it contains
    * (`l_diversity`), and the two violation flags — `group_size < k`
    * (re-identifiable cohort) and `l_diversity ≤ 1` (attribute disclosure:
    * knowing the cohort reveals the sensitive value). The release-gate
    * report run before publishing any person-grained extract.
    *
    * One groupBy with an exact per-group COUNT DISTINCT on a single
    * column (two-phase aggregate, no Expand — this is not the N-column
    * profile hazard); output is quasi-combination-grained, orders of
    * magnitude smaller than the input. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"),
        countDistinct(col(sensitiveCol)).as("l_diversity"))
      .select(quasiCols.map(col) ++ Seq(col("group_size"),
        col("l_diversity"),
        (col("group_size") < k).as("k_violation"),
        (col("l_diversity") <= 1).as("l_violation")): _*)
  }

  /** CDF thresholds of the TRUNCATED two-sided geometric mechanism with
    * α = 1/2 (ε = ln 2): P(K=0) = 1/3, P(K=±j) = (1/3)·2^−j for |j| <
    * `bound`, and BOTH tails folded symmetrically into their endpoints —
    * P(K=±bound) = Σ_{j≥bound} (1/3)·2^−j = (2/3)·2^−bound, so the
    * truncated pmf sums to exactly 1 and the mechanism stays symmetric
    * (the earlier spelling folded only the upper tail, giving the +bound
    * endpoint ≈3× the −bound mass). Returns P(K ≤ k) for k = −bound …
    * bound−1 (the closing ELSE catches +bound, whose fold is implicit in
    * 1 − last threshold). Public so the oracle can embed the IDENTICAL
    * literals. */
  def dpThresholds(bound: Int): Seq[Double] = {
    require(bound >= 1)
    val pmf = (-bound to bound).map { k =>
      if (k == 0) 1.0 / 3.0
      else if (math.abs(k) == bound) (2.0 / 3.0) * math.pow(0.5, bound)
      else (1.0 / 3.0) * math.pow(0.5, math.abs(k))
    }
    pmf.scanLeft(0.0)(_ + _).drop(1).dropRight(1)
  }

  /** ε-differential-privacy-SHAPED noisy group counts: per group,
    * `max(count + K, 0)` where K follows the truncated two-sided
    * geometric distribution (ε = ln 2) — the discrete mechanism a count
    * release uses.
    *
    * DETERMINISTIC-REPLAY HARNESS, not a secure release: K is derived by
    * inverse-CDF over a uniform built from `md5(groupKey|salt)` — a pure
    * function of the group, so the DuckDB oracle replays the release
    * bit-for-bit and re-runs never drift. Real DP requires fresh secret
    * randomness AND a privacy budget accountant; swap the md5 uniform
    * for a secure RNG draw per release to productionize — the mechanism
    * arithmetic (which is what's oracle-gated here) is unchanged.
    *
    * Scale shape: one map-side-combined count aggregate; the noise is a
    * projection over the (tiny) group frame. */
  def noisyCounts(df: DataFrame, groupCols: Seq[String],
      salt: String = "dp", bound: Int = 16): DataFrame = {
    require(groupCols.nonEmpty)
    val grouped = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    // 60-bit md5 prefix → exact dyadic uniform in [0,1)
    val u = conv(substring(md5(concat_ws("|",
        groupCols.map(c => col(c).cast("string")) :+ lit(salt): _*)),
        1, 15), 16, 10)
      .cast("long").cast("double") / lit(math.pow(2, 60))
    val ks = (-bound until bound)
    val noise = dpThresholds(bound).zip(ks).foldLeft(Option.empty[Column]) {
      case (acc, (t, k)) =>
        Some(acc.fold(when(u < t, k.toLong))(_.when(u < t, k.toLong)))
    }.get.otherwise(bound.toLong)
    grouped.select(groupCols.map(col) :+
      greatest(col("__n") + noise, lit(0L)).as("noisy_count"): _*)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality auditing: named violation queries evaluated in
  * one pass, returning a compact (rule, n_violations) report — the
  * constraint layer (PK uniqueness, FK integrity, domain rules) that the
  * reference's silent-skip ingest policy (SURVEY.md §2.1 S1,
  * `StageData.usql:21` malformed-doc drop) pushes downstream without ever
  * materializing.
  *
  * Each check is an arbitrary DataFrame of violating rows, so any rule
  * expressible as a query is auditable; the report unions the per-check
  * COUNTS (each a 1-row aggregate — the union is metadata-sized no matter
  * how large the violation sets are). Catalyst evaluates the checks
  * independently: filters/anti-joins push into each scan as usual.
  */
object Quality {

  /** (rule name, violating-row query) pairs → (rule, n_violations), one
    * row per rule, in the given order (deterministic output). */
  def audit(checks: Seq[(String, DataFrame)]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    checks.map { case (name, df) =>
      df.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("rule"), col("n_violations"))
    }.reduce(_ unionByName _)
  }

  /** Child rows whose `fk` has no matching `pk` parent — referential
    * integrity as an anti-join (null FKs are not violations, matching SQL
    * FK semantics). */
  def orphans(child: DataFrame, parent: DataFrame,
      fk: String, pk: String): DataFrame =
    child.where(col(fk).isNotNull)
      .join(parent.select(col(pk)), col(fk) === col(pk), "left_anti")

  /** Keys appearing more than once — primary-key uniqueness violations,
    * one row per duplicated key with its multiplicity. */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .where(col("n_rows") > 1)

  /** Order-independent table checksum for cross-engine/cross-copy
    * reconciliation: did the rows survive a migration bit-for-bit,
    * without sorting or shipping either side?
    *
    * Each row is rendered to a canonical `|`-joined string (the CALLER
    * pre-normalizes floats/dates to canonical columns — rendering rules
    * are engine-specific, canonical strings are not), md5-hashed to 60
    * bits, and folded two ways: XOR (order-independent, overflow-free)
    * and a modular SUM (catches the duplicated+dropped row pair that XOR
    * cancels; modulus 2^20·prime keeps ANSI-mode sums overflow-safe past
    * 10^12 rows). Equal (n_rows, xor_sig, sum_sig) across two engines is
    * a practically-certain row-multiset match.
    *
    * One narrow scan, one 3-long aggregate — nothing shuffles but the
    * partial aggregates.
    */
  /** Inclusion-dependency profile — "is A ⊆ B" for candidate FK→PK column
    * pairs, the schema-discovery primitive run before trusting an
    * undocumented foreign key. Per pair: distinct FK values, how many
    * have no PK match, and the inclusion coefficient |A∩B|/|A| (1.0 =
    * the dependency holds). Each pair is one distinct-project + one
    * left-anti join on a single column — both sides shrink to their
    * distinct value sets before the join, so the check costs value-set
    * cardinality, not table size. */
  def inclusionProfile(pairs: Seq[(String, DataFrame, String, DataFrame,
      String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one candidate pair")
    pairs.map { case (name, fkDf, fkCol, pkDf, pkCol) =>
      val fk = fkDf.select(col(fkCol).as("__v"))
        .where(col("__v").isNotNull).distinct()
      val pk = pkDf.select(col(pkCol).as("__v")).distinct()
      val unmatched = fk.join(pk, Seq("__v"), "left_anti")
        .agg(count(lit(1)).as("n_unmatched"))
      fk.agg(count(lit(1)).as("n_distinct_fk"))
        .crossJoin(unmatched)
        .select(lit(name).as("candidate"), col("n_distinct_fk"),
          col("n_unmatched"),
          round((col("n_distinct_fk") - col("n_unmatched")).cast("double")
            / col("n_distinct_fk").cast("double"), 6).as("inclusion"))
    }.reduce(_ unionByName _)
  }

  /** Functional-dependency check — "does X determine Y": per candidate,
    * the number of X-groups carrying MORE than one distinct Y (0 = the
    * FD holds) and the violating-row total. One two-level aggregate per
    * candidate: (X, Y) distinct grain first — single-column exact
    * distinct, no Expand — then group sizes per X. */
  def fdViolations(candidates: Seq[(String, DataFrame, Seq[String],
      String)]): DataFrame = {
    require(candidates.nonEmpty, "need at least one FD candidate")
    candidates.map { case (name, df, xCols, yCol) =>
      df.groupBy(xCols.map(col): _*)
        .agg(countDistinct(col(yCol)).as("__ny"), count(lit(1)).as("__n"))
        .agg(
          sum(when(col("__ny") > 1, 1L).otherwise(0L))
            .as("violating_groups"),
          sum(when(col("__ny") > 1, col("__n")).otherwise(0L))
            .as("violating_rows"))
        .select(lit(name).as("candidate"), col("violating_groups"),
          col("violating_rows"))
    }.reduce(_ unionByName _)
  }

  /** Replica-divergence localization, Merkle style: find the rows where
    * two copies of a table disagree WITHOUT joining every row. Stage 1
    * buckets each side by key hash and compares per-bucket signatures
    * ([[tableChecksum]]'s (count, XOR, mod-sum) triple — one tiny
    * aggregate per side); stage 2 re-reads ONLY the divergent buckets
    * and full-outer joins them on the key, classifying each difference
    * as `only_a` / `only_b` / `differs`.
    *
    * At 100 TB with healthy replicas (the common case: divergence is a
    * few buckets after a partial write), stage 2 touches buckets/total
    * of the data; identical replicas cost two scans and NO join at all.
    * Persist the bucket id as a partition column on both replicas and
    * stage 2 prunes at metadata time instead of filter time.
    *
    * Contracts: `keyCols` must identify rows uniquely on each side
    * (duplicate keys multi-match in stage 2); signature equality is
    * probabilistic (60-bit hashes; the XOR blind spot is covered by the
    * mod-sum — see [[tableChecksum]]'s spec) — treat a clean report as
    * reconciliation, run the direct diff for forensics. */
  def bucketDiff(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      cols: Seq[String], buckets: Int): DataFrame = {
    require(keyCols.nonEmpty && cols.nonEmpty && buckets >= 1)
    def prep(df: DataFrame): DataFrame = {
      val key = concat_ws("|", keyCols.map(c => col(c).cast("string")): _*)
      val row = concat_ws("|", cols.map(c => col(c).cast("string")): _*)
      df.select((keyCols.map(col) :+
        pmod(TextDedup.hash60(key), lit(buckets.toLong)).as("__bkt") :+
        TextDedup.hash60(row).as("__rh")): _*)
    }
    val (pa, pb) = (prep(a), prep(b))
    def sigs(df: DataFrame) = df.groupBy(col("__bkt"))
      .agg(count(lit(1)).as("__n"), bit_xor(col("__rh")).as("__x"),
        sum(pmod(col("__rh"), lit(1048573L))).as("__s"))
    val divergent = sigs(pa).withColumnRenamed("__n", "__na")
      .withColumnRenamed("__x", "__xa").withColumnRenamed("__s", "__sa")
      .join(sigs(pb), Seq("__bkt"), "full_outer")
      .where(coalesce(col("__na"), lit(-1L)) =!= coalesce(col("__n"), lit(-1L)) ||
        coalesce(col("__xa"), lit(0L)) =!= coalesce(col("__x"), lit(0L)) ||
        coalesce(col("__sa"), lit(0L)) =!= coalesce(col("__s"), lit(0L)))
      .select(col("__bkt"))
    val ra = pa.join(broadcast(divergent), Seq("__bkt"), "left_semi")
    val rb = pb.join(broadcast(divergent), Seq("__bkt"), "left_semi")
      .withColumnRenamed("__rh", "__rhb")
    ra.withColumnRenamed("__rh", "__rha")
      .join(rb.drop("__bkt"), keyCols, "full_outer")
      .where(col("__rha").isNull || col("__rhb").isNull ||
        col("__rha") =!= col("__rhb"))
      .select(keyCols.map(col) :+
        when(col("__rhb").isNull, "only_a")
          .when(col("__rha").isNull, "only_b")
          .otherwise("differs").as("status"): _*)
  }

  def tableChecksum(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "checksum needs at least one column")
    val rowStr = concat_ws("|", cols.map(c => col(c).cast("string")): _*)
    val h = TextDedup.hash60(rowStr)
    df.agg(count(lit(1)).as("n_rows"),
      bit_xor(h).as("xor_sig"),
      sum(pmod(h, lit(1048573L))).as("sum_sig"))
  }
}

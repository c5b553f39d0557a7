package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PII governance: deterministic linkability, domain/network
  * preservation, salt rotation, and the Specs-driven table mask.
  */
class GovernanceSpec extends SparkSpec {
  import spark.implicits._

  test("pseudonym is deterministic, salt rotation severs linkage") {
    val df = Seq("alice", "alice", "bob").toDF("v")
    val out = df.select(
      Governance.pseudonym(col("v"), "e1").as("a"),
      Governance.pseudonym(col("v"), "e1").as("b"),
      Governance.pseudonym(col("v"), "e2").as("c")).collect()
    assert(out(0).getString(0) == out(1).getString(0), "same input same token")
    assert(out(0).getString(0) == out(0).getString(1), "deterministic")
    assert(out(0).getString(0) != out(0).getString(2), "salt rotates linkage")
    assert(out(0).getString(0) != out(2).getString(0), "distinct inputs differ")
    assert(out(0).getString(0).matches("[0-9a-f]{16}"))
  }

  test("maskEmail keeps the domain, maskIp keeps the /24") {
    val r = Seq(("a.user@corp.example", "192.168.1.77"))
      .toDF("email", "ip")
      .select(Governance.maskEmail(col("email")).as("e"),
        Governance.maskIp(col("ip")).as("i")).head()
    assert(r.getString(0).endsWith("@corp.example") &&
      !r.getString(0).contains("a.user"))
    assert(r.getString(1) == "192.168.1.x")
  }

  test("maskColumns: Specs pii flags drive the mask, others untouched") {
    val piiCols = graft.entities.Specs.commit.fields.filter(_.pii).map(_.name)
    assert(piiCols.nonEmpty, "Commit spec must flag pii columns")
    val df = Seq((1L, "dev@x.example", "Dev Name"))
      .toDF("id", piiCols.head, "other")
    val masked = Governance.maskColumns(df, Seq(piiCols.head))
    val r = masked.head()
    assert(r.getLong(0) == 1L && r.getString(2) == "Dev Name")
    assert(r.getString(1).endsWith("@x.example") &&
      !r.getString(1).startsWith("dev@"))
    // nulls stay null (absent fields in the reference model)
    val withNull = Seq((2L, null.asInstanceOf[String], "n"))
      .toDF("id", piiCols.head, "other")
    assert(Governance.maskColumns(withNull, Seq(piiCols.head))
      .head().isNullAt(1))
    // unknown column is an error, not a silent no-op
    intercept[IllegalArgumentException] {
      Governance.maskColumns(df, Seq("nope"))
    }
  }

  test("non-email PII containing '@' masks WHOLE — no cleartext tail leak") {
    // the earlier contains('@') shape test published everything after
    // the last '@' verbatim for free-text PII like handles or hostnames
    val df = Seq((1L, "DM me @john.doe"), (2L, "x@internal-hostname"),
      (3L, "a@b@c.example")).toDF("id", "v")
    val masked = Governance.maskColumns(df, Seq("v")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!masked(1L).contains("john"), s"handle leaked: ${masked(1L)}")
    assert(!masked(2L).contains("internal"), s"host leaked: ${masked(2L)}")
    assert(!masked(3L).contains("c.example") || masked(3L).length == 16,
      s"multi-@ leaked: ${masked(3L)}")
    // a well-formed email still keeps its domain
    val email = Governance.maskColumns(
      Seq((4L, "dev@x.example")).toDF("id", "v"), Seq("v")).head().getString(1)
    assert(email.endsWith("@x.example") && !email.startsWith("dev@"))
  }

  test("kAnonymityAudit flags small cohorts and single-valued sensitives") {
    import spark.implicits._
    val rows = Seq(
      // cohort (US, A): 3 members, 3 distinct balances — clean at k=3
      ("US", "A", 10.0), ("US", "A", 20.0), ("US", "A", 30.0),
      // cohort (US, B): 2 members → k-violation; balances equal → l too
      ("US", "B", 5.0), ("US", "B", 5.0),
      // cohort (DE, A): 3 members but one distinct balance → l-violation
      ("DE", "A", 7.0), ("DE", "A", 7.0), ("DE", "A", 7.0)
    ).toDF("nation", "segment", "balance")
    val audit = Governance
      .kAnonymityAudit(rows, Seq("nation", "segment"), "balance", k = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))))
      .toMap
    assert(audit(("US", "A")) == ((3L, 3L, false, false)))
    assert(audit(("US", "B")) == ((2L, 1L, true, true)))
    assert(audit(("DE", "A")) == ((3L, 1L, false, true)))
  }

  test("dpThresholds: monotone CDF, symmetric mass, covers ≈1 with endpoint tails") {
    val t = Governance.dpThresholds(16)
    assert(t.size == 32)
    assert(t == t.sorted, "CDF must be monotone")
    // mass below 0's threshold is (1-P(K>=0)-tail) ≈ 1/3; center ≈ 2/3
    assert(math.abs(t(15) - 1.0 / 3.0) < 1e-4)  // P(K <= -1), k index -16+15
    assert(math.abs(t(16) - 2.0 / 3.0) < 1e-4)  // P(K <= 0)
    assert(t.last < 1.0 && t.last > 0.9999)
    // symmetric tail fold: P(K=-16) = first CDF step = 1 - last threshold
    // = P(K=+16) = (2/3)*2^-16
    val endpoint = 2.0 / 3.0 * math.pow(0.5, 16)
    assert(math.abs(t.head - endpoint) < 1e-12, "negative tail not folded")
    assert(math.abs((1.0 - t.last) - endpoint) < 1e-12, "positive tail fold drifted")
  }

  test("noisyCounts: bounded perturbation, zero clamp, partition/salt behavior") {
    import spark.implicits._
    val rows = (1 to 40).flatMap(g => (1 to 10).map(i => (s"g$g", i)))
      .toDF("grp", "v")
    def release(df: org.apache.spark.sql.DataFrame, salt: String) =
      Governance.noisyCounts(df, Seq("grp"), salt = salt)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = release(rows, "dp")
    assert(out.size == 40)
    // every noisy count within ±16 of the true count 10, clamped ≥ 0
    assert(out.values.forall(n => n >= 0 && (n - 10).abs <= 16))
    // most groups perturbed little: |noise| ≤ 2 has mass ~0.834
    assert(out.values.count(n => (n - 10).abs <= 2) >= 20)
    // deterministic: identical under repartition; different under new salt
    assert(release(rows.repartition(7), "dp") == out)
    assert(release(rows, "dp2") != out)
    // zero clamp: true count 1 with worst-case negative noise floors at 0
    val tiny = Seq(("only", 1)).toDF("grp", "v")
    assert(release(tiny, "dp")("only") >= 0)
  }
}

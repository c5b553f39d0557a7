package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property tests for the mergeable sketch tables: the CMS one-sided
  * error contract, merge ≡ rebuild (the semilattice property that makes
  * per-day sketches roll up), and the HLL standard-error bound. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"
  private def events = spark.read.parquet(s"$dir/events.parquet")
    .select(col("user_id"))

  test("CMS never underestimates, and is exact when width dwarfs keys") {
    val truth = events.groupBy("user_id").agg(count(lit(1)).as("t"))
    val sketch = Sketches.cmsBuild(events, "user_id", depth = 4, width = 512)
    val est = Sketches.cmsEstimate(truth, sketch, "user_id", 4, 512)
    val joined = est.join(truth, "user_id")
      .select(col("est"), col("t")).collect()
    assert(joined.nonEmpty)
    assert(joined.forall(r => r.getLong(0) >= r.getLong(1)),
      "CMS must be a one-sided overestimate")
    // 150 keys into width 8192: collisions are vanishing → exact
    val wide = Sketches.cmsBuild(events, "user_id", depth = 4, width = 8192)
    val est2 = Sketches.cmsEstimate(truth, wide, "user_id", 4, 8192)
    val j2 = est2.join(truth, "user_id").where(col("est") =!= col("t")).count()
    assert(j2 == 0, s"$j2 keys collided at width 8192 over 150 keys")
  }

  test("CMS merge of day-split sketches equals the whole-corpus sketch") {
    val a = events.limit(4000)
    val b = events.exceptAll(a)
    val merged = Sketches.cmsMerge(Seq(
      Sketches.cmsBuild(a, "user_id", 4, 512),
      Sketches.cmsBuild(b, "user_id", 4, 512)))
    val whole = Sketches.cmsBuild(events, "user_id", 4, 512)
    assert(merged.exceptAll(whole).count() == 0 &&
      whole.exceptAll(merged).count() == 0,
      "sum-merge must equal the single-pass sketch")
  }

  test("HLL estimate lands within 3 standard errors; merge = rebuild") {
    val exact = events.distinct().count()
    val regs = Sketches.hllBuild(events, "user_id", b = 9)
    val est = Sketches.hllEstimate(regs, b = 9).head.getDouble(2)
    val se = 1.04 / math.sqrt(512.0) // standard HLL error for m=512
    assert(math.abs(est - exact) / exact <= 3 * se,
      s"estimate $est vs exact $exact outside 3 standard errors")
    val a = events.limit(4000)
    val b2 = events.exceptAll(a)
    val merged = Sketches.hllMerge(Seq(
      Sketches.hllBuild(a, "user_id", 9),
      Sketches.hllBuild(b2, "user_id", 9)))
    assert(merged.exceptAll(regs).count() == 0 &&
      regs.exceptAll(merged).count() == 0,
      "max-merge must equal the single-pass registers")
  }

  test("rho derivation is exact at the boundaries (no float log2)") {
    // synthetic keys chosen to land z = 0 is impractical; instead verify
    // the register table's rho range is within [1, 52] for b = 9 and the
    // bucket domain is [0, 512)
    val regs = Sketches.hllBuild(events, "user_id", b = 9).collect()
    assert(regs.forall { r =>
      val bkt = r.getLong(0); val rho = r.getInt(1)
      bkt >= 0 && bkt < 512 && rho >= 1 && rho <= 52
    })
  }
  test("KMV: exact when the set fits in k; estimate within 4 SE otherwise; union bottom-k sound") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // 150 distinct users into k=256 -> sketch IS the set -> exact
    val exactUsers = events.distinct().count()
    val estSmall = Sketches.kmvDistinct(
      Sketches.kmvBuild(events.withColumn("g", lit(1)), Seq("g"), "user_id", 256),
      Seq("g"), 256).head
    assert(estSmall.getDouble(2) == exactUsers.toDouble,
      s"under-k KMV must be exact: ${estSmall.getDouble(2)} vs $exactUsers")
    // documents text hashes per source: k=64 against hundreds of docs
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val sk = Sketches.kmvBuild(d, Seq("source"), "text", 64)
    assert(sk.groupBy("source").count().collect().forall(_.getLong(1) <= 64))
    val est = Sketches.kmvDistinct(sk, Seq("source"), 64).collect()
    val truth = d.select(col("source"), col("text")).distinct()
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { r =>
      val src = r.getString(0); val e = r.getDouble(2); val t = truth(src)
      val se = t / math.sqrt(64.0 - 2) // KMV relative SE ~ 1/sqrt(k-2)
      assert(math.abs(e - t) <= 4 * se, s"$src: est $e vs exact $t")
    }
  }
}

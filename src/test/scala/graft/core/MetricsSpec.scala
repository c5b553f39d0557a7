package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {

  test("observed metrics ride the write action — no separate audit scan") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val (instrumented, obs) = Metrics.observed(docs, "ingest_audit",
      "n_rows" -> count(lit(1)),
      "n_null_text" -> sum(when(col("text").isNull, 1L).otherwise(0L)),
      "chars" -> sum(length(col("text")).cast("long")))
    val out = scratch("obs") + "/docs"
    instrumented.write.mode("overwrite").parquet(out) // the ONE action
    val m = obs.get
    assert(m("n_rows") == docs.count())
    assert(m("n_null_text") == 0L)
    assert(m("chars") ==
      docs.agg(sum(length(col("text")).cast("long"))).head().getLong(0))
    // and the written data is complete — audit numbers describe the write
    assert(spark.read.parquet(out).count() == m("n_rows"))
  }

  test("observation on a filtered frame audits exactly what passed the gate") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val gated = docs.where(col("n_chars") >= 200)
    val (instrumented, obs) = Metrics.observed(gated, "gate_audit",
      "kept" -> count(lit(1)))
    assert(instrumented.count() == obs.get("kept"))
    assert(obs.get("kept") == docs.where(col("n_chars") >= 200).count())
  }
}

package graft.streaming

import graft.SparkSpec
import graft.entities.Specs
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class StreamsSpec extends SparkSpec {

  private def writeDoc(dir: String, file: String, docs: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, file), docs.mkString("\n").getBytes)
  }

  private def doc(urn: String, processedAt: String, sha: String): String =
    s"""{"_metadata":{"type":"commit","processedAt":"$processedAt",""" +
      s""""links":{"self":{"href":"$urn"},"repo":{"href":"urn:repo:1"}}},""" +
      s""""sha":"$sha","url":"u"}"""

  test("incrementalSnapshot merges a file stream through the batch executor") {
    val raw = scratch("stream-raw")
    val curated = scratch("stream-cur")
    val ckpt = scratch("stream-ckpt")

    writeDoc(raw, "a.json", Seq(
      doc("urn:c:1", "2024-01-01T10:00:00Z", "v1"),
      doc("urn:c:2", "2024-01-01T10:00:00Z", "x1")))
    val q1 = Streams.incrementalSnapshot(spark, raw, curated, Specs.commit, ckpt)
    q1.awaitTermination()

    // second batch: newer version of urn:c:1
    writeDoc(raw, "b.json", Seq(doc("urn:c:1", "2024-01-02T10:00:00Z", "v2")))
    val q2 = Streams.incrementalSnapshot(spark, raw, curated, Specs.commit, ckpt)
    q2.awaitTermination()

    val result = spark.read.parquet(s"$curated/commit")
      .select("etl_source_id", "sha").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(result == Map("urn:c:1" -> "v2", "urn:c:2" -> "x1"))
  }

  test("windowedCounts: watermarked sliding windows over a memory-like batch") {
    // validate the aggregation plan on a batch frame (same expressions)
    import spark.implicits._
    val events = Seq(
      ("2024-01-01 00:00:10", "a"), ("2024-01-01 00:00:50", "a"),
      ("2024-01-01 00:01:10", "b")
    ).toDF("ts", "k").withColumn("ts", col("ts").cast("timestamp"))
    val out = Streams.windowedCounts(events, "ts", "k", "1 minute", "1 minute", "10 seconds")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(2), r.getLong(3)))
    assert(out.toSet == Set(
      ("2024-01-01 00:00:00.0", "a", 2L),
      ("2024-01-01 00:01:00.0", "b", 1L)))
  }

  test("windowedCounts on a real stream: windows emit on watermark passage") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val q = Streams.windowedCounts(
        input.toDS().toDF("ts", "k"), "ts", "k", "1 minute", "1 minute", "10 seconds")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData((ts("2024-01-01 00:00:10"), "a"), (ts("2024-01-01 00:00:50"), "a"))
    q.processAllAvailable()
    // window [00:00,00:01) is still open — nothing emitted yet
    assert(spark.table("win_out").count() == 0)
    // event at 00:02:00 advances the watermark past 00:01 → first window closes
    input.addData((ts("2024-01-01 00:02:00"), "b"))
    q.processAllAvailable()
    input.addData((ts("2024-01-01 00:05:00"), "b")) // push watermark further
    q.processAllAvailable()
    val rows = spark.table("win_out").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(2), r.getLong(3)))
    q.stop()
    assert(rows.contains(("2024-01-01 00:00:00.0", "a", 2L)))
  }

  test("sessionWindows: gap merge/split semantics and watermark emission") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val q = Streams.sessionWindows(
        input.toDS().toDF("ts", "k"), "ts", "k", gap = "1 minute",
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // two events 30s apart merge; an event landing EXACTLY on the session
    // end (60s after the previous) still merges — only a strictly larger
    // gap splits; the fourth event at +61s starts a new session
    input.addData((ts("2024-01-01 00:00:00"), "a"),
      (ts("2024-01-01 00:00:30"), "a"), (ts("2024-01-01 00:01:30"), "a"),
      (ts("2024-01-01 00:02:31"), "a"))
    q.processAllAvailable()
    // advance the watermark far past both session ends
    input.addData((ts("2024-01-01 01:00:00"), "b"))
    q.processAllAvailable()
    input.addData((ts("2024-01-01 02:00:00"), "b"))
    q.processAllAvailable()
    val rows = spark.table("sess_out").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3))).toSet
    q.stop()
    assert(rows.contains(("a", "2024-01-01 00:00:00.0", "2024-01-01 00:02:30.0", 3L)),
      s"first session wrong: $rows")
    assert(rows.contains(("a", "2024-01-01 00:02:31.0", "2024-01-01 00:03:31.0", 1L)),
      s"second session wrong: $rows")
  }

  test("latestPerKeyStream state logic emits only newer versions") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.VersionedDoc]
    val q = Streams.latestPerKeyStream(input.toDS())
      .writeStream.format("memory").queryName("latest_out")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData(
      Streams.VersionedDoc("k1", ts("2024-01-01 00:00:00"), "p1"),
      Streams.VersionedDoc("k1", ts("2024-01-03 00:00:00"), "p3"))
    q.processAllAvailable()
    input.addData(
      Streams.VersionedDoc("k1", ts("2024-01-02 00:00:00"), "p2")) // stale
    q.processAllAvailable()
    val out = spark.table("latest_out").as[Streams.VersionedDoc].collect()
    q.stop()
    // first batch emits the max (p3); the stale p2 must NOT re-emit
    assert(out.map(_.payload).toSeq == Seq("p3"))
  }
}

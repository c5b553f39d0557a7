package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The V2 FlatJson connector: reference key syntax, silent-skip,
  * projection-independent row semantics, and the two pushdowns (column
  * pruning, file-list pruning).
  */
class FlatJsonSourceSpec extends SparkSpec {

  private lazy val dir = {
    val d = scratch("flatjson")
    Files.write(Paths.get(d, "commits_0.json"), java.util.Arrays.asList(
      """{"sha":"abc","author":{"id":7,"login":"x"},"files":[{"filename":"a.txt"},{"filename":"b.txt"}],"_metadata":{"links":{"self":{"href":"urn:1"}}}}""",
      """not valid json {{{""",
      "",
      """{"sha":"def","stats":{"total":3},"flag":true,"pi":1.5,"gone":null}"""))
    Files.write(Paths.get(d, "repos_0.json"), java.util.Arrays.asList(
      """{"id":42,"name":"r"}"""))
    d
  }

  private def read() = spark.read.format("flatjson").load(s"$dir/*.json")

  test("flattens with the reference key syntax; malformed/blank skipped") {
    val rows = read().orderBy("file_name", "line_no").collect()
    // 2 valid lines in commits_0 (line 2 malformed, line 3 blank) + 1 repo
    assert(rows.length == 3)
    val m1 = rows(0).getMap[String, String](2)
    assert(m1("sha") == "abc" && m1("author.id") == "7" &&
      m1("author.login") == "x" &&
      m1("files[0].filename") == "a.txt" && m1("files[1].filename") == "b.txt" &&
      m1("_metadata.links.self.href") == "urn:1")
    val m2 = rows(1).getMap[String, String](2)
    // scalars keep their JSON text; null leaves are absent keys
    assert(m2("stats.total") == "3" && m2("flag") == "true" &&
      m2("pi") == "1.5" && !m2.contains("gone"))
    assert(rows(1).getLong(1) == 4L) // line_no counts physical lines
    assert(rows(2).getString(0) == "repos_0")
  }

  test("row set is projection-independent (silent-skip is table semantics)") {
    assert(read().select("file_name").count() == read().count())
  }

  test("column pruning reaches the scan; file_name filter prunes the file list") {
    val pruned = read().select("file_name", "line_no")
    val scanDesc = pruned.queryExecution.executedPlan.toString
    assert(scanDesc.contains("cols=[file_name,line_no]"),
      s"required columns not pushed into the scan:\n$scanDesc")

    val filtered = read().where(col("file_name") === "repos_0")
    assert(filtered.count() == 1)
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("files=[repos_0]"),
      s"file_name equality did not prune the file list:\n$p")
  }

  test("streaming: micro-batches process each file exactly once across restarts") {
    import org.apache.spark.sql.streaming.Trigger
    val src = scratch("fj-stream-src")
    val out = scratch("fj-stream-out")
    val ckpt = scratch("fj-stream-ckpt")
    def drop(name: String, mtime: Long, lines: String*): Unit = {
      val p = Paths.get(src, name)
      Files.write(p, java.util.Arrays.asList(lines: _*))
      p.toFile.setLastModified(mtime)
    }
    def runOnce(): Long = {
      val q = spark.readStream.format("flatjson").load(s"$src/*.json")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(out).count()
    }
    val t0 = System.currentTimeMillis() - 60000
    drop("day1_a.json", t0, """{"x":1}""", """{"x":2}""")
    assert(runOnce() == 2)
    // a later drop — later mtime per the offset contract
    drop("day2_b.json", t0 + 30000, """{"y":3}""")
    assert(runOnce() == 3, "restart must process ONLY the new file (no dups)")
    val byFile = spark.read.parquet(out).groupBy("file_name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byFile == Map("day1_a" -> 2L, "day2_b" -> 1L))
  }

  test("agrees with the staging fidelity flattener (same Docs.flatten)") {
    import spark.implicits._
    val viaUdf = spark.read.textFile(s"$dir/commits_0.json")
      .toDF("raw").select(graft.json.Docs.flattenUdf(col("raw")).as("m"))
      .where(col("m").isNotNull).as[Map[String, String]].collect().toSet
    val viaSource = read().where(col("file_name") === "commits_0")
      .select("data").as[Map[String, String]].collect().toSet
    assert(viaSource == viaUdf)
  }
}

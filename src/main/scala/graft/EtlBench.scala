package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** End-to-end ETL throughput: synthetic ghcrawler-shaped JSON → staging →
  * full ProcessDaily merge across all 32 curated tables, two consecutive
  * days (day 2 exercises the merge-with-prior-snapshot path). Prints one
  * JSON line; recorded in BASELINE.md.
  *
  * Deterministic corpus (no RNG): doc i of day d is fully determined by
  * (d, i), so runs are comparable.
  */
object EtlBench {

  private def doc(day: String, i: Int): String = {
    val ts = s"${day}T${"%02d".format(i % 24)}:00:00Z"
    def meta(tpe: String, urn: String, extra: String = "") =
      s""""_metadata":{"type":"$tpe","processedAt":"$ts","fetchedAt":"$ts",""" +
        s""""version":7,"links":{"self":{"href":"$urn"},"repo":{"href":"urn:repo:${i % 500}"}$extra}}"""
    i % 10 match {
      case 0 | 1 | 2 | 3 => // commit with files[] + parents[]
        s"""{${meta("commit", s"urn:commit:${i % 4000}")},"sha":"s$i","comment_count":${i % 9},""" +
          s""""author":{"id":${i % 1000},"login":"u${i % 1000}","site_admin":false,"type":"User"},""" +
          s""""commit":{"author":{"date":"$ts","email":"u$i@x.com","name":"U $i"},"message":"m$i","tree":{"sha":"t$i"}},""" +
          s""""stats":{"additions":$i,"deletions":${i / 2},"total":${i + i / 2}},""" +
          s""""files":[{"sha":"f$i-0","filename":"a/$i.scala","status":"modified","additions":1,"deletions":2,"changes":3},""" +
          s"""{"sha":"f$i-1","filename":"b/$i.md","status":"added","additions":4,"deletions":0,"changes":4}],""" +
          s""""parents":[{"sha":"p$i","url":"h"}]}"""
      case 4 | 5 => // issue with labels[]
        s"""{${meta("issue", s"urn:issue:${i % 2000}")},"id":$i,"number":${i % 500},"state":"open",""" +
          s""""title":"t$i","body":"b$i","comments":${i % 7},"locked":false,""" +
          s""""user":{"id":${i % 1000},"login":"u${i % 1000}"},""" +
          s""""created_at":"$ts","updated_at":"$ts",""" +
          s""""labels":[{"id":1,"name":"bug","color":"red"},{"id":2,"name":"p${i % 3}","color":"blue"}]}"""
      case 6 | 7 => // PushEvent with payload.commits[]
        s"""{${meta("PushEvent", s"urn:event:${i % 3000}")},"id":$i,"type":"PushEvent","public":true,""" +
          s""""created_at":"$ts","actor":{"id":${i % 1000},"login":"u${i % 1000}"},""" +
          s""""repo":{"id":${i % 500},"name":"o/r${i % 500}"},""" +
          s""""payload":{"push_id":$i,"size":2,"ref":"refs/heads/main",""" +
          s""""commits":[{"sha":"c$i","author":{"email":"e@x.com","name":"N"},"distinct":true,"message":"m"}]}}"""
      case 8 => // repo
        s"""{${meta("repo", s"urn:repo:${i % 500}")},"id":${i % 500},"name":"r${i % 500}","full_name":"o/r${i % 500}",""" +
          s""""owner":{"id":1,"login":"o"},"private":false,"fork":false,"language":"Scala",""" +
          s""""forks_count":${i % 50},"stargazers_count":${i % 100},"watchers_count":${i % 100},""" +
          s""""size":$i,"open_issues_count":${i % 20},"has_issues":true,""" +
          s""""created_at":"2020-01-01T00:00:00Z","updated_at":"$ts","pushed_at":"$ts"}"""
      case _ => // user
        s"""{${meta("user", s"urn:user:${i % 1000}")},"id":${i % 1000},"login":"u${i % 1000}",""" +
          s""""type":"User","site_admin":false,"public_repos":${i % 40},"followers":${i % 300},""" +
          s""""created_at":"2019-01-01T00:00:00Z","updated_at":"$ts"}"""
    }
  }

  def writeDay(rawRoot: String, date: java.time.LocalDate, docs: Int, files: Int): Unit = {
    val dir = Paths.get(f"$rawRoot/${date.getYear}%04d/${date.getMonthValue}%02d/${date.getDayOfMonth}%02d")
    Files.createDirectories(dir)
    val perFile = docs / files
    for (f <- 0 until files) {
      val sb = new StringBuilder(perFile * 400)
      for (j <- 0 until perFile) {
        sb.append(doc(date.toString, f * perFile + j)).append('\n')
      }
      Files.writeString(dir.resolve(s"part$f.json"), sb.toString)
    }
  }

  def main(args: Array[String]): Unit = {
    val docsPerDay = sys.env.getOrElse("GRAFT_ETL_DOCS", "40000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = Files.createTempDirectory(Paths.get("/tmp"), "graft-etl").toString
    val (raw, staging, curated) = (s"$root/raw", s"$root/staging", s"$root/curated")
    val d1 = java.time.LocalDate.parse("2024-01-01")
    val d2 = java.time.LocalDate.parse("2024-01-02")
    writeDay(raw, d1, docsPerDay, 16)
    writeDay(raw, d2, docsPerDay, 16)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val tStage1 = timed(graft.ingest.Staging.stageDay(spark, raw, staging, d1))
    val tProc1 = timed(graft.jobs.ProcessDaily.run(spark, staging, curated, d1.toString))
    val tStage2 = timed(graft.ingest.Staging.stageDay(spark, raw, staging, d2))
    val tProc2 = timed(graft.jobs.ProcessDaily.run(spark, staging, curated, d2.toString))
    // merge-on-read daily cost over the same staged days: the append-only
    // path whose advantage GROWS with table size (here tables are small,
    // so this is the floor of the win, not its ceiling)
    val tMor1 = timed(graft.jobs.ProcessDaily.runMor(spark, staging, s"$root/mor", d1.toString))
    val tMor2 = timed(graft.jobs.ProcessDaily.runMor(spark, staging, s"$root/mor", d2.toString))
    // the third leg of the merge-on-read story: one compaction amortizes
    // the full rewrite over however many O(delta) days accumulated
    val tCompact = timed(
      graft.entities.Specs.snapshots.foreach(s =>
        graft.ops.MergeOnRead.compact(spark, s"$root/mor", s.table,
          Seq("etl_source_id"), graft.entities.Pipelines.mergeOrder)))
    val total = tStage1 + tProc1 + tStage2 + tProc2
    val nTables = spark.read.parquet(s"$curated/commit").count() +
      spark.read.parquet(s"$curated/event").count()
    println(f"""{"metric":"etl_docs_per_sec","value":${2.0 * docsPerDay / total}%.0f,""" +
      f""""docs":${2 * docsPerDay},"total_sec":$total%.2f,""" +
      f""""stage_day1":$tStage1%.2f,"process_day1":$tProc1%.2f,""" +
      f""""stage_day2":$tStage2%.2f,"process_day2":$tProc2%.2f,""" +
      f""""mor_day1":$tMor1%.2f,"mor_day2":$tMor2%.2f,""" +
      f""""mor_compact_snapshots":$tCompact%.2f,"sanity_rows":$nTables}""")
    spark.stop()
  }
}

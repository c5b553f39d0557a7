package graft.entities

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Synthetic ghcrawler-shaped JSON fixtures (FIXTURES.md §A) written to a
  * scratch raw-layout `v1/yyyy/MM/dd/docs.json`, one document per line. */
object Fixtures {

  def meta(tpe: String, urn: String, processedAt: String,
      deletedAt: Option[String] = None, links: Map[String, String] = Map.empty,
      resources: Seq[String] = Nil): String = {
    val linkEntries =
      (Map("self" -> urn) ++ links).map { case (k, v) => s""""$k":{"href":"$v"}""" } ++
        (if (resources.nonEmpty)
           Seq(s""""resources":{"hrefs":[${resources.map(r => s""""$r"""").mkString(",")}]}""")
         else Nil)
    val del = deletedAt.map(d => s""""$d"""").getOrElse("null")
    s""""_metadata":{"type":"$tpe","fetchedAt":"$processedAt","processedAt":"$processedAt","deletedAt":$del,"version":7,"links":{${linkEntries.mkString(",")}}}"""
  }

  def commitDoc(urn: String, sha: String, message: String, processedAt: String,
      files: Seq[(String, Int)], parents: Seq[String],
      deletedAt: Option[String] = None): String = {
    val fileJson = files.map { case (f, add) =>
      s"""{"sha":"f-$f","filename":"$f","status":"modified","additions":$add,"deletions":1,"changes":${add + 1}}"""
    }.mkString(",")
    val parentJson = parents.map(p => s"""{"sha":"$p","url":"https://x/$p"}""").mkString(",")
    s"""{${meta("commit", urn, processedAt, deletedAt, Map("repo" -> "urn:repo:1"))},"sha":"$sha","url":"https://x/$sha","author":{"id":42,"login":"alice","site_admin":false,"type":"User"},"comment_count":2,"commit":{"author":{"date":"2017-02-28T10:00:00Z","email":"a@x.y","name":"Alice"},"committer":{"date":"2017-02-28T10:00:05Z","email":"c@x.y","name":"Carol"},"message":"$message","tree":{"sha":"t1"}},"committer":{"id":43,"login":"carol"},"stats":{"additions":10,"deletions":3,"total":13},"files":[$fileJson],"parents":[$parentJson]}"""
  }

  def repoDoc(urn: String, name: String, updatedAt: String, processedAt: String,
      stars: Int): String =
    s"""{${meta("repo", urn, processedAt)},"id":1,"name":"$name","full_name":"o/$name","owner":{"id":7,"login":"o","type":"Organization"},"private":false,"fork":false,"default_branch":"main","language":"Scala","forks_count":3,"stargazers_count":$stars,"watchers_count":$stars,"subscribers_count":2,"size":120,"open_issues_count":1,"has_issues":true,"created_at":"2016-01-01T00:00:00Z","updated_at":"$updatedAt","pushed_at":"$processedAt","homepage":null,"description":"d"}"""

  def collabDoc(pageUrn: String, originUrn: String, processedAt: String,
      members: Seq[String]): String =
    s"""{${meta("collaborators", pageUrn, processedAt,
      links = Map("origin" -> originUrn, "unique" -> s"$originUrn:uniq"),
      resources = members)}}"""

  def clonesDoc(urn: String, repoUrn: String, processedAt: String,
      elems: Seq[(String, Int, Int)]): String = {
    val arr = elems.map { case (ts, c, u) =>
      s"""{"timestamp":"$ts","count":$c,"uniques":$u}"""
    }.mkString(",")
    s"""{${meta("clones", urn, processedAt, links = Map("repo" -> repoUrn))},"count":30,"uniques":12,"clones":[$arr]}"""
  }

  def referrersDoc(urn: String, repoUrn: String, processedAt: String,
      elems: Seq[(String, Int, Int)]): String = {
    val arr = elems.map { case (r, c, u) =>
      s"""{"referrer":"$r","count":$c,"uniques":$u}"""
    }.mkString(",")
    s"""{${meta("referrers", urn, processedAt, links = Map("repo" -> repoUrn))},"referrers":[$arr]}"""
  }

  def pushEventDoc(urn: String, processedAt: String, commits: Seq[String]): String = {
    val arr = commits.map(sha =>
      s"""{"sha":"$sha","author":{"email":"a@x.y","name":"Alice"},"distinct":true,"message":"m-$sha","url":"https://x/$sha"}""").mkString(",")
    s"""{${meta("PushEvent", urn, processedAt,
      links = Map("repo" -> "urn:repo:1", "actor" -> "urn:user:42"))},"id":100,"type":"PushEvent","public":true,"created_at":"$processedAt","actor":{"id":42,"login":"alice"},"repo":{"id":1,"name":"o/r"},"org":{"id":7,"login":"contoso"},"payload":{"push_id":5,"size":${commits.size},"distinct_size":${commits.size},"ref":"refs/heads/main","commits":[$arr]}}"""
  }

  def issueDoc(urn: String, number: Int, processedAt: String,
      labels: Seq[String]): String = {
    val arr = labels.zipWithIndex.map { case (l, i) =>
      s"""{"id":${i + 1},"name":"$l","color":"ff0000","url":"https://x/l/$l","default":false}"""
    }.mkString(",")
    s"""{${meta("issue", urn, processedAt, links = Map("repo" -> "urn:repo:1"))},"id":$number,"number":$number,"state":"open","title":"t$number","body":"b","user":{"id":42,"login":"alice"},"assignee":null,"milestone":null,"comments":0,"locked":false,"created_at":"$processedAt","updated_at":"$processedAt","closed_at":null,"labels":[$arr]}"""
  }

  def userDoc(urn: String, login: String, processedAt: String): String =
    s"""{${meta("user", urn, processedAt)},"id":42,"login":"$login","type":"User","site_admin":false,"name":"A","email":"a@x.y","company":null,"location":"Earth","blog":null,"hireable":true,"public_repos":5,"public_gists":1,"followers":10,"following":3,"created_at":"2015-01-01T00:00:00Z","updated_at":"$processedAt"}"""

  /** Write one fixture day: `root/v1/yyyy/MM/dd/docs.json`. */
  def writeDay(rawRoot: String, date: java.time.LocalDate, docs: Seq[String]): Unit = {
    val dir = Paths.get(
      f"$rawRoot/${date.getYear}%04d/${date.getMonthValue}%02d/${date.getDayOfMonth}%02d")
    Files.createDirectories(dir)
    Files.write(dir.resolve("docs.json"),
      docs.mkString("\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  val day1: java.time.LocalDate = java.time.LocalDate.of(2017, 3, 1)
  val day2: java.time.LocalDate = java.time.LocalDate.of(2017, 3, 2)

  /** FIXTURES.md invariants: overlapping urns across days, tombstone,
    * missing optionals, re-crawled + carried-forward origins, multi-element
    * arrays, malformed line. */
  def writeStandardFixture(rawRoot: String): Unit = {
    writeDay(rawRoot, day1, Seq(
      commitDoc("urn:repo:1:commit:c1", "c1", "first", "2017-03-01T01:00:00Z",
        files = Seq(("a.scala", 10), ("b.scala", 5)), parents = Seq("p1", "p2")),
      commitDoc("urn:repo:1:commit:c2", "c2", "lonely", "2017-03-01T01:00:00Z",
        files = Nil, parents = Nil),
      repoDoc("urn:repo:1", "r", "2017-02-20T00:00:00Z", "2017-03-01T02:00:00Z", 7),
      // two crawls of the same origin in one day — only the later wins
      collabDoc("urn:repo:1:collaborators:page:1", "urn:repo:1",
        "2017-03-01T01:00:00Z", Seq("urn:user:42", "urn:user:43")),
      collabDoc("urn:repo:1:collaborators:page:2", "urn:repo:1",
        "2017-03-01T03:00:00Z", Seq("urn:user:42", "urn:user:44", "urn:user:44")),
      collabDoc("urn:repo:2:collaborators:page:1", "urn:repo:2",
        "2017-03-01T01:00:00Z", Seq("urn:user:5")),
      clonesDoc("urn:repo:1:clones:20170301", "urn:repo:1", "2017-03-01T04:00:00Z",
        Seq(("2017-02-28T00:00:00Z", 10, 4), ("2017-03-01T00:00:00Z", 20, 8))),
      referrersDoc("urn:repo:1:referrers:20170301", "urn:repo:1", "2017-03-01T04:00:00Z",
        Seq(("news.ycombinator.com", 100, 40), ("lobste.rs", 10, 5))),
      pushEventDoc("urn:event:100", "2017-03-01T00:30:00Z", Seq("c1")),
      issueDoc("urn:repo:1:issue:7", 7, "2017-03-01T01:30:00Z", Seq("bug", "help wanted")),
      userDoc("urn:user:42", "alice", "2017-03-01T01:00:00Z"),
      """{"this is not valid json""" // silent-skip line
    ))
    writeDay(rawRoot, day2, Seq(
      // same urn, later version — latest-wins
      commitDoc("urn:repo:1:commit:c1", "c1", "second", "2017-03-02T01:00:00Z",
        files = Seq(("a.scala", 11), ("b.scala", 6)), parents = Seq("p1", "p2")),
      // tombstone: deletedAt > processedAt orders by deletedAt (P6 ternary)
      commitDoc("urn:repo:1:commit:c3", "c3", "dead", "2017-03-02T01:00:00Z",
        files = Nil, parents = Nil, deletedAt = Some("2017-03-02T02:00:00Z")),
      // repo new updated_at version — snapshot replaces, log accumulates
      repoDoc("urn:repo:1", "r", "2017-03-01T12:00:00Z", "2017-03-02T02:00:00Z", 9),
      // origin repo:1 re-crawled (replace wholesale); repo:2 NOT crawled (carry)
      collabDoc("urn:repo:1:collaborators:page:1", "urn:repo:1",
        "2017-03-02T01:00:00Z", Seq("urn:user:42", "urn:user:45")),
      // same data_date re-observed with corrected count — latest processed wins
      clonesDoc("urn:repo:1:clones:20170302", "urn:repo:1", "2017-03-02T04:00:00Z",
        Seq(("2017-03-01T00:00:00Z", 21, 8), ("2017-03-02T00:00:00Z", 5, 2)))
    ))
  }
}

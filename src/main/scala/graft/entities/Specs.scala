package graft.entities

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Declarative entity specifications.
  *
  * The reference's 3,400-line `ProcessDaily.usql` is ~33 repetitions of five
  * merge algorithms over per-entity projection lists (SURVEY.md §2.10). Here
  * each curated table is a spec object; `graft.entities.Pipelines` holds the
  * five generic executors. Adding a table = adding a value, not code.
  */
object Specs {

  /** One typed column extracted from the document JSON.
    * @param path JSON path below the document root ("author.id")
    * @param name curated column name
    * @param typ  one of string|int|long|bool|ts
    * @param pii  reference used GetPiiString here (ProcessDaily.usql:109-114)
    */
  final case class Field(path: String, name: String, typ: String = "string",
      pii: Boolean = false)

  /** §2.10(a) scalar snapshot entity (21 instances). `entityPred` is the
    * staging filter (P2 equality, P3 LIKE, P4 IN — ProcessDaily.usql:131,
    * 636, 893). */
  final case class SnapshotSpec(
      table: String,
      entityPred: Column => Column,
      fields: Seq[Field],
      /** TRUNCATE before insert; false only for the CommitParent fidelity
        * quirk (append-only, ProcessDaily.usql:409 — SURVEY.md §2.10a). */
      truncate: Boolean = true
  )

  /** §2.10(c) array child entity (8 instances): `arrayPath` inside the
    * parent doc becomes one row per element, keyed
    * (parent urn, element index). `elementSchema` is Spark DDL for the
    * element struct; `fields` paths are relative to the element. */
  final case class ArrayChildSpec(
      table: String,
      entityPred: Column => Column,
      arrayPath: String,
      elementSchema: String,
      fields: Seq[Field],
      truncate: Boolean = true
  )

  /** §2.10(b) collection membership (6 instances): page-set docs carrying
    * `_metadata.links.{origin,unique,resources.hrefs}`
    * (ProcessDaily.usql:44-57). `extraLink` adds e.g. org/team href columns
    * for member collections (:1733-1734). */
  final case class CollectionSpec(
      table: String,
      entity: String,
      originCol: String = "origin_urn",
      memberCol: String = "member_urn",
      extraLinks: Seq[(String, String)] = Nil // (json link name, column name)
  )

  /** §2.10(d) traffic time-series (4 instances, ProcessDaily.usql:3227-3591).
    * Faithful mode collapses the array to one element per document (the
    * MAP_AGG-grouped-by-doc-only quirk); corrected mode keeps every element.
    * `dedupKeys` and `ordered` mirror the per-entity divergence: Clones/Views
    * order by processed_at desc (:3294,:3572); Referrers/Paths have NO order
    * (:3387,:3479) — we substitute a deterministic tiebreak and document it. */
  final case class TrafficSpec(
      table: String,
      entity: String,
      arrayPath: String,
      elementSchema: String,
      fields: Seq[Field],
      dedupKeys: Seq[String],
      ordered: Boolean
  )

  /** §2.10(e) Repo's dual snapshot+history (ProcessDaily.usql:2619-2631):
    * `logTable` dedups by key + `versionField` instead of key alone. */
  final case class SnapshotLogSpec(
      snapshot: SnapshotSpec,
      logTable: String,
      versionField: String
  )

  // ---------------------------------------------------------------------------
  // Entity catalog. Field lists are the reference's projection lists
  // (citations per spec); representative subsets of the very wide tables
  // (Event ≈130 cols, PullRequest ≈140) keep every *type* of extraction.
  // ---------------------------------------------------------------------------

  private def eq(name: String): Column => Column = _ === name

  /** dbo.Commit (ProcessDaily.usql:98-177). */
  val commit: SnapshotSpec = SnapshotSpec(
    table = "commit",
    entityPred = eq("commit"),
    fields = Seq(
      Field("sha", "sha"),
      Field("author.id", "author_id", "long"),
      Field("author.login", "author_login"),
      Field("author.site_admin", "author_site_admin", "bool"),
      Field("author.type", "author_type"),
      Field("comment_count", "comment_count", "int"),
      Field("commit.author.date", "commit_author_date", "ts"),
      Field("commit.author.email", "commit_author_email", pii = true),
      Field("commit.author.name", "commit_author_name", pii = true),
      Field("commit.committer.date", "commit_committer_date", "ts"),
      Field("commit.committer.email", "commit_committer_email", pii = true),
      Field("commit.committer.name", "commit_committer_name", pii = true),
      Field("commit.message", "commit_message"),
      Field("commit.tree.sha", "commit_tree_sha"),
      Field("committer.id", "committer_id", "long"),
      Field("committer.login", "committer_login"),
      Field("stats.additions", "stat_additions", "int"),
      Field("stats.deletions", "stat_deletions", "int"),
      Field("stats.total", "stat_total", "int"),
      Field("url", "url"),
      Field("_metadata.links.repo.href", "repo_urn"),
      Field("_metadata.version", "schema_version", "int")
    )
  )

  /** dbo.CommitFile (files[], ProcessDaily.usql:277-351). */
  val commitFile: ArrayChildSpec = ArrayChildSpec(
    table = "commit_file",
    entityPred = eq("commit"),
    arrayPath = "files",
    elementSchema =
      "sha STRING, filename STRING, status STRING, additions INT, deletions INT, changes INT",
    fields = Seq(
      Field("sha", "file_sha"),
      Field("filename", "filename"),
      Field("status", "status"),
      Field("additions", "additions", "int"),
      Field("deletions", "deletions", "int"),
      Field("changes", "changes", "int")
    )
  )

  /** dbo.CommitParent (parents[], ProcessDaily.usql:359-421). Fidelity
    * quirk: the reference omits the TRUNCATE (:409) so rank-1 rows append
    * across runs — `truncate = false` reproduces it; Pipelines exposes a
    * corrected switch. */
  val commitParent: ArrayChildSpec = ArrayChildSpec(
    table = "commit_parent",
    entityPred = eq("commit"),
    arrayPath = "parents",
    elementSchema = "sha STRING, url STRING",
    fields = Seq(Field("sha", "parent_sha"), Field("url", "parent_url")),
    truncate = false
  )

  /** dbo.Repo (ProcessDaily.usql:2507-2614, subset) + dbo.RepoLog keyed
    * (EtlSourceId, UpdatedAt) (:2619-2631). */
  val repo: SnapshotLogSpec = SnapshotLogSpec(
    snapshot = SnapshotSpec(
      table = "repo",
      entityPred = eq("repo"),
      fields = Seq(
        Field("id", "repo_id", "long"),
        Field("name", "name"),
        Field("full_name", "full_name"),
        Field("owner.id", "owner_id", "long"),
        Field("owner.login", "owner_login"),
        Field("owner.type", "owner_type"),
        Field("private", "is_private", "bool"),
        Field("fork", "is_fork", "bool"),
        Field("default_branch", "default_branch"),
        Field("language", "language"),
        Field("forks_count", "forks_count", "int"),
        Field("stargazers_count", "stargazers_count", "int"),
        Field("watchers_count", "watchers_count", "int"),
        Field("subscribers_count", "subscribers_count", "int"),
        Field("size", "size", "int"),
        Field("open_issues_count", "open_issues_count", "int"),
        Field("has_issues", "has_issues", "bool"),
        Field("created_at", "created_at", "ts"),
        Field("updated_at", "updated_at", "ts"),
        Field("pushed_at", "pushed_at", "ts"),
        Field("homepage", "homepage"),
        Field("description", "description")
      )
    ),
    logTable = "repo_log",
    versionField = "updated_at"
  )

  /** dbo.User (ProcessDaily.usql:3139-3186 region, subset). */
  val user: SnapshotSpec = SnapshotSpec(
    table = "user",
    entityPred = eq("user"),
    fields = Seq(
      Field("id", "user_id", "long"),
      Field("login", "login"),
      Field("type", "type"),
      Field("site_admin", "site_admin", "bool"),
      Field("name", "name", pii = true),
      Field("email", "email", pii = true),
      Field("company", "company"),
      Field("location", "location", pii = true),
      Field("blog", "blog"),
      Field("hireable", "hireable", "bool"),
      Field("public_repos", "public_repos", "int"),
      Field("public_gists", "public_gists", "int"),
      Field("followers", "followers", "int"),
      Field("following", "following", "int"),
      Field("created_at", "created_at", "ts"),
      Field("updated_at", "updated_at", "ts")
    )
  )

  /** dbo.Org (ProcessDaily.usql:1864-1910 region, subset). */
  val orgEntity: SnapshotSpec = SnapshotSpec(
    table = "org",
    entityPred = eq("org"),
    fields = Seq(
      Field("id", "org_id", "long"),
      Field("login", "login"),
      Field("name", "name"),
      Field("company", "company"),
      Field("blog", "blog"),
      Field("location", "location"),
      Field("email", "email", pii = true),
      Field("public_repos", "public_repos", "int"),
      Field("public_gists", "public_gists", "int"),
      Field("followers", "followers", "int"),
      Field("following", "following", "int"),
      Field("created_at", "created_at", "ts"),
      Field("updated_at", "updated_at", "ts"),
      Field("type", "type")
    )
  )

  /** dbo.Team (ProcessDaily.usql:3085-3117 region, subset). */
  val team: SnapshotSpec = SnapshotSpec(
    table = "team",
    entityPred = eq("team"),
    fields = Seq(
      Field("id", "team_id", "long"),
      Field("name", "name"),
      Field("slug", "slug"),
      Field("description", "description"),
      Field("privacy", "privacy"),
      Field("permission", "permission"),
      Field("members_count", "members_count", "int"),
      Field("repos_count", "repos_count", "int"),
      Field("_metadata.links.org.href", "org_urn")
    )
  )

  /** dbo.Issue (ProcessDaily.usql:1506-1600 region, subset). */
  val issue: SnapshotSpec = SnapshotSpec(
    table = "issue",
    entityPred = eq("issue"),
    fields = Seq(
      Field("id", "issue_id", "long"),
      Field("number", "number", "int"),
      Field("state", "state"),
      Field("title", "title"),
      Field("body", "body"),
      Field("user.id", "user_id", "long"),
      Field("user.login", "user_login"),
      Field("assignee.id", "assignee_id", "long"),
      Field("assignee.login", "assignee_login"),
      Field("milestone.id", "milestone_id", "long"),
      Field("milestone.title", "milestone_title"),
      Field("comments", "comments", "int"),
      Field("locked", "locked", "bool"),
      Field("created_at", "created_at", "ts"),
      Field("updated_at", "updated_at", "ts"),
      Field("closed_at", "closed_at", "ts"),
      Field("_metadata.links.repo.href", "repo_urn")
    )
  )

  /** dbo.IssueLabel (labels[], ProcessDaily.usql:1646-1694). */
  val issueLabel: ArrayChildSpec = ArrayChildSpec(
    table = "issue_label",
    entityPred = eq("issue"),
    arrayPath = "labels",
    elementSchema = "id BIGINT, name STRING, color STRING, url STRING, `default` BOOLEAN",
    fields = Seq(
      Field("id", "label_id", "long"),
      Field("name", "label_name"),
      Field("color", "color"),
      Field("default", "is_default", "bool")
    )
  )

  /** dbo.IssueComment (ProcessDaily.usql:1424-1505 region, subset). */
  val issueComment: SnapshotSpec = SnapshotSpec(
    table = "issue_comment",
    entityPred = eq("issue_comment"),
    fields = Seq(
      Field("id", "comment_id", "long"),
      Field("body", "body"),
      Field("user.id", "user_id", "long"),
      Field("user.login", "user_login"),
      Field("created_at", "created_at", "ts"),
      Field("updated_at", "updated_at", "ts"),
      Field("_metadata.links.issue.href", "issue_urn"),
      Field("_metadata.links.repo.href", "repo_urn")
    )
  )

  /** dbo.PullRequest (ProcessDaily.usql:1964-2106, representative subset of
    * the ≈140-column projection). */
  val pullRequest: SnapshotSpec = SnapshotSpec(
    table = "pull_request",
    entityPred = eq("pull_request"),
    fields = Seq(
      Field("id", "pr_id", "long"),
      Field("number", "number", "int"),
      Field("state", "state"),
      Field("title", "title"),
      Field("body", "body"),
      Field("user.id", "user_id", "long"),
      Field("user.login", "user_login"),
      Field("merged", "merged", "bool"),
      Field("merged_by.id", "merged_by_id", "long"),
      Field("merge_commit_sha", "merge_commit_sha"),
      Field("comments", "comments", "int"),
      Field("review_comments", "review_comments", "int"),
      Field("commits", "commits", "int"),
      Field("additions", "additions", "int"),
      Field("deletions", "deletions", "int"),
      Field("changed_files", "changed_files", "int"),
      Field("base.ref", "base_ref"),
      Field("base.sha", "base_sha"),
      Field("base.repo.id", "base_repo_id", "long"),
      Field("head.ref", "head_ref"),
      Field("head.sha", "head_sha"),
      Field("head.repo.id", "head_repo_id", "long"),
      Field("created_at", "created_at", "ts"),
      Field("updated_at", "updated_at", "ts"),
      Field("closed_at", "closed_at", "ts"),
      Field("merged_at", "merged_at", "ts"),
      Field("_metadata.links.repo.href", "repo_urn")
    )
  )

  /** dbo.Event (ProcessDaily.usql:503-634 wide projection, representative
    * subset; entity filter is the P3 LIKE "%Event" at :636). */
  val event: SnapshotSpec = SnapshotSpec(
    table = "event",
    entityPred = _.like("%Event"),
    fields = Seq(
      Field("id", "event_id", "long"),
      Field("type", "type"),
      Field("public", "public", "bool"),
      Field("created_at", "created_at", "ts"),
      Field("actor.id", "actor_id", "long"),
      Field("actor.login", "actor_login"),
      Field("repo.id", "repo_id", "long"),
      Field("repo.name", "repo_name"),
      Field("org.id", "org_id", "long"),
      Field("org.login", "org_login"),
      Field("payload.action", "payload_action"),
      Field("payload.push_id", "payload_push_id", "long"),
      Field("payload.size", "payload_size", "int"),
      Field("payload.distinct_size", "payload_distinct_size", "int"),
      Field("payload.ref", "payload_ref"),
      Field("payload.ref_type", "payload_ref_type"),
      Field("payload.number", "payload_number", "int"),
      Field("_metadata.links.repo.href", "repo_urn"),
      Field("_metadata.links.actor.href", "actor_urn")
    )
  )

  /** dbo.EventPayloadCommit (payload.commits[], ProcessDaily.usql:806-849). */
  val eventPayloadCommit: ArrayChildSpec = ArrayChildSpec(
    table = "event_payload_commit",
    entityPred = eq("PushEvent"),
    arrayPath = "payload.commits",
    elementSchema =
      "sha STRING, author STRUCT<email: STRING, name: STRING>, distinct BOOLEAN, message STRING, url STRING",
    fields = Seq(
      Field("sha", "sha"),
      Field("author.email", "author_email", pii = true),
      Field("author.name", "author_name", pii = true),
      Field("distinct", "is_distinct", "bool"),
      Field("message", "message")
    )
  )

  /** dbo.CommitComment (ProcessDaily.usql:180-212). */
  val commitComment: SnapshotSpec = SnapshotSpec(
    table = "commit_comment",
    entityPred = eq("commit_comment"),
    fields = Seq(
      Field("_metadata.links.commit.href", "commit_urn"),
      Field("commit_id", "commit_sha"),
      Field("id", "commit_comment_id", "long"),
      Field("body", "body"),
      Field("created_at", "created_at", "ts"),
      Field("line", "line", "int"),
      Field("path", "path"),
      Field("position", "position", "int"),
      Field("updated_at", "updated_at", "ts"),
      Field("user.id", "user_id", "long"),
      Field("user.login", "user_login"),
      Field("user.site_admin", "user_site_admin", "bool"),
      Field("_metadata.links.user.href", "user_urn"),
      Field("_metadata.version", "schema_version", "int")
    )
  )

  /** dbo.PullRequestCommit (ProcessDaily.usql:2268-2312). */
  val pullRequestCommit: SnapshotSpec = SnapshotSpec(
    table = "pull_request_commit",
    entityPred = eq("pull_request_commit"),
    fields = Seq(
      Field("_metadata.links.repo.href", "repo_urn"),
      Field("_metadata.links.pull_request.href", "pull_request_urn"),
      Field("sha", "commit_sha"),
      Field("url", "url"),
      Field("author.id", "author_id", "long"),
      Field("author.login", "author_login"),
      Field("commit.author.date", "commit_author_date", "ts"),
      Field("commit.author.email", "commit_author_email", pii = true),
      Field("commit.author.name", "commit_author_name", pii = true),
      Field("commit.message", "commit_message"),
      Field("commit.tree.sha", "commit_tree_sha"),
      Field("committer.id", "committer_id", "long"),
      Field("committer.login", "committer_login"),
      Field("stats.additions", "stats_additions", "int"),
      Field("stats.deletions", "stats_deletions", "int"),
      Field("stats.total", "stats_total", "int"),
      Field("_metadata.links.author.href", "author_urn"),
      Field("_metadata.version", "schema_version", "int")
    )
  )

  /** dbo.PullRequestCommitComment (ProcessDaily.usql:2360-2390). */
  val pullRequestCommitComment: SnapshotSpec = SnapshotSpec(
    table = "pull_request_commit_comment",
    entityPred = eq("pull_request_commit_comment"),
    fields = Seq(
      Field("_metadata.links.pull_request_commit.href", "commit_urn"),
      Field("commit_id", "commit_sha"),
      Field("id", "commit_comment_id", "long"),
      Field("body", "body"),
      Field("created_at", "created_at", "ts"),
      Field("line", "line", "int"),
      Field("path", "path"),
      Field("position", "position", "int"),
      Field("updated_at", "updated_at", "ts"),
      Field("user.id", "user_id", "long"),
      Field("user.login", "user_login"),
      Field("_metadata.links.user.href", "user_urn"),
      Field("_metadata.version", "schema_version", "int")
    )
  )

  /** dbo.PullRequestReviewComment (ProcessDaily.usql:2425-2462,
    * entity "review_comment"). */
  val pullRequestReviewComment: SnapshotSpec = SnapshotSpec(
    table = "pull_request_review_comment",
    entityPred = eq("review_comment"),
    fields = Seq(
      Field("pull_request_review_id", "pull_request_review_id", "long"),
      Field("body", "body"),
      Field("commit_id", "commit_id"),
      Field("created_at", "created_at", "ts"),
      Field("diff_hunk", "diff_hunk"),
      Field("original_commit_id", "original_commit_id"),
      Field("original_position", "original_position", "int"),
      Field("path", "path"),
      Field("position", "position", "int"),
      Field("updated_at", "updated_at", "ts"),
      Field("user.id", "user_id", "long"),
      Field("user.login", "user_login"),
      Field("_metadata.links.pull_request.href", "pull_request_urn"),
      Field("_metadata.links.user.href", "user_urn"),
      Field("_metadata.version", "schema_version", "int")
    )
  )

  /** dbo.EventPayloadPullRequest (ProcessDaily.usql:1080-1208,
    * representative subset of the ≈119-column projection; P3 LIKE
    * "PullRequest%Event" at :1204). */
  val eventPayloadPullRequest: SnapshotSpec = SnapshotSpec(
    table = "event_payload_pull_request",
    entityPred = _.like("PullRequest%Event"),
    fields = Seq(
      Field("payload.pull_request.id", "event_payload_pull_request_id", "long"),
      Field("payload.action", "action"),
      Field("payload.pull_request.additions", "additions", "int"),
      Field("payload.pull_request.deletions", "deletions", "int"),
      Field("payload.pull_request.changed_files", "changed_files", "int"),
      Field("payload.pull_request.base.label", "base_label"),
      Field("payload.pull_request.base.ref", "base_ref"),
      Field("payload.pull_request.base.repo.id", "base_repo_id", "long"),
      Field("payload.pull_request.base.repo.full_name", "base_repo_full_name"),
      Field("payload.pull_request.base.repo.language", "base_repo_language"),
      Field("payload.pull_request.head.ref", "head_ref"),
      Field("payload.pull_request.head.sha", "head_sha"),
      Field("payload.pull_request.merged", "merged", "bool"),
      Field("payload.pull_request.state", "state"),
      Field("payload.pull_request.title", "title"),
      Field("payload.pull_request.user.id", "user_id", "long"),
      Field("payload.pull_request.user.login", "user_login"),
      Field("payload.pull_request.created_at", "created_at", "ts"),
      Field("payload.pull_request.updated_at", "updated_at", "ts"),
      Field("payload.pull_request.merged_at", "merged_at", "ts"),
      Field("_metadata.links.repo.href", "repo_urn"),
      Field("_metadata.version", "schema_version", "int")
    )
  )

  /** dbo.EventPayloadIssueLabel (payload.issue.labels[],
    * ProcessDaily.usql:896-945; entity filter P4 at :893). */
  val eventPayloadIssueLabel: ArrayChildSpec = ArrayChildSpec(
    table = "event_payload_issue_label",
    entityPred = c => c === "IssueEvent" || c === "IssueCommentEvent",
    arrayPath = "payload.issue.labels",
    elementSchema = "id BIGINT, name STRING, color STRING, url STRING",
    fields = Seq(
      Field("color", "color"),
      Field("name", "name")
    )
  )

  /** dbo.EventPayloadPage (payload.pages[], ProcessDaily.usql:985-1032). */
  val eventPayloadPage: ArrayChildSpec = ArrayChildSpec(
    table = "event_payload_page",
    entityPred = eq("GollumEvent"),
    arrayPath = "payload.pages",
    elementSchema =
      "sha STRING, action STRING, page_name STRING, summary STRING, title STRING",
    fields = Seq(
      Field("sha", "event_payload_page_sha"),
      Field("action", "action"),
      Field("page_name", "page_name"),
      Field("summary", "summary"),
      Field("title", "title")
    )
  )

  /** dbo.EventPayloadReleaseAsset (payload.release.assets[],
    * ProcessDaily.usql:1364-1418). */
  val eventPayloadReleaseAsset: ArrayChildSpec = ArrayChildSpec(
    table = "event_payload_release_asset",
    entityPred = eq("ReleaseEvent"),
    arrayPath = "payload.release.assets",
    elementSchema = "id BIGINT, content_type STRING, created_at TIMESTAMP, " +
      "download_count INT, name STRING, size INT, state STRING, " +
      "updated_at TIMESTAMP, uploader STRUCT<id: BIGINT, login: STRING, " +
      "site_admin: BOOLEAN, `type`: STRING>",
    fields = Seq(
      Field("id", "event_payload_release_asset_id", "long"),
      Field("content_type", "content_type"),
      Field("created_at", "created_at", "ts"),
      Field("download_count", "download_count", "int"),
      Field("name", "name"),
      Field("size", "size", "int"),
      Field("state", "state"),
      Field("updated_at", "updated_at", "ts"),
      Field("uploader.id", "uploader_id", "long"),
      Field("uploader.login", "uploader_login")
    )
  )

  /** Collections (§2.10b): RepoCollaborators (ProcessDaily.usql:25-91),
    * RepoContributors (:428-494), RepoTeams (:2865-2932), RepoStargazers
    * (:2939-3006), RepoSubscribers (:3013-3080), Org/TeamMembers
    * (:1732-1859). */
  val collections: Seq[CollectionSpec] = Seq(
    CollectionSpec("repo_collaborators", "collaborators"),
    CollectionSpec("repo_contributors", "contributors"),
    CollectionSpec("repo_teams", "teams"),
    CollectionSpec("repo_stargazers", "stargazers"),
    CollectionSpec("repo_subscribers", "subscribers"),
    CollectionSpec("org_members", "members",
      extraLinks = Seq(("_metadata.links.org.href", "org_urn"))),
    CollectionSpec("team_members", "members",
      extraLinks = Seq(("_metadata.links.team.href", "team_urn")))
  )

  private val trafficCountSchema = "timestamp TIMESTAMP, count INT, uniques INT"

  /** Traffic entities (§2.10d, ProcessDaily.usql:3227-3591). */
  val clones: TrafficSpec = TrafficSpec(
    table = "repo_clones", entity = "clones", arrayPath = "clones",
    elementSchema = trafficCountSchema,
    fields = Seq(
      Field("timestamp", "data_date", "ts"),
      Field("count", "count", "int"),
      Field("uniques", "uniques", "int")),
    dedupKeys = Seq("repo_urn", "data_date"), ordered = true)

  val views: TrafficSpec = TrafficSpec(
    table = "repo_views", entity = "views", arrayPath = "views",
    elementSchema = trafficCountSchema,
    fields = Seq(
      Field("timestamp", "data_date", "ts"),
      Field("count", "count", "int"),
      Field("uniques", "uniques", "int")),
    dedupKeys = Seq("repo_urn", "data_date"), ordered = true)

  val referrers: TrafficSpec = TrafficSpec(
    table = "repo_referrers", entity = "referrers", arrayPath = "referrers",
    elementSchema = "referrer STRING, count INT, uniques INT",
    fields = Seq(
      Field("referrer", "referrer"),
      Field("count", "count", "int"),
      Field("uniques", "uniques", "int")),
    dedupKeys = Seq("etl_source_id", "referrer", "processed_at"),
    ordered = false)

  val paths: TrafficSpec = TrafficSpec(
    table = "repo_paths", entity = "paths", arrayPath = "paths",
    elementSchema = "path STRING, title STRING, count INT, uniques INT",
    fields = Seq(
      Field("path", "path"),
      Field("title", "title"),
      Field("count", "count", "int"),
      Field("uniques", "uniques", "int")),
    dedupKeys = Seq("etl_source_id", "path", "processed_at"),
    ordered = false)

  val snapshots: Seq[SnapshotSpec] =
    Seq(commit, user, orgEntity, team, issue, issueComment, pullRequest, event,
      commitComment, pullRequestCommit, pullRequestCommitComment,
      pullRequestReviewComment, eventPayloadPullRequest)
  val arrayChildren: Seq[ArrayChildSpec] =
    Seq(commitFile, commitParent, issueLabel, eventPayloadCommit,
      eventPayloadIssueLabel, eventPayloadPage, eventPayloadReleaseAsset)
  val traffic: Seq[TrafficSpec] = Seq(clones, views, referrers, paths)
}

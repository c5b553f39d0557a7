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
      extraLinks: Seq[(String, String)] = Nil, // (json link name, column name)
      /** Docs lacking this link are excluded — the Org/TeamMember split of
        * the shared "members" entity (`WHERE OrgUrn IS NOT NULL`,
        * ProcessDaily.usql:1751, and TeamUrn at :1783). */
      requiredLink: Option[String] = None
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

  /** dbo.Repo (ProcessDaily.usql:2507-2614, full 102-column projection) +
    * dbo.RepoLog keyed
    * (EtlSourceId, UpdatedAt) (:2619-2631). */
  val repo: SnapshotLogSpec = SnapshotLogSpec(
    snapshot = SnapshotSpec(
      table = "repo",
      entityPred = eq("repo"),
      fields = Seq(
        Field("_metadata.links.owner.href", "owner_urn"),
        Field("_metadata.links.siblings.href", "siblings_urn"),
        Field("name", "name"),
        Field("id", "repo_id", "int"),
        Field("owner.login", "owner_login"),
        Field("created_at", "created_at", "ts"),
        Field("default_branch", "default_branch"),
        Field("description", "description"),
        Field("fork", "fork", "bool"),
        Field("forks", "forks", "int"),
        Field("forks_count", "forks_count", "int"),
        Field("full_name", "full_name"),
        Field("has_downloads", "has_downloads", "bool"),
        Field("has_issues", "has_issues", "bool"),
        Field("has_pages", "has_pages", "bool"),
        Field("has_wiki", "has_wiki", "bool"),
        Field("homepage", "homepage"),
        Field("language", "language"),
        Field("network_count", "network_count", "int"),
        Field("open_issues", "open_issues", "int"),
        Field("open_issues_count", "open_issues_count", "int"),
        Field("organization.id", "organization_id", "int"),
        Field("organization.login", "organization_login"),
        Field("organization.site_admin", "organization_site_admin", "bool"),
        Field("organization.type", "organization_type"),
        Field("owner.id", "owner_id", "int"),
        Field("owner.site_admin", "owner_site_admin", "bool"),
        Field("owner.type", "owner_type"),
        Field("parent.created_at", "parent_created_at", "ts"),
        Field("parent.default_branch", "parent_default_branch"),
        Field("parent.description", "parent_description"),
        Field("parent.fork", "parent_fork", "bool"),
        Field("parent.forks", "parent_forks", "int"),
        Field("parent.forks_count", "parent_forks_count", "int"),
        Field("parent.full_name", "parent_full_name"),
        Field("parent.has_downloads", "parent_has_downloads", "bool"),
        Field("parent.has_issues", "parent_has_issues", "bool"),
        Field("parent.has_pages", "parent_has_pages", "bool"),
        Field("parent.has_wiki", "parent_has_wiki", "bool"),
        Field("parent.homepage", "parent_homepage"),
        Field("parent.id", "parent_id", "int"),
        Field("parent.language", "parent_language"),
        Field("parent.name", "parent_name"),
        Field("parent.open_issues", "parent_open_issues", "int"),
        Field("parent.open_issues_count", "parent_open_issues_count", "int"),
        Field("parent.owner.id", "parent_owner_id", "int"),
        Field("parent.owner.login", "parent_owner_login"),
        Field("parent.owner.site_admin", "parent_owner_site_admin", "bool"),
        Field("parent.owner.type", "parent_owner_type"),
        Field("parent.private", "parent_private", "bool"),
        Field("parent.pushed_at", "parent_pushed_at", "ts"),
        Field("parent.size", "parent_size", "int"),
        Field("parent.stargazers_count", "parent_stargazers_count", "int"),
        Field("parent.updated_at", "parent_updated_at", "ts"),
        Field("parent.watchers", "parent_watchers", "int"),
        Field("parent.watchers_count", "parent_watchers_count", "int"),
        Field("permissions.admin", "permissions_admin", "bool"),
        Field("permissions.pull", "permissions_pull", "bool"),
        Field("permissions.push", "permissions_push", "bool"),
        Field("private", "is_private", "bool"),
        Field("pushed_at", "pushed_at", "ts"),
        Field("size", "size", "int"),
        Field("source.created_at", "source_created_at", "ts"),
        Field("source.default_branch", "source_default_branch"),
        Field("source.description", "source_description"),
        Field("source.fork", "source_fork", "bool"),
        Field("source.forks", "source_forks", "int"),
        Field("source.forks_count", "source_forks_count", "int"),
        Field("source.full_name", "source_full_name"),
        Field("source.has_downloads", "source_has_downloads", "bool"),
        Field("source.has_issues", "source_has_issues", "bool"),
        Field("source.has_pages", "source_has_pages", "bool"),
        Field("source.has_wiki", "source_has_wiki", "bool"),
        Field("source.homepage", "source_homepage"),
        Field("source.id", "source_id", "int"),
        Field("source.language", "source_language"),
        Field("source.name", "source_name"),
        Field("source.open_issues", "source_open_issues", "int"),
        Field("source.open_issues_count", "source_open_issues_count", "int"),
        Field("source.owner.id", "source_owner_id", "int"),
        Field("source.owner.login", "source_owner_login"),
        Field("source.owner.site_admin", "source_owner_site_admin", "bool"),
        Field("source.owner.type", "source_owner_type"),
        Field("source.private", "source_private", "bool"),
        Field("source.pushed_at", "source_pushed_at", "ts"),
        Field("source.size", "source_size", "int"),
        Field("source.stargazers_count", "source_stargazers_count", "int"),
        Field("source.updated_at", "source_updated_at", "ts"),
        Field("source.watchers", "source_watchers", "int"),
        Field("source.watchers_count", "source_watchers_count", "int"),
        Field("stargazers_count", "stargazers_count", "int"),
        Field("subscribers_count", "subscribers_count", "int"),
        Field("updated_at", "updated_at", "ts"),
        Field("watchers", "watchers", "int"),
        Field("watchers_count", "watchers_count", "int"),
        Field("_metadata.links.teams.href", "teams_page_urn"),
        Field("_metadata.links.collaborators.href", "collaborators_page_urn"),
        Field("_metadata.links.contributors.href", "contributors_page_urn"),
        Field("_metadata.links.subscribers.href", "subscribers_page_urn"),
        Field("_metadata.links.issues.href", "issues_urn"),
        Field("_metadata.links.commits.href", "commits_urn"),
        Field("_metadata.version", "schema_version", "int")
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
      Field("_metadata.links.siblings.href", "siblings_urn"),
      Field("login", "login"),
      Field("id", "user_id", "int"),
      Field("bio", "bio"),
      Field("blog", "blog", "string", pii = true),
      Field("company", "company", "string", pii = true),
      Field("created_at", "created_at", "ts"),
      Field("email", "email", "string", pii = true),
      Field("followers", "followers", "int"),
      Field("following", "following", "int"),
      Field("hireable", "hireable", "bool"),
      Field("location", "location"),
      Field("name", "name", "string", pii = true),
      Field("public_gists", "public_gists", "int"),
      Field("public_repos", "public_repos", "int"),
      Field("site_admin", "site_admin", "bool"),
      Field("type", "type"),
      Field("updated_at", "updated_at", "ts"),
      Field("_metadata.version", "schema_version", "int")
    )
  )

  /** dbo.Org (ProcessDaily.usql:1864-1910 region, subset). */
  val orgEntity: SnapshotSpec = SnapshotSpec(
    table = "org",
    entityPred = eq("org"),
    fields = Seq(
      Field("_metadata.links.siblings.href", "siblings_urn"),
      Field("login", "login"),
      Field("url", "url"),
      Field("id", "org_id", "int"),
      Field("description", "description"),
      Field("name", "name"),
      Field("company", "company"),
      Field("blog", "blog"),
      Field("email", "email", "string", pii = true),
      Field("public_repos", "public_repos", "int"),
      Field("public_gists", "public_gists", "int"),
      Field("followers", "followers", "int"),
      Field("following", "following", "int"),
      Field("html_url", "html_url"),
      Field("created_at", "created_at", "ts"),
      Field("updated_at", "updated_at", "ts"),
      Field("type", "type"),
      Field("total_private_repos", "total_private_repos", "int"),
      Field("owned_private_repos", "owned_private_repos", "int"),
      Field("private_gists", "private_gists", "int"),
      Field("disk_usage", "disk_usage", "int"),
      Field("collaborators", "collaborators", "int"),
      Field("billing_email", "billing_email", "string", pii = true),
      Field("plan.name", "plan_name"),
      Field("plan.space", "plan_space", "int"),
      Field("plan.filled_seats", "plan_filled_seats", "int"),
      Field("plan.seats", "plan_seats", "int"),
      Field("_metadata.links.repos.href", "repos_urn"),
      Field("_metadata.links.members.href", "members_urn"),
      Field("_metadata.links.user.href", "user_urn"),
      Field("_metadata.version", "schema_version", "int")
    )
  )

  /** dbo.Team (ProcessDaily.usql:3085-3117 region, subset). */
  val team: SnapshotSpec = SnapshotSpec(
    table = "team",
    entityPred = eq("team"),
    fields = Seq(
      Field("_metadata.links.org.href", "organization_urn"),
      Field("_metadata.links.siblings.href", "siblings_urn"),
      Field("id", "team_id", "int"),
      Field("name", "name"),
      Field("slug", "slug"),
      Field("description", "description"),
      Field("privacy", "privacy"),
      Field("url", "url"),
      Field("permission", "permission"),
      Field("created_at", "created_at", "ts"),
      Field("updated_at", "updated_at", "ts"),
      Field("members_count", "members_count", "int"),
      Field("repos_count", "repos_count", "int"),
      Field("_metadata.links.members.href", "members_urn"),
      Field("_metadata.links.repos.href", "repos_urn"),
      Field("_metadata.version", "schema_version", "int")
    )
  )

  /** dbo.Issue (ProcessDaily.usql:1506-1600 region, subset). */
  val issue: SnapshotSpec = SnapshotSpec(
    table = "issue",
    entityPred = eq("issue"),
    fields = Seq(
      Field("_metadata.links.repo.href", "repo_urn"),
      Field("_metadata.links.siblings.href", "siblings_urn"),
      Field("number", "number", "int"),
      Field("id", "issue_id", "int"),
      Field("assignee.id", "assignee_id", "int"),
      Field("assignee.login", "assignee_login"),
      Field("assignee.site_admin", "assignee_site_admin", "bool"),
      Field("assignee.type", "assignee_type"),
      Field("body", "body"),
      Field("closed_at", "closed_at", "ts"),
      Field("closed_by.id", "closed_by_id", "int"),
      Field("closed_by.login", "closed_by_login"),
      Field("closed_by.site_admin", "closed_by_site_admin", "bool"),
      Field("closed_by.type", "closed_by_type"),
      Field("comments", "comments", "int"),
      Field("created_at", "created_at", "ts"),
      Field("locked", "locked", "bool"),
      Field("milestone.closed_at", "milestone_closed_at", "ts"),
      Field("milestone.closed_issues", "milestone_closed_issues", "int"),
      Field("milestone.created_at", "milestone_created_at", "ts"),
      Field("milestone.creator.id", "milestone_creator_id", "int"),
      Field("milestone.creator.login", "milestone_creator_login"),
      Field("milestone.creator.site_admin", "milestone_creator_site_admin", "bool"),
      Field("milestone.creator.type", "milestone_creator_type"),
      Field("milestone.description", "milestone_description"),
      Field("milestone.due_on", "milestone_due_on", "ts"),
      Field("milestone.id", "milestone_id", "int"),
      Field("milestone.number", "milestone_number", "int"),
      Field("milestone.open_issues", "milestone_open_issues", "int"),
      Field("milestone.state", "milestone_state"),
      Field("milestone.title", "milestone_title"),
      Field("milestone.updated_at", "milestone_updated_at", "ts"),
      Field("pull_request.url", "pull_request_url"),
      Field("state", "state"),
      Field("title", "title"),
      Field("updated_at", "updated_at", "ts"),
      Field("user.id", "user_id", "int"),
      Field("user.login", "user_login"),
      Field("user.site_admin", "user_site_admin", "bool"),
      Field("user.type", "user_type"),
      Field("_metadata.links.user.href", "user_urn"),
      Field("_metadata.links.closed_by.href", "closed_by_urn"),
      Field("_metadata.version", "schema_version", "int")
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
      Field("_metadata.links.issue.href", "issue_urn"),
      Field("_metadata.links.siblings.href", "siblings_urn"),
      Field("id", "issue_comment_id", "int"),
      Field("body", "body"),
      Field("created_at", "created_at", "ts"),
      Field("updated_at", "updated_at", "ts"),
      Field("user.id", "user_id", "int"),
      Field("user.login", "user_login"),
      Field("user.site_admin", "user_site_admin", "bool"),
      Field("user.type", "user_type"),
      Field("_metadata.links.user.href", "user_urn"),
      Field("_metadata.version", "schema_version", "int")
    )
  )

  /** dbo.PullRequest (ProcessDaily.usql:1964-2106, full 138-column projection). */
  val pullRequest: SnapshotSpec = SnapshotSpec(
    table = "pull_request",
    entityPred = eq("pull_request"),
    fields = Seq(
      Field("_metadata.links.repo.href", "repo_urn"),
      Field("_metadata.links.siblings.href", "siblings_urn"),
      Field("number", "number", "int"),
      Field("id", "pull_request_id", "int"),
      Field("_links.comments.href", "links_comments_href"),
      Field("_links.commits.href", "links_commits_href"),
      Field("_links.html.href", "links_html_href"),
      Field("_links.issue.href", "links_issue_href"),
      Field("_links.review_comment.href", "links_review_comment_href"),
      Field("_links.review_comments.href", "links_review_comments_href"),
      Field("_links.self.href", "links_self_href"),
      Field("_links.statuses.href", "links_statuses_href"),
      Field("additions", "additions", "int"),
      Field("assignee.id", "assignee_id", "int"),
      Field("assignee.login", "assignee_login"),
      Field("assignee.site_admin", "assignee_site_admin", "bool"),
      Field("assignee.type", "assignee_type"),
      Field("base.label", "base_label"),
      Field("base.ref", "base_ref"),
      Field("base.repo.created_at", "base_repo_created_at", "ts"),
      Field("base.repo.default_branch", "base_repo_default_branch"),
      Field("base.repo.description", "base_repo_description"),
      Field("base.repo.fork", "base_repo_fork", "bool"),
      Field("base.repo.forks", "base_repo_forks", "int"),
      Field("base.repo.forks_count", "base_repo_forks_count", "int"),
      Field("base.repo.full_name", "base_repo_full_name"),
      Field("base.repo.has_downloads", "base_repo_has_downloads", "bool"),
      Field("base.repo.has_issues", "base_repo_has_issues", "bool"),
      Field("base.repo.has_pages", "base_repo_has_pages", "bool"),
      Field("base.repo.has_wiki", "base_repo_has_wiki", "bool"),
      Field("base.repo.homepage", "base_repo_homepage"),
      Field("base.repo.id", "base_repo_id", "int"),
      Field("base.repo.language", "base_repo_language"),
      Field("base.repo.name", "base_repo_name"),
      Field("base.repo.open_issues", "base_repo_open_issues", "int"),
      Field("base.repo.open_issues_count", "base_repo_open_issues_count", "int"),
      Field("base.repo.owner.id", "base_repo_owner_id", "int"),
      Field("base.repo.owner.login", "base_repo_owner_login"),
      Field("base.repo.owner.site_admin", "base_repo_owner_site_admin", "bool"),
      Field("base.repo.owner.type", "base_repo_owner_type"),
      Field("base.repo.private", "base_repo_private", "bool"),
      Field("base.repo.pushed_at", "base_repo_pushed_at", "ts"),
      Field("base.repo.size", "base_repo_size", "int"),
      Field("base.repo.stargazers_count", "base_repo_stargazers_count", "int"),
      Field("base.repo.updated_at", "base_repo_updated_at", "ts"),
      Field("base.repo.watchers", "base_repo_watchers", "int"),
      Field("base.repo.watchers_count", "base_repo_watchers_count", "int"),
      Field("base.sha", "base_sha"),
      Field("base.user.id", "base_user_id", "int"),
      Field("base.user.login", "base_user_login"),
      Field("base.user.site_admin", "base_user_site_admin", "bool"),
      Field("base.user.type", "base_user_type"),
      Field("body", "body"),
      Field("changed_files", "changed_files", "int"),
      Field("closed_at", "closed_at", "ts"),
      Field("comments", "comments", "int"),
      Field("commits", "commits", "int"),
      Field("created_at", "created_at", "ts"),
      Field("deletions", "deletions", "int"),
      Field("head.label", "head_label"),
      Field("head.ref", "head_ref"),
      Field("head.repo.created_at", "head_repo_created_at", "ts"),
      Field("head.repo.default_branch", "head_repo_default_branch"),
      Field("head.repo.description", "head_repo_description"),
      Field("head.repo.fork", "head_repo_fork", "bool"),
      Field("head.repo.forks", "head_repo_forks", "int"),
      Field("head.repo.forks_count", "head_repo_forks_count", "int"),
      Field("head.repo.full_name", "head_repo_full_name"),
      Field("head.repo.has_downloads", "head_repo_has_downloads", "bool"),
      Field("head.repo.has_issues", "head_repo_has_issues", "bool"),
      Field("head.repo.has_pages", "head_repo_has_pages", "bool"),
      Field("head.repo.has_wiki", "head_repo_has_wiki", "bool"),
      Field("head.repo.homepage", "head_repo_homepage"),
      Field("head.repo.id", "head_repo_id", "int"),
      Field("head.repo.language", "head_repo_language"),
      Field("head.repo.name", "head_repo_name"),
      Field("head.repo.open_issues", "head_repo_open_issues", "int"),
      Field("head.repo.open_issues_count", "head_repo_open_issues_count", "int"),
      Field("head.repo.owner.id", "head_repo_owner_id", "int"),
      Field("head.repo.owner.login", "head_repo_owner_login"),
      Field("head.repo.owner.site_admin", "head_repo_owner_site_admin", "bool"),
      Field("head.repo.owner.type", "head_repo_owner_type"),
      Field("head.repo.private", "head_repo_private", "bool"),
      Field("head.repo.pushed_at", "head_repo_pushed_at", "ts"),
      Field("head.repo.size", "head_repo_size", "int"),
      Field("head.repo.stargazers_count", "head_repo_stargazers_count", "int"),
      Field("head.repo.updated_at", "head_repo_updated_at", "ts"),
      Field("head.repo.watchers", "head_repo_watchers", "int"),
      Field("head.repo.watchers_count", "head_repo_watchers_count", "int"),
      Field("head.sha", "head_sha"),
      Field("head.user.id", "head_user_id", "int"),
      Field("head.user.login", "head_user_login"),
      Field("head.user.site_admin", "head_user_site_admin", "bool"),
      Field("head.user.type", "head_user_type"),
      Field("locked", "locked", "bool"),
      Field("merge_commit_sha", "merge_commit_sha"),
      Field("mergeable", "mergeable", "bool"),
      Field("mergeable_state", "mergeable_state"),
      Field("merged", "merged", "bool"),
      Field("merged_at", "merged_at", "ts"),
      Field("merged_by.id", "merged_by_id", "int"),
      Field("merged_by.login", "merged_by_login"),
      Field("merged_by.site_admin", "merged_by_site_admin", "bool"),
      Field("merged_by.type", "merged_by_type"),
      Field("milestone.closed_at", "milestone_closed_at", "ts"),
      Field("milestone.closed_issues", "milestone_closed_issues", "int"),
      Field("milestone.created_at", "milestone_created_at", "ts"),
      Field("milestone.creator.id", "milestone_creator_id", "int"),
      Field("milestone.creator.login", "milestone_creator_login"),
      Field("milestone.creator.site_admin", "milestone_creator_site_admin", "bool"),
      Field("milestone.creator.type", "milestone_creator_type"),
      Field("milestone.description", "milestone_description"),
      Field("milestone.due_on", "milestone_due_on", "ts"),
      Field("milestone.id", "milestone_id", "int"),
      Field("milestone.number", "milestone_number", "int"),
      Field("milestone.open_issues", "milestone_open_issues", "int"),
      Field("milestone.state", "milestone_state"),
      Field("milestone.title", "milestone_title"),
      Field("milestone.updated_at", "milestone_updated_at", "ts"),
      Field("review_comments", "review_comments", "int"),
      Field("state", "state"),
      Field("title", "title"),
      Field("updated_at", "updated_at", "ts"),
      Field("user.id", "user_id", "int"),
      Field("user.login", "user_login"),
      Field("user.site_admin", "user_site_admin", "bool"),
      Field("user.type", "user_type"),
      Field("_metadata.links.user.href", "user_urn"),
      Field("_metadata.links.merged_by.href", "merged_by_urn"),
      Field("_metadata.links.assignee.href", "assignee_urn"),
      Field("_metadata.links.head.href", "head_urn"),
      Field("_metadata.links.base.href", "base_urn"),
      Field("_metadata.links.statuses.href", "statuses_urn"),
      Field("_metadata.links.commits.href", "commits_urn"),
      Field("_metadata.links.issue.href", "issue_urn"),
      Field("_metadata.links.issue_comments.href", "issue_comments_urn"),
      Field("_metadata.version", "schema_version", "int"),
    )
  )

  /** dbo.Event (ProcessDaily.usql:503-634, full 126-column projection; entity
    * filter is the P3 LIKE "%Event" at :636). */
  val event: SnapshotSpec = SnapshotSpec(
    table = "event",
    entityPred = _.like("%Event"),
    fields = Seq(
      Field("_metadata.links.actor.href", "actor_urn"),
      Field("_metadata.links.siblings.href", "siblings_urn"),
      Field("actor.id", "actor_id", "int"),
      Field("actor.login", "actor_login"),
      Field("created_at", "created_at", "ts"),
      Field("org.id", "org_id", "int"),
      Field("org.login", "org_login"),
      Field("payload.action", "payload_action"),
      Field("payload.before", "payload_before"),
      Field("payload.comment._links.html.href", "payload_comment_links_html_href"),
      Field("payload.comment._links.pull_request.href", "payload_comment_links_pull_request_href"),
      Field("payload.comment._links.self.href", "payload_comment_links_self_href"),
      Field("payload.comment.body", "payload_comment_body"),
      Field("payload.comment.commit_id", "payload_comment_commit_id"),
      Field("payload.comment.created_at", "payload_comment_created_at", "ts"),
      Field("payload.comment.diff_hunk", "payload_comment_diff_hunk"),
      Field("payload.comment.id", "payload_comment_id", "int"),
      Field("payload.comment.line", "payload_comment_line", "int"),
      Field("payload.comment.original_commit_id", "payload_comment_original_commit_id"),
      Field("payload.comment.original_position", "payload_comment_original_position", "int"),
      Field("payload.comment.path", "payload_comment_path"),
      Field("payload.comment.position", "payload_comment_position", "int"),
      Field("payload.comment.updated_at", "payload_comment_updated_at", "ts"),
      Field("payload.comment.user.id", "payload_comment_user_id", "int"),
      Field("payload.comment.user.login", "payload_comment_user_login"),
      Field("payload.comment.user.site_admin", "payload_comment_user_site_admin", "bool"),
      Field("payload.comment.user.type", "payload_comment_user_type"),
      Field("payload.description", "payload_description"),
      Field("payload.distinct_size", "payload_distinct_size", "int"),
      Field("payload.forkee.created_at", "payload_forkee_created_at", "ts"),
      Field("payload.forkee.default_branch", "payload_forkee_default_branch"),
      Field("payload.forkee.description", "payload_forkee_description"),
      Field("payload.forkee.fork", "payload_forkee_fork", "bool"),
      Field("payload.forkee.forks", "payload_forkee_forks", "int"),
      Field("payload.forkee.forks_count", "payload_forkee_forks_count", "int"),
      Field("payload.forkee.full_name", "payload_forkee_full_name"),
      Field("payload.forkee.has_downloads", "payload_forkee_has_downloads", "bool"),
      Field("payload.forkee.has_issues", "payload_forkee_has_issues", "bool"),
      Field("payload.forkee.has_pages", "payload_forkee_has_pages", "bool"),
      Field("payload.forkee.has_wiki", "payload_forkee_has_wiki", "bool"),
      Field("payload.forkee.homepage", "payload_forkee_homepage"),
      Field("payload.forkee.id", "payload_forkee_id", "int"),
      Field("payload.forkee.language", "payload_forkee_language"),
      Field("payload.forkee.name", "payload_forkee_name"),
      Field("payload.forkee.open_issues", "payload_forkee_open_issues", "int"),
      Field("payload.forkee.open_issues_count", "payload_forkee_open_issues_count", "int"),
      Field("payload.forkee.owner.id", "payload_forkee_owner_id", "int"),
      Field("payload.forkee.owner.login", "payload_forkee_owner_login"),
      Field("payload.forkee.owner.site_admin", "payload_forkee_owner_site_admin", "bool"),
      Field("payload.forkee.owner.type", "payload_forkee_owner_type"),
      Field("payload.forkee.private", "payload_forkee_private", "bool"),
      Field("payload.forkee.public", "payload_forkee_public", "bool"),
      Field("payload.forkee.pushed_at", "payload_forkee_pushed_at", "ts"),
      Field("payload.forkee.size", "payload_forkee_size", "int"),
      Field("payload.forkee.stargazers_count", "payload_forkee_stargazers_count", "int"),
      Field("payload.forkee.updated_at", "payload_forkee_updated_at", "ts"),
      Field("payload.forkee.watchers", "payload_forkee_watchers", "int"),
      Field("payload.forkee.watchers_count", "payload_forkee_watchers_count", "int"),
      Field("payload.head", "payload_head"),
      Field("payload.issue.assignee.id", "payload_issue_assignee_id", "int"),
      Field("payload.issue.assignee.login", "payload_issue_assignee_login"),
      Field("payload.issue.assignee.site_admin", "payload_issue_assignee_site_admin", "bool"),
      Field("payload.issue.assignee.type", "payload_issue_assignee_type"),
      Field("payload.issue.body", "payload_issue_body"),
      Field("payload.issue.closed_at", "payload_issue_closed_at", "ts"),
      Field("payload.issue.comments", "payload_issue_comments", "int"),
      Field("payload.issue.created_at", "payload_issue_created_at", "ts"),
      Field("payload.issue.id", "payload_issue_id", "int"),
      Field("payload.issue.locked", "payload_issue_locked", "bool"),
      Field("payload.issue.milestone.closed_at", "payload_issue_milestone_closed_at", "ts"),
      Field("payload.issue.milestone.closed_issues", "payload_issue_milestone_closed_issues", "int"),
      Field("payload.issue.milestone.created_at", "payload_issue_milestone_created_at", "ts"),
      Field("payload.issue.milestone.creator.id", "payload_issue_milestone_creator_id", "int"),
      Field("payload.issue.milestone.creator.login", "payload_issue_milestone_creator_login"),
      Field("payload.issue.milestone.creator.site_admin", "payload_issue_milestone_creator_site_admin", "bool"),
      Field("payload.issue.milestone.creator.type", "payload_issue_milestone_creator_type"),
      Field("payload.issue.milestone.description", "payload_issue_milestone_description"),
      Field("payload.issue.milestone.due_on", "payload_issue_milestone_due_on", "ts"),
      Field("payload.issue.milestone.id", "payload_issue_milestone_id", "int"),
      Field("payload.issue.milestone.number", "payload_issue_milestone_number", "int"),
      Field("payload.issue.milestone.open_issues", "payload_issue_milestone_open_issues", "int"),
      Field("payload.issue.milestone.state", "payload_issue_milestone_state"),
      Field("payload.issue.milestone.title", "payload_issue_milestone_title"),
      Field("payload.issue.milestone.updated_at", "payload_issue_milestone_updated_at", "ts"),
      Field("payload.issue.number", "payload_issue_number", "int"),
      Field("payload.issue.state", "payload_issue_state"),
      Field("payload.issue.title", "payload_issue_title"),
      Field("payload.issue.updated_at", "payload_issue_updated_at", "ts"),
      Field("payload.issue.user.id", "payload_issue_user_id", "int"),
      Field("payload.issue.user.login", "payload_issue_user_login"),
      Field("payload.issue.user.site_admin", "payload_issue_user_site_admin", "bool"),
      Field("payload.issue.user.type", "payload_issue_user_type"),
      Field("payload.master_branch", "payload_master_branch"),
      Field("payload.member.id", "payload_member_id", "int"),
      Field("payload.member.login", "payload_member_login"),
      Field("payload.member.site_admin", "payload_member_site_admin", "bool"),
      Field("payload.member.type", "payload_member_type"),
      Field("payload.number", "payload_number", "int"),
      Field("payload.push_id", "payload_push_id", "int"),
      Field("payload.pusher_type", "payload_pusher_type"),
      Field("payload.ref", "payload_ref"),
      Field("payload.ref_type", "payload_ref_type"),
      Field("payload.release.author.id", "payload_release_author_id", "int"),
      Field("payload.release.author.login", "payload_release_author_login"),
      Field("payload.release.author.site_admin", "payload_release_author_site_admin", "bool"),
      Field("payload.release.author.type", "payload_release_author_type"),
      Field("payload.release.body", "payload_release_body"),
      Field("payload.release.created_at", "payload_release_created_at", "ts"),
      Field("payload.release.draft", "payload_release_draft", "bool"),
      Field("payload.release.id", "payload_release_id", "int"),
      Field("payload.release.name", "payload_release_name"),
      Field("payload.release.prerelease", "payload_release_prerelease", "bool"),
      Field("payload.release.published_at", "payload_release_published_at", "ts"),
      Field("payload.release.tag_name", "payload_release_tag_name"),
      Field("payload.release.target_commitish", "payload_release_target_commitish"),
      Field("payload.size", "payload_size", "int"),
      Field("public", "is_public", "bool"),
      Field("repo.id", "repo_id", "int"),
      Field("repo.name", "repo_name"),
      Field("type", "type"),
      Field("_metadata.links.repo.href", "repo_urn"),
      Field("_metadata.links.org.href", "org_urn"),
      Field("_metadata.links.issue.href", "issue_urn"),
      Field("_metadata.links.pull_request.href", "pull_request_urn"),
      Field("_metadata.links.comment.href", "comment_urn"),
      Field("_metadata.version", "schema_version", "int")
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
      Field("author.id", "author_id", "int"),
      Field("author.login", "author_login"),
      Field("author.site_admin", "author_site_admin", "bool"),
      Field("author.type", "author_type"),
      Field("commit.author.date", "commit_author_date", "ts"),
      Field("commit.author.email", "commit_author_email", "string", pii = true),
      Field("commit.author.name", "commit_author_name", "string", pii = true),
      Field("commit.comment_count", "commit_comment_count", "int"),
      Field("commit.committer.date", "commit_committer_date", "ts"),
      Field("commit.committer.email", "commit_committer_email", "string", pii = true),
      Field("commit.committer.name", "commit_committer_name", "string", pii = true),
      Field("commit.message", "commit_message"),
      Field("commit.tree.sha", "commit_tree_sha"),
      Field("committer.id", "committer_id", "int"),
      Field("committer.login", "committer_login"),
      Field("committer.site_admin", "committer_site_admin", "bool"),
      Field("committer.type", "committer_type"),
      Field("stats.additions", "stats_additions", "int"),
      Field("stats.deletions", "stats_deletions", "int"),
      Field("stats.total", "stats_total", "int"),
      Field("_metadata.links.pull_request_commit_comments.href", "commit_comments_urn"),
      Field("_metadata.links.author.href", "author_urn"),
      Field("_metadata.links.committer.href", "committer_urn"),
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
      Field("payload.pull_request.id", "event_payload_pull_request_id", "int"),
      Field("payload.pull_request.additions", "additions", "int"),
      Field("payload.pull_request.assignee.id", "assignee_id", "int"),
      Field("payload.pull_request.assignee.login", "assignee_login"),
      Field("payload.pull_request.assignee.site_admin", "assignee_site_admin", "bool"),
      Field("payload.pull_request.assignee.type", "assignee_type"),
      Field("payload.pull_request.base.label", "base_label"),
      Field("payload.pull_request.base.ref", "base_ref"),
      Field("payload.pull_request.base.repo.created_at", "base_repo_created_at", "ts"),
      Field("payload.pull_request.base.repo.default_branch", "base_repo_default_branch"),
      Field("payload.pull_request.base.repo.description", "base_repo_description"),
      Field("payload.pull_request.base.repo.fork", "base_repo_fork", "bool"),
      Field("payload.pull_request.base.repo.forks", "base_repo_forks", "int"),
      Field("payload.pull_request.base.repo.forks_count", "base_repo_forks_count", "int"),
      Field("payload.pull_request.base.repo.full_name", "base_repo_full_name"),
      Field("payload.pull_request.base.repo.has_downloads", "base_repo_has_downloads", "bool"),
      Field("payload.pull_request.base.repo.has_issues", "base_repo_has_issues", "bool"),
      Field("payload.pull_request.base.repo.has_pages", "base_repo_has_pages", "bool"),
      Field("payload.pull_request.base.repo.has_wiki", "base_repo_has_wiki", "bool"),
      Field("payload.pull_request.base.repo.homepage", "base_repo_homepage"),
      Field("payload.pull_request.base.repo.id", "base_repo_id", "int"),
      Field("payload.pull_request.base.repo.language", "base_repo_language"),
      Field("payload.pull_request.base.repo.name", "base_repo_name"),
      Field("payload.pull_request.base.repo.open_issues", "base_repo_open_issues", "int"),
      Field("payload.pull_request.base.repo.open_issues_count", "base_repo_open_issues_count", "int"),
      Field("payload.pull_request.base.repo.owner.id", "base_repo_owner_id", "int"),
      Field("payload.pull_request.base.repo.owner.login", "base_repo_owner_login"),
      Field("payload.pull_request.base.repo.owner.site_admin", "base_repo_owner_site_admin", "bool"),
      Field("payload.pull_request.base.repo.owner.type", "base_repo_owner_type"),
      Field("payload.pull_request.base.repo.private", "base_repo_private", "bool"),
      Field("payload.pull_request.base.repo.pushed_at", "base_repo_pushed_at", "ts"),
      Field("payload.pull_request.base.repo.size", "base_repo_size", "int"),
      Field("payload.pull_request.base.repo.stargazers_count", "base_repo_stargazers_count", "int"),
      Field("payload.pull_request.base.repo.updated_at", "base_repo_updated_at", "ts"),
      Field("payload.pull_request.base.repo.watchers", "base_repo_watchers", "int"),
      Field("payload.pull_request.base.repo.watchers_count", "base_repo_watchers_count", "int"),
      Field("payload.pull_request.base.sha", "base_sha"),
      Field("payload.pull_request.base.user.id", "base_user_id", "int"),
      Field("payload.pull_request.base.user.login", "base_user_login"),
      Field("payload.pull_request.base.user.site_admin", "base_user_site_admin", "bool"),
      Field("payload.pull_request.base.user.type", "base_user_type"),
      Field("payload.pull_request.body", "body"),
      Field("payload.pull_request.changed_files", "changed_files", "int"),
      Field("payload.pull_request.closed_at", "closed_at", "ts"),
      Field("payload.pull_request.comments", "comments", "int"),
      Field("payload.pull_request.commits", "commits", "int"),
      Field("payload.pull_request.created_at", "created_at", "ts"),
      Field("payload.pull_request.deletions", "deletions", "int"),
      Field("payload.pull_request.head.label", "head_label"),
      Field("payload.pull_request.head.ref", "head_ref"),
      Field("payload.pull_request.head.repo.created_at", "head_repo_created_at", "ts"),
      Field("payload.pull_request.head.repo.default_branch", "head_repo_default_branch"),
      Field("payload.pull_request.head.repo.description", "head_repo_description"),
      Field("payload.pull_request.head.repo.fork", "head_repo_fork", "bool"),
      Field("payload.pull_request.head.repo.forks", "head_repo_forks", "int"),
      Field("payload.pull_request.head.repo.forks_count", "head_repo_forks_count", "int"),
      Field("payload.pull_request.head.repo.full_name", "head_repo_full_name"),
      Field("payload.pull_request.head.repo.has_downloads", "head_repo_has_downloads", "bool"),
      Field("payload.pull_request.head.repo.has_issues", "head_repo_has_issues", "bool"),
      Field("payload.pull_request.head.repo.has_pages", "head_repo_has_pages", "bool"),
      Field("payload.pull_request.head.repo.has_wiki", "head_repo_has_wiki", "bool"),
      Field("payload.pull_request.head.repo.homepage", "head_repo_homepage"),
      Field("payload.pull_request.head.repo.id", "head_repo_id", "int"),
      Field("payload.pull_request.head.repo.language", "head_repo_language"),
      Field("payload.pull_request.head.repo.name", "head_repo_name"),
      Field("payload.pull_request.head.repo.open_issues", "head_repo_open_issues", "int"),
      Field("payload.pull_request.head.repo.open_issues_count", "head_repo_open_issues_count", "int"),
      Field("payload.pull_request.head.repo.owner.id", "head_repo_owner_id", "int"),
      Field("payload.pull_request.head.repo.owner.login", "head_repo_owner_login"),
      Field("payload.pull_request.head.repo.owner.site_admin", "head_repo_owner_site_admin", "bool"),
      Field("payload.pull_request.head.repo.owner.type", "head_repo_owner_type"),
      Field("payload.pull_request.head.repo.private", "head_repo_private", "bool"),
      Field("payload.pull_request.head.repo.pushed_at", "head_repo_pushed_at", "ts"),
      Field("payload.pull_request.head.repo.size", "head_repo_size", "int"),
      Field("payload.pull_request.head.repo.stargazers_count", "head_repo_stargazers_count", "int"),
      Field("payload.pull_request.head.repo.updated_at", "head_repo_updated_at", "ts"),
      Field("payload.pull_request.head.repo.watchers", "head_repo_watchers", "int"),
      Field("payload.pull_request.head.repo.watchers_count", "head_repo_watchers_count", "int"),
      Field("payload.pull_request.head.sha", "head_sha"),
      Field("payload.pull_request.head.user.id", "head_user_id", "int"),
      Field("payload.pull_request.head.user.login", "head_user_login"),
      Field("payload.pull_request.head.user.site_admin", "head_user_site_admin", "bool"),
      Field("payload.pull_request.head.user.type", "head_user_type"),
      Field("payload.pull_request.locked", "locked", "bool"),
      Field("payload.pull_request.merge_commit_sha", "merge_commit_sha"),
      Field("payload.pull_request.mergeable", "mergeable", "bool"),
      Field("payload.pull_request.mergeable_state", "mergeable_state"),
      Field("payload.pull_request.merged", "merged", "bool"),
      Field("payload.pull_request.merged_at", "merged_at", "ts"),
      Field("payload.pull_request.merged_by.id", "merged_by_id", "int"),
      Field("payload.pull_request.merged_by.login", "merged_by_login"),
      Field("payload.pull_request.merged_by.site_admin", "merged_by_site_admin", "bool"),
      Field("payload.pull_request.merged_by.type", "merged_by_type"),
      Field("payload.pull_request.milestone.closed_at", "milestone_closed_at", "ts"),
      Field("payload.pull_request.milestone.closed_issues", "milestone_closed_issues", "int"),
      Field("payload.pull_request.milestone.created_at", "milestone_created_at", "ts"),
      Field("payload.pull_request.milestone.creator.id", "milestone_creator_id", "int"),
      Field("payload.pull_request.milestone.creator.login", "milestone_creator_login"),
      Field("payload.pull_request.milestone.creator.site_admin", "milestone_creator_site_admin", "bool"),
      Field("payload.pull_request.milestone.creator.type", "milestone_creator_type"),
      Field("payload.pull_request.milestone.description", "milestone_description"),
      Field("payload.pull_request.milestone.due_on", "milestone_due_on", "ts"),
      Field("payload.pull_request.milestone.id", "milestone_id", "int"),
      Field("payload.pull_request.milestone.number", "milestone_number", "int"),
      Field("payload.pull_request.milestone.open_issues", "milestone_open_issues", "int"),
      Field("payload.pull_request.milestone.state", "milestone_state"),
      Field("payload.pull_request.milestone.title", "milestone_title"),
      Field("payload.pull_request.milestone.updated_at", "milestone_updated_at", "ts"),
      Field("payload.pull_request.number", "number", "int"),
      Field("payload.pull_request.review_comments", "review_comments", "int"),
      Field("payload.pull_request.state", "state"),
      Field("payload.pull_request.title", "title"),
      Field("payload.pull_request.updated_at", "updated_at", "ts"),
      Field("payload.pull_request.user.id", "user_id", "int"),
      Field("payload.pull_request.user.login", "user_login"),
      Field("payload.pull_request.user.site_admin", "user_site_admin", "bool"),
      Field("payload.pull_request.user.type", "user_type"),
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
      extraLinks = Seq(("_metadata.links.org.href", "org_urn")),
      requiredLink = Some("_metadata.links.org.href")),
    CollectionSpec("team_members", "members",
      extraLinks = Seq(("_metadata.links.team.href", "team_urn")),
      requiredLink = Some("_metadata.links.team.href"))
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

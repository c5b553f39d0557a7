package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persistent catalog DDL — the reference's database/table surface (S9):
  * `CREATE DATABASE` / `CREATE TABLE` / `DROP TABLE` whose metadata
  * SURVIVES the Spark session (ref `CreateGitHubDataTable.usql:4-12`,
  * `CreateAndInitializeCommit.usql:47` — the U-SQL scripts create a
  * catalog database once and every later job resolves tables by name).
  *
  * Spark's default in-memory catalog loses metadata when the JVM exits,
  * so graft pairs the session catalog with a MANIFEST file at the
  * warehouse root (`_graft_catalog.tsv`: db, table, format, partition
  * columns — locations are derived as `<root>/<db>/<table>`, so the
  * warehouse relocates wholesale). Every DDL call updates BOTH: the
  * session catalog for immediate `spark.sql("SELECT … FROM db.t")`
  * resolution, the manifest for the next session — [[open]] replays it
  * into any fresh session/JVM against the same root. Data and manifest
  * live through the Hadoop FileSystem API, so the warehouse root works
  * on HDFS/S3/ABFS exactly as on local disk; the manifest rewrite is
  * write-temp-then-rename (atomic on directory-rename filesystems).
  * Single-writer DDL is assumed — same as the reference's ADLA catalog
  * scripts, which serialize DDL through job submission.
  *
  * Tables are EXTERNAL (`spark.catalog.createTable` over the parquet
  * location): dropping the catalog entry never deletes data unless
  * `purge = true`. Partitioned tables register their partitions via
  * `recoverPartitions` (MSCK semantics), so partition pruning works
  * through the catalog exactly as through the path API.
  */
object Warehouse {

  final case class Entry(db: String, table: String, format: String,
      partitionCols: Seq[String]) {
    def qualified: String = s"$db.$table"
    def location(root: String): String = s"$root/$db/$table"
  }

  private val ManifestName = "_graft_catalog.tsv"

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** CREATE DATABASE IF NOT EXISTS: a directory under the root plus a
    * session-catalog database so `db.table` names resolve in SQL. */
  def createDatabase(spark: SparkSession, root: String, db: String): Unit = {
    requireIdent(db)
    fs(spark, root).mkdirs(new Path(s"$root/$db"))
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
  }

  /** CREATE TABLE AS SELECT: write `df` as parquet under
    * `<root>/<db>/<table>` (optionally partitioned), record it in the
    * manifest, and register it in the session catalog. `mode` is
    * "overwrite" (TRUNCATE+INSERT parity) or "append". */
  def saveTable(spark: SparkSession, root: String, db: String, name: String,
      df: DataFrame, partitionCols: Seq[String] = Nil,
      mode: String = "overwrite"): Unit = {
    requireIdent(db); requireIdent(name)
    createDatabase(spark, root, db)
    val e = Entry(db, name, "parquet", partitionCols)
    val w = df.write.mode(mode).format("parquet")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .save(e.location(root))
    upsert(spark, root, e)
    register(spark, root, e)
  }

  /** Replay the manifest into THIS session's catalog — the cold-start
    * path: a brand-new session (or JVM) pointed at the same warehouse
    * root sees every table by `db.table` name, then every persisted VIEW
    * (replayed after tables, in creation order, so views over tables —
    * and views over earlier views — resolve). Returns qualified names
    * (tables then views). */
  def open(spark: SparkSession, root: String): Seq[String] = {
    val entries = readManifest(spark, root)
    entries.foreach(register(spark, root, _))
    val views = readViews(spark, root)
    // per-view isolation: a view broken by a later dropTable (its base
    // relation gone) must not abort the replay of every view AFTER it —
    // that left the whole warehouse unusable until the manifest was
    // hand-edited. Broken views are skipped and reported on stderr; the
    // rest of the catalog registers normally.
    val registered = views.flatMap { case (db, name, sql) =>
      try {
        spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
        spark.sql(s"CREATE OR REPLACE VIEW `$db`.`$name` AS $sql")
        Some(s"$db.$name")
      } catch {
        case e: org.apache.spark.sql.AnalysisException =>
          System.err.println(
            s"[warehouse] skipping broken view $db.$name " +
              s"(likely a dropped base relation): ${e.getMessage.linesIterator.next()}")
          None
      }
    }
    entries.map(_.qualified) ++ registered
  }

  /** CREATE VIEW that SURVIVES the session: the view SQL is validated by
    * creating it NOW, then persisted (base64, so arbitrary SQL text is
    * manifest-safe) in `_graft_views.tsv` beside the table manifest;
    * [[open]] replays views after tables in creation order. Views are
    * metadata-only — Catalyst inlines them, so predicates and pruning
    * push through a view exactly as through its definition (the
    * reference's U-SQL VIEW surface, e.g. a masked or filtered
    * projection published under a stable name).
    *
    * Redefining an EXISTING view replaces its SQL IN PLACE in the
    * manifest: [[open]] replays views in manifest order and validates
    * references at creation, so moving a redefined view after its
    * dependents (the old filterNot-then-append) would break cold-start
    * replay whenever a later view references it. Only a genuinely new
    * (db, name) appends. */
  def createView(spark: SparkSession, root: String, db: String,
      name: String, sql: String): Unit = {
    requireIdent(db); requireIdent(name)
    createDatabase(spark, root, db)
    spark.sql(s"CREATE OR REPLACE VIEW `$db`.`$name` AS $sql")
    val views = readViews(spark, root)
    val updated =
      if (views.exists(v => v._1 == db && v._2 == name))
        views.map(v => if (v._1 == db && v._2 == name) (db, name, sql) else v)
      else views :+ ((db, name, sql))
    writeViews(spark, root, updated)
  }

  /** DROP VIEW: session catalog + views manifest. */
  def dropView(spark: SparkSession, root: String, db: String,
      name: String): Unit = {
    requireIdent(db); requireIdent(name)
    spark.sql(s"DROP VIEW IF EXISTS `$db`.`$name`")
    writeViews(spark, root,
      readViews(spark, root).filterNot(v => v._1 == db && v._2 == name))
  }

  /** Persisted views as (db, name, sql), in creation order. */
  def listViews(spark: SparkSession, root: String): Seq[(String, String, String)] =
    readViews(spark, root)

  /** DROP TABLE: removes the catalog entry (session + manifest);
    * `purge = true` also deletes the data directory. */
  def dropTable(spark: SparkSession, root: String, db: String, name: String,
      purge: Boolean = false): Unit = {
    requireIdent(db); requireIdent(name)
    spark.sql(s"DROP TABLE IF EXISTS `$db`.`$name`")
    writeManifest(spark, root,
      readManifest(spark, root).filterNot(e => e.db == db && e.table == name))
    if (purge)
      fs(spark, root).delete(new Path(s"$root/$db/$name"), true)
  }

  /** The manifest's current entries (empty on a fresh root). */
  def listTables(spark: SparkSession, root: String): Seq[Entry] =
    readManifest(spark, root)

  /** ALTER TABLE ... ADD COLUMNS, the additive-evolution half: after new
    * files landed with a WIDER schema (e.g. `saveTable(mode = "append")`
    * with extra columns), re-bind the catalog entry to the
    * footer-merged union schema so `db.table` SQL sees the new columns —
    * old files surface them as nulls (the parquet reader fills missing
    * columns per file once the table schema declares them). Data files
    * are untouched; this is a metadata operation. Renames/retypes are
    * rewrites, not evolution ([[Layout.compact]]).
    *
    * Returns the merged schema. Call again after [[open]] in a fresh
    * session — the manifest stores layout, not schema, so evolution is
    * re-derived from footers (self-healing, never stale). */
  def evolveTable(spark: SparkSession, root: String, db: String,
      name: String): org.apache.spark.sql.types.StructType = {
    requireIdent(db); requireIdent(name)
    val e = readManifest(spark, root)
      .find(x => x.db == db && x.table == name)
      .getOrElse(throw new IllegalArgumentException(
        s"unknown table $db.$name"))
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(e.location(root)).schema
    spark.sql(s"DROP TABLE IF EXISTS `$db`.`$name`")
    spark.catalog.createTable(e.qualified, e.format, merged,
      Map("path" -> e.location(root)))
    if (e.partitionCols.nonEmpty)
      spark.catalog.recoverPartitions(e.qualified)
    merged
  }

  /** ANALYZE TABLE … COMPUTE STATISTICS [FOR COLUMNS …] — feed the
    * cost-based optimizer. Table stats give Catalyst exact row counts
    * (file size alone over-estimates selective scans); column stats add
    * ndv/min/max/null counts, which is what CBO join reordering and
    * stats-based broadcast decisions consume
    * (`spark.sql.cbo.enabled` + `spark.sql.cbo.joinReorder.enabled`).
    * At 100 TB this is the difference between a planned broadcast and a
    * sort-merge join that shuffles the fact table because the planner
    * only had raw file bytes to size a filtered dimension with.
    *
    * Stats live in the catalog entry, so like schema evolution they are
    * per-session state over the manifest-replayed warehouse: re-run
    * after [[open]] in a fresh session (cheap — stats scans are
    * column-pruned aggregates, no shuffle). Returns the recorded
    * (rowCount, sizeInBytes). */
  def analyze(spark: SparkSession, db: String, name: String,
      columns: Seq[String] = Nil): (BigInt, BigInt) = {
    requireIdent(db); requireIdent(name)
    spark.sql(s"ANALYZE TABLE `$db`.`$name` COMPUTE STATISTICS")
    if (columns.nonEmpty)
      spark.sql(s"ANALYZE TABLE `$db`.`$name` COMPUTE STATISTICS " +
        s"FOR COLUMNS ${columns.map(c => s"`$c`").mkString(", ")}")
    val st = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
        name, Some(db))).stats
      .getOrElse(throw new IllegalStateException(
        s"ANALYZE recorded no stats for $db.$name"))
    (st.rowCount.getOrElse(BigInt(-1)), st.sizeInBytes)
  }

  // ------------------------------------------------------------ internals

  private def register(spark: SparkSession, root: String, e: Entry): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `${e.db}`")
    spark.sql(s"DROP TABLE IF EXISTS `${e.db}`.`${e.table}`")
    spark.catalog.createTable(e.qualified, e.location(root), e.format)
    if (e.partitionCols.nonEmpty)
      spark.catalog.recoverPartitions(e.qualified)
  }

  private def upsert(spark: SparkSession, root: String, e: Entry): Unit =
    writeManifest(spark, root,
      readManifest(spark, root)
        .filterNot(x => x.db == e.db && x.table == e.table) :+ e)

  private def readManifest(spark: SparkSession, root: String): Seq[Entry] = {
    val f = fs(spark, root)
    val text = readSmallFile(f, root, ManifestName).getOrElse(return Seq.empty)
    text.linesIterator.filter(_.nonEmpty).map { line =>
      line.split("\t", -1) match {
        case Array(db, t, fmt, parts) =>
          Entry(db, t, fmt,
            if (parts.isEmpty) Nil else parts.split(",").toSeq)
        case other =>
          sys.error(s"malformed catalog line (${other.length} fields): $line")
      }
    }.toSeq
  }

  /** Publish a small manifest file with no catalog-less crash window:
    * stage tmp → rename live aside → rename tmp in → drop the aside copy.
    * The delete-then-rename this replaces had a window where the live
    * file was GONE — and a missing manifest reads as an EMPTY warehouse,
    * so a crash there silently unregistered every table on the next
    * `open()`. Readers fall back to the `.old` aside copy when the live
    * file is missing (the between-renames crash). */
  private def publishFile(f: org.apache.hadoop.fs.FileSystem, root: String,
      name: String, body: String): Unit = {
    val tmp = new Path(s"$root/.$name.tmp")
    val out = f.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val dst = new Path(s"$root/$name")
    val old = new Path(s"$root/.$name.old")
    f.delete(old, false)
    if (f.exists(dst) && !f.rename(dst, old))
      sys.error(s"manifest publish: rename $dst -> $old failed")
    if (!f.rename(tmp, dst)) {
      f.rename(old, dst) // restore
      sys.error(s"manifest publish: rename $tmp -> $dst failed")
    }
    f.delete(old, false)
  }

  /** Read a manifest file, falling back to its `.old` aside copy when
    * the live file is missing (a [[publishFile]] between-renames crash). */
  private def readSmallFile(f: org.apache.hadoop.fs.FileSystem, root: String,
      name: String): Option[String] = {
    val live = new Path(s"$root/$name")
    val p =
      if (f.exists(live)) Some(live)
      else Some(new Path(s"$root/.$name.old")).filter(f.exists)
    p.map { path =>
      val in = f.open(path)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
  }

  private def writeManifest(spark: SparkSession, root: String,
      entries: Seq[Entry]): Unit = {
    val body = entries.sortBy(e => (e.db, e.table)).map { e =>
      s"${e.db}\t${e.table}\t${e.format}\t${e.partitionCols.mkString(",")}"
    }.mkString("", "\n", "\n")
    publishFile(fs(spark, root), root, ManifestName, body)
  }

  private val ViewManifestName = "_graft_views.tsv"

  private def readViews(spark: SparkSession,
      root: String): Seq[(String, String, String)] = {
    val f = fs(spark, root)
    val text = readSmallFile(f, root, ViewManifestName)
      .getOrElse(return Seq.empty)
    text.linesIterator.filter(_.nonEmpty).map { line =>
      line.split("\t", -1) match {
        case Array(db, n, b64) =>
          (db, n, new String(java.util.Base64.getDecoder.decode(b64), "UTF-8"))
        case other =>
          sys.error(s"malformed view line (${other.length} fields): $line")
      }
    }.toSeq
  }

  /** Creation ORDER is preserved (no sort) — replay depends on it for
    * views defined over earlier views. */
  private def writeViews(spark: SparkSession, root: String,
      views: Seq[(String, String, String)]): Unit = {
    val body = views.map { case (db, n, sql) =>
      s"$db\t$n\t${java.util.Base64.getEncoder
        .encodeToString(sql.getBytes("UTF-8"))}"
    }.mkString("", "\n", "\n")
    publishFile(fs(spark, root), root, ViewManifestName, body)
  }

  /** Identifiers flow into SQL and filesystem paths — restrict to the
    * safe charset rather than attempt quoting-based escape. */
  private def requireIdent(s: String): Unit =
    require(s.nonEmpty && s.forall(c => c.isLetterOrDigit || c == '_'),
      s"identifier must be [A-Za-z0-9_]+, got '$s'")
}

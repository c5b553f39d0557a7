package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rule: automatic planning-time file pruning from an external
  * zone map — the Delta/Iceberg stats-in-log behavior on plain parquet,
  * wired into the STANDARD read path.
  *
  * [[graft.core.ZoneMap.readPruned]] is an explicit call; this rule makes
  * the same pruning implicit: when a `Filter` sits over a parquet scan
  * whose root directory carries a `_zonemap` synopsis
  * ([[graft.core.ZoneMap.defaultZonePath]] — underscore-prefixed, so the
  * data scan never sees it), every range/equality conjunct on a mapped
  * column shrinks the scan's file list BEFORE the physical scan is
  * planned. `spark.read.parquet(dir).where(...)` — or any
  * `Tables.table`/`readCurated` read — gets O(matching files) I/O with
  * no API change.
  *
  * Correctness invariants (each spec-asserted):
  *  - the `Filter` is LEFT IN PLACE — straddling files re-filter, so the
  *    result is identical to the unpruned plan on any layout;
  *  - freshness cannot lose rows: survivors = (mapped files whose zones
  *    intersect every extracted band) ∪ (live files ABSENT from the map)
  *    — a file written after the last `refresh` is always scanned;
  *  - only bare `col {=,>,>=,<,<=} literal` conjuncts prune (strict
  *    bounds prune as inclusive — a superset); casts, functions, nulls,
  *    disjunctions and unmapped columns are ignored, never mis-pruned;
  *  - any failure inside the rewrite logs and leaves the plan untouched.
  *
  * Scale: the synopsis read is O(files) metadata rows (the accepted
  * bounded class — same as compaction's listing); at 100 TB it replaces
  * millions of footer opens with one small parquet scan. The rule cannot
  * re-fire on its own output: the rewritten relation's root paths are
  * the surviving FILES, which carry no `_zonemap` beneath them.
  *
  * A directory's `_zonemap` existence is cached for the session
  * (negative results too — a miss only costs pruning, never
  * correctness); [[graft.core.ZoneMap.build]]/`refresh` invalidate the
  * cache in-JVM. Kill switch: `spark.graft.zonemap.enabled=false`. */
object ZoneMapRule extends Rule[LogicalPlan] {

  private val EnabledKey = "spark.graft.zonemap.enabled"

  /** Per-root synopsis cache: None = no `_zonemap` beside the table
    * (negative result — a miss only costs pruning, never correctness);
    * Some(schema, rows) = the COLLECTED stat rows, so repeat plannings
    * of banded queries are driver-local — the optimizer may run this
    * rule several times per query (two operator-optimization batches +
    * AQE replans), and re-reading the synopsis parquet each pass paid
    * footer opens and a collect job for identical input. O(files) rows
    * on the driver — the same bounded class as the collect the rewrite
    * already performs. */
  private val zoneCache = new java.util.concurrent.ConcurrentHashMap[
    String, Option[(org.apache.spark.sql.types.StructType,
      Array[org.apache.spark.sql.Row])]]()

  /** Called by ZoneMap.build/refresh so a newly-written synopsis is seen
    * by this session without a restart. */
  def invalidateCache(): Unit = zoneCache.clear()

  private def zoneStats(root: org.apache.hadoop.fs.Path)
      : Option[(org.apache.spark.sql.types.StructType,
        Array[org.apache.spark.sql.Row])] =
    zoneCache.computeIfAbsent(root.toString, _ => {
      try {
        val zp = new org.apache.hadoop.fs.Path(root, "_zonemap")
        val exists = zp
          .getFileSystem(SparkSession.active.sessionState.newHadoopConf())
          .exists(new org.apache.hadoop.fs.Path(zp, "_SUCCESS"))
        if (!exists) None
        else {
          // glob the part files: handing DataSource the underscore-
          // prefixed dir itself trips its hidden-path filter into a
          // spurious "All paths were ignored" WARN per planning pass
          val zone = SparkSession.active.read.parquet(s"$zp/part-*")
          Some((zone.schema, zone.collect()))
        }
      } catch { case _: Exception => None }
    })

  private def normalize(uri: String): String =
    uri.replaceFirst("^file:/+", "/")

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** (column name, lower bounds, upper bounds) extracted from the
    * prunable conjuncts. Strict bounds are kept as-is and compared
    * inclusively against the zones — a correct superset. */
  private def bands(cond: Expression, mapped: Set[String])
      : Seq[(String, Option[Literal], Option[Literal])] =
    splitConjuncts(cond).flatMap {
      case EqualTo(a: AttributeReference, l: Literal) if ok(a, l, mapped) =>
        Some((a.name.toLowerCase, Some(l), Some(l)))
      case EqualTo(l: Literal, a: AttributeReference) if ok(a, l, mapped) =>
        Some((a.name.toLowerCase, Some(l), Some(l)))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) if ok(a, l, mapped) =>
        Some((a.name.toLowerCase, Some(l), None))
      case GreaterThan(a: AttributeReference, l: Literal) if ok(a, l, mapped) =>
        Some((a.name.toLowerCase, Some(l), None))
      case LessThanOrEqual(a: AttributeReference, l: Literal) if ok(a, l, mapped) =>
        Some((a.name.toLowerCase, None, Some(l)))
      case LessThan(a: AttributeReference, l: Literal) if ok(a, l, mapped) =>
        Some((a.name.toLowerCase, None, Some(l)))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) if ok(a, l, mapped) =>
        Some((a.name.toLowerCase, None, Some(l)))
      case GreaterThan(l: Literal, a: AttributeReference) if ok(a, l, mapped) =>
        Some((a.name.toLowerCase, None, Some(l)))
      case LessThanOrEqual(l: Literal, a: AttributeReference) if ok(a, l, mapped) =>
        Some((a.name.toLowerCase, Some(l), None))
      case LessThan(l: Literal, a: AttributeReference) if ok(a, l, mapped) =>
        Some((a.name.toLowerCase, Some(l), None))
      case _ => None
    }

  private def ok(a: AttributeReference, l: Literal, mapped: Set[String]): Boolean =
    l.value != null && mapped.contains(a.name.toLowerCase) &&
      l.dataType == a.dataType

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return plan
    plan.transformUp {
      case f @ Filter(cond, lr: LogicalRelation) =>
        (lr.relation match {
          case fs: HadoopFsRelation if fs.location.rootPaths.length == 1 =>
            zoneStats(fs.location.rootPaths.head).flatMap { stats =>
              try prune(cond, lr, fs, stats)
              catch { case e: Exception =>
                logWarning(s"zone-map pruning skipped: $e"); None }
            }
          case _ => None
        }).getOrElse(f)
    }
  }

  private def prune(cond: Expression, lr: LogicalRelation,
      fsRel: HadoopFsRelation,
      stats: (org.apache.spark.sql.types.StructType,
        Array[org.apache.spark.sql.Row])): Option[LogicalPlan] = {
    val spark = SparkSession.active
    val root = fsRel.location.rootPaths.head.toString
    val (zoneSchema, zoneRows) = stats
    val mapped: Set[String] = zoneSchema.fieldNames
      .filter(_.endsWith("__min")).map(_.stripSuffix("__min").toLowerCase).toSet
    val bs = bands(cond, mapped)
    if (bs.isEmpty) return None
    // evaluate the zone predicate over the CACHED stat rows, driver-
    // local (no job): per band, pass = max >= lo && min <= hi with SQL
    // null semantics (null stat → null compare → fail → pruned, which
    // is correct for range predicates: an all-null file cannot match).
    // Literal.value is the Catalyst-internal representation (UTF8String,
    // Int days, Long micros) — compare via the type's ordering against
    // the stats, which ZoneMap wrote in the column's own type.
    val fileIdx = zoneSchema.fieldIndex("file")
    def cmp(statVal: Any, l: Literal): Option[Int] =
      if (statVal == null) None
      else Some(org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(l.dataType)
        .compare(org.apache.spark.sql.catalyst.CatalystTypeConverters
          .convertToCatalyst(statVal), l.value))
    val verdicts = zoneRows.map { r =>
      val pass = bs.forall { case (c, lo, hi) =>
        val mx = r.get(zoneSchema.fieldIndex(s"${c}__max"))
        val mn = r.get(zoneSchema.fieldIndex(s"${c}__min"))
        val loOk = lo.forall(l => cmp(mx, l).exists(_ >= 0))
        val hiOk = hi.forall(l => cmp(mn, l).exists(_ <= 0))
        loOk && hiOk
      }
      normalize(r.getString(fileIdx)) -> pass
    }.toMap
    // freshness-safe survivor set: unmapped live files ALWAYS survive
    val inputFiles = fsRel.location.inputFiles
    val survivors = inputFiles.filter { p =>
      verdicts.get(normalize(p)).forall(identity)
    }
    if (survivors.length == inputFiles.length) return None // nothing to prune
    logInfo(s"zone map pruned ${inputFiles.length - survivors.length}/" +
      s"${inputFiles.length} files of $root")
    if (survivors.isEmpty) return Some(Filter(cond, LocalRelation(lr.output)))
    val pruned = spark.read.option("basePath", root)
      .schema(fsRel.dataSchema) // pin the data schema: no footer re-read
      .parquet(survivors.toIndexedSeq: _*)
      .queryExecution.analyzed.collectFirst { case l: LogicalRelation => l }
    pruned.flatMap { nl =>
      // the new relation must expose the SAME columns in the same order
      // (partition columns appended identically) or the exprId graft
      // below would mis-bind — bail out to the unpruned plan otherwise
      val same = nl.output.map(a => (a.name, a.dataType)) ==
        lr.output.map(a => (a.name, a.dataType))
      if (!same) None
      else Some(Filter(cond, nl.copy(output = lr.output)))
    }
  }
}

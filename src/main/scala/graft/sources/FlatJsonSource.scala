package graft.sources

import java.util

import scala.collection.JavaConverters._

import graft.json.Docs
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 implementation of the reference's `FlatJson` extractor
  * (StageData.usql:20-22): newline-delimited JSON files → one row per
  * document with the flattened path→value map (`SqlMap<string, byte[]>`
  * fidelity — dotted object paths, `field[i]` array entries), the
  * path-bound `file_name` virtual column (the `{FileName}` template
  * binding), and `silent: true` semantics (malformed lines are skipped,
  * never failed).
  *
  * ```
  * spark.read.format("flatjson").load("/raw/v1/2024/01/01/&#42;.json")
  * // file_name: string, line_no: bigint, data: map<string,string>
  * ```
  * (the load path is a glob — `&#42;` is a literal star)
  *
  * Spark-first design, not a port: the extractor is a full V2 connector
  * so Catalyst owns the optimization —
  *  - '''column pruning''' reaches the reader ([[FlatJsonScanBuilder]]
  *    implements `SupportsPushDownRequiredColumns`): a query that never
  *    touches `data` skips JSON parsing entirely (file_name/line_no are
  *    metadata);
  *  - '''file pruning''' via filter pushdown: `file_name = 'x'` /
  *    `file_name IN (…)` prune the file list at planning time — the
  *    file-set template scan becomes a directory-listing operation, the
  *    same shape partition pruning gives the parquet staging layer;
  *  - one `InputPartition` per file: at 100 TB the daily file set is
  *    thousands of crawler shards, so parallelism tracks the file count
  *    and each task streams one file (no whole-file buffering).
  *
  * The per-line flatten is [[graft.json.Docs.flatten]] — the same
  * function the staging fidelity mode uses, so both paths agree on the
  * reference's key syntax byte-for-byte.
  */
class FlatJsonSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "flatjson"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FlatJsonTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FlatJsonTable(FlatJsonTable.paths(properties))
}

object FlatJsonTable {
  /** The fixed reader schema. `data` values are the raw JSON scalar texts
    * (never null — null leaves are dropped by the flatten, matching the
    * reference's absent-key semantics). */
  val schema: StructType = StructType(Seq(
    StructField("file_name", StringType, nullable = false),
    StructField("line_no", LongType, nullable = false),
    StructField("data",
      MapType(StringType, StringType, valueContainsNull = false),
      nullable = false)))

  def paths(properties: util.Map[String, String]): Seq[String] =
    StreamListing.parsePaths(properties.asScala.toMap, "flatjson")

  /** Glob-expand on the driver with the session Hadoop conf. */
  def listFiles(paths: Seq[String]): Seq[(String, Long)] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    paths.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      Option(fs.globStatus(path)).toSeq.flatten
        .filter(_.isFile).map(s => (s.getPath.toString, s.getLen))
    }.sortBy(_._1)
  }

  /** The `{FileName}` binding: basename without the .json suffix. */
  def fileNameOf(path: String): String = {
    val base = path.substring(path.lastIndexOf('/') + 1)
    base.stripSuffix(".json")
  }
}

class FlatJsonTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"flatjson(${paths.mkString(",")})"
  override def schema(): StructType = FlatJsonTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FlatJsonScanBuilder(paths)
}

class FlatJsonScanBuilder(paths: Seq[String]) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = FlatJsonTable.schema
  private var fileNameKeep: Option[Set[String]] = None
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** `file_name = v` / `file_name IN (…)` prune the file LIST (exactly —
    * no residual re-evaluation needed); everything else stays with
    * Catalyst. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("file_name", _: String) => true
      case In("file_name", vs) => vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    pushed = accepted
    fileNameKeep = accepted.foldLeft(Option.empty[Set[String]]) { (acc, f) =>
      val vals = f match {
        case EqualTo(_, v: String) => Set(v)
        case In(_, vs) => vs.map(_.asInstanceOf[String]).toSet
        case _ => Set.empty[String]
      }
      Some(acc.fold(vals)(_ intersect vals))
    }
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new FlatJsonScan(paths, required, fileNameKeep)
}

case class FlatJsonInputPartition(path: String, length: Long)
  extends InputPartition

class FlatJsonScan(paths: Seq[String], required: StructType,
    fileNameKeep: Option[Set[String]]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"FlatJson ${paths.mkString(",")} cols=[${required.fieldNames.mkString(",")}]" +
      fileNameKeep.fold("")(k => s" files=[${k.mkString(",")}]")

  override def planInputPartitions(): Array[InputPartition] = {
    val files = FlatJsonTable.listFiles(paths)
    val kept = fileNameKeep.fold(files) { keep =>
      files.filter { case (p, _) => keep(FlatJsonTable.fileNameOf(p)) }
    }
    kept.map { case (p, len) =>
      FlatJsonInputPartition(p, len): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FlatJsonReaderFactory(required)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FlatJsonMicroBatchStream(paths, required, fileNameKeep)
}

/** Offset = exclusive (mtime, path) boundary into the sorted listing —
  * see [[StreamListing]] for why a prefix COUNT was wrong (same-mtime
  * late arrivals shifted the slice: one duplicate + one lost file). */
case class FlatJsonOffset(boundary: StreamListing.Boundary) extends Offset {
  override def json(): String = boundary.json
}

/** Structured Streaming over the crawler feed: `readStream.format
  * ("flatjson")` turns the daily file drops into micro-batches with the
  * SAME schema, flatten, and pushdowns as the batch scan — the
  * `Trigger.AvailableNow` ingest mode SURVEY §1.4 names as the staging
  * extension.
  *
  * Offset model: files sorted by (modification time, path); an offset is
  * an exclusive (mtime, path) BOUNDARY into that listing
  * ([[StreamListing]]). Correct for append-only feeds — the crawler drop
  * pattern (one immutable directory per day) — including same-mtime late
  * arrivals that sort after the boundary; the residual (same mtime,
  * smaller path) window and the mutable-feed case need the
  * seen-files-map bookkeeping of Spark's FileStreamSource, which is out
  * of scope here and part of this connector's contract. */
class FlatJsonMicroBatchStream(paths: Seq[String], required: StructType,
    fileNameKeep: Option[Set[String]]) extends MicroBatchStream {

  private def listing(): Seq[(String, Long, Long)] =
    StreamListing.listed(paths, dirGlob = None)

  override def initialOffset(): Offset = FlatJsonOffset(StreamListing.Start)
  override def latestOffset(): Offset =
    FlatJsonOffset(StreamListing.latest(listing()))
  override def deserializeOffset(json: String): Offset =
    FlatJsonOffset(StreamListing.parse(json, listing()))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val slice = StreamListing.between(listing(),
      start.asInstanceOf[FlatJsonOffset].boundary,
      end.asInstanceOf[FlatJsonOffset].boundary)
    val kept = fileNameKeep.fold(slice) { keep =>
      slice.filter { case (p, _, _) => keep(FlatJsonTable.fileNameOf(p)) }
    }
    kept.map { case (p, _, len) =>
      FlatJsonInputPartition(p, len): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FlatJsonReaderFactory(required)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class FlatJsonReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FlatJsonPartitionReader(
      partition.asInstanceOf[FlatJsonInputPartition], required)
}

/** Streams one file line-by-line; each valid JSON line becomes one row.
  * The validity parse ALWAYS runs — the row set must be identical under
  * any projection (silent-skip is table semantics, not a side effect of
  * reading `data`) — but the map is materialized to Spark's internal
  * format only when `data` is in the required schema. */
class FlatJsonPartitionReader(part: FlatJsonInputPartition,
    required: StructType) extends PartitionReader[InternalRow] {
  private val needData = required.fieldNames.contains("data")
  private val fileName = UTF8String.fromString(
    FlatJsonTable.fileNameOf(part.path))
  private val reader = {
    val path = new Path(part.path)
    // executor-side: default Configuration resolves file:// and any
    // cluster fs configured on the classpath (core-site.xml)
    val fs = path.getFileSystem(new Configuration())
    new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(path),
        java.nio.charset.StandardCharsets.UTF_8))
  }
  private var lineNo = 0L
  private var current: InternalRow = _

  override def next(): Boolean = {
    var line = reader.readLine()
    while (line != null) {
      lineNo += 1
      val row = toRow(line)
      if (row != null) { current = row; return true }
      line = reader.readLine() // silent: skip malformed / blank
    }
    false
  }

  private def toRow(line: String): InternalRow = {
    if (line.trim.isEmpty) return null
    // one definition of the flatten, shared with the flat_json native
    // expression (and therefore the SQL surface); pruned scans still
    // validity-parse but skip the MapData materialization
    val flat = if (needData) {
      graft.functions.FlatJsonMap.compute(UTF8String.fromString(line))
    } else {
      if (Docs.flatten(line) == null) return null else null
    }
    if (needData && flat == null) return null // silent: true
    val values = required.fieldNames.map {
      case "file_name" => fileName
      case "line_no" => java.lang.Long.valueOf(lineNo)
      case "data" => flat
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}

package graft.sources

import java.util

import scala.collection.JavaConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Native Avro DataSource V2 — the format surface the reference's ADLA
  * ecosystem reads/writes interchange feeds in (SURVEY §2.11 residual:
  * the spark-avro MODULE is not bundled in this distribution, but
  * avro-core 1.12 is, so the connector is built directly on the public
  * container-file API; no new dependency).
  *
  * ```
  * df.write.format("graftavro").save("/exchange/day1")
  * spark.read.format("graftavro").load("/exchange/day1")  // or *.avro glob
  * ```
  *
  * Spark-first shape:
  *  - '''schema inference''' opens ONE file header (Avro containers carry
  *    their writer schema; no sampling scan);
  *  - '''column pruning''' reaches the decoder
  *    (`SupportsPushDownRequiredColumns`): non-required fields are never
  *    converted to Catalyst values (the datum is still decoded — Avro's
  *    binary format has no per-field skip index — so pruning saves
  *    conversion and memory, not IO; that IO ceiling is a property of the
  *    format and the reason the warehouse stores parquet and keeps Avro
  *    at the EXCHANGE boundary);
  *  - one `InputPartition` per file: Avro blocks are compressed
  *    per-append, and the crawler-feed pattern is many single-writer
  *    shards, so parallelism tracks the file count exactly like the
  *    flatjson staging scan — at 100 TB the feed is tens of thousands of
  *    shards, not one monolith;
  *  - '''write''' is one container file per task
  *    (`part-NNNNN-uuid.avro`), deflate-compressed, schema derived from
  *    the dataframe — the same layout discipline as Spark's parquet sink,
  *    so downstream globs and listings behave identically.
  *
  * Type mapping (both directions): boolean/int/long/float/double/string/
  * binary 1:1, DATE ↔ `int`+`date`, TIMESTAMP ↔ `long`+`timestamp-micros`, TIMESTAMP_NTZ ↔ `local-timestamp-micros`
  * (exact — Spark's internal value IS epoch micros), ARRAY/MAP(string
  * keys)/STRUCT recursively, `nullable` ↔ `union(null, T)`. DECIMAL and
  * nested unions beyond `[null, T]` are rejected loudly at plan time
  * rather than silently coerced. */
class AvroSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graftavro"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val paths = AvroSourceUtil.paths(options.asScala.toMap)
    val files = AvroSourceUtil.listFiles(paths)
    require(files.nonEmpty, s"graftavro: no .avro files under $paths")
    AvroSourceUtil.toCatalyst(AvroSourceUtil.readWriterSchema(files.head._1))
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AvroTable(AvroSourceUtil.paths(properties.asScala.toMap), schema)
}

object AvroSourceUtil {
  def paths(o: Map[String, String]): Seq[String] =
    StreamListing.parsePaths(o, "graftavro")

  /** Driver-side listing: a directory lists its *.avro children, a glob
    * expands, a file passes through. */
  def listFiles(paths: Seq[String]): Seq[(String, Long)] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    paths.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val expanded =
        if (fs.isDirectory(path)) Option(fs.globStatus(new Path(p, "*.avro")))
        else Option(fs.globStatus(path))
      expanded.toSeq.flatten.filter(_.isFile)
        .map(s => (s.getPath.toString, s.getLen))
    }.sortBy(_._1)
  }

  def readWriterSchema(file: String): Schema = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val in = new FsInput(new Path(file), conf)
    val r = new DataFileReader[GenericRecord](in,
      new GenericDatumReader[GenericRecord]())
    try r.getSchema finally r.close()
  }

  // -- Avro schema → Catalyst ------------------------------------------------

  def toCatalyst(s: Schema): StructType = toCatalystType(s) match {
    case (st: StructType, _) => st
    case (other, _) => throw new IllegalArgumentException(
      s"graftavro: top-level Avro schema must be a record, got $other")
  }

  /** (catalyst type, nullable). Unions beyond [null, T] are rejected. */
  def toCatalystType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      if (s.getLogicalType != null &&
        s.getLogicalType.getName == "date") (DateType, false)
      else (IntegerType, false)
    case Schema.Type.LONG =>
      if (s.getLogicalType == null) (LongType, false)
      else s.getLogicalType.getName match {
        case "timestamp-micros" => (TimestampType, false)
        case "local-timestamp-micros" => (TimestampNTZType, false)
        // the 1000x trap: a millis timestamp silently read as a bare
        // long would be cast to a timestamp 1000x off downstream —
        // reject loudly per the documented contract
        case "timestamp-millis" | "local-timestamp-millis" =>
          throw new IllegalArgumentException(
            "graftavro: timestamp-millis is not supported — rewrite the " +
              "source with timestamp-micros (reading it as a bare long " +
              "would be silently 1000x off)")
        case _ => (LongType, false) // unknown custom logical type: raw long
      }
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.BYTES =>
      // decimal-on-bytes read as raw unscaled big-endian bytes is a
      // silent corruption, not a binary column — reject loudly (the doc
      // promises DECIMAL fails at plan time; only FIXED+decimal did)
      if (s.getLogicalType != null && s.getLogicalType.getName == "decimal")
        throw new IllegalArgumentException(
          "graftavro: DECIMAL (bytes) is not supported — cast to " +
            "DOUBLE/STRING at the producer or read with a full-featured " +
            "Avro connector")
      else (BinaryType, false)
    case Schema.Type.ARRAY =>
      val (et, en) = toCatalystType(s.getElementType)
      (ArrayType(et, containsNull = en), false)
    case Schema.Type.MAP =>
      val (vt, vn) = toCatalystType(s.getValueType)
      (MapType(StringType, vt, valueContainsNull = vn), false)
    case Schema.Type.RECORD =>
      (StructType(s.getFields.asScala.toSeq.map { f =>
        val (t, n) = toCatalystType(f.schema())
        StructField(f.name(), t, nullable = n)
      }), false)
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1 && branches.size <= 2,
        s"graftavro: only [null, T] unions are supported, got $s")
      val (t, _) = toCatalystType(nonNull.head)
      (t, true)
    case other => throw new IllegalArgumentException(
      s"graftavro: unsupported Avro type $other")
  }

  // -- Catalyst → Avro schema ------------------------------------------------

  def toAvro(st: StructType, recordName: String): Schema = {
    val fields = st.fields.map { f =>
      // nested type names carry the FULL PATH (record_field_...): Avro
      // record/array/map names live in one flat namespace, and two
      // same-named struct fields at different nesting (a, b.a) would
      // otherwise both become `a_rec` — Schema.toString then emits the
      // second as a NAME REFERENCE to the first's definition, silently
      // corrupting the written schema. Path-names are unique because
      // field names are unique within each record.
      new Schema.Field(f.name,
        toAvroType(f.dataType, f.nullable, s"${recordName}_${f.name}"),
        null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(recordName, null, "graft", false,
      fields.toSeq.asJava)
  }

  def toAvroType(dt: DataType, nullable: Boolean, name: String): Schema = {
    val base = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case DateType =>
        LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case TimestampType =>
        LogicalTypes.timestampMicros()
          .addToSchema(Schema.create(Schema.Type.LONG))
      case TimestampNTZType =>
        LogicalTypes.localTimestampMicros()
          .addToSchema(Schema.create(Schema.Type.LONG))
      case ArrayType(et, cn) =>
        Schema.createArray(toAvroType(et, cn, s"${name}_item"))
      case MapType(StringType, vt, vn) =>
        Schema.createMap(toAvroType(vt, vn, s"${name}_value"))
      case st: StructType => toAvro(st, s"${name}_rec")
      case other => throw new IllegalArgumentException(
        s"graftavro: cannot write Catalyst type $other (field $name)")
    }
    if (nullable)
      Schema.createUnion(Schema.create(Schema.Type.NULL), base)
    else base
  }

  // -- value conversion ------------------------------------------------------

  /** Avro datum → Catalyst internal value (for the READ path). */
  def toInternal(v: Any, dt: DataType): Any = {
    if (v == null) return null
    dt match {
      case StringType => UTF8String.fromString(v.toString)
      case BinaryType => v match {
        case b: java.nio.ByteBuffer =>
          val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
        case a: Array[Byte] => a
      }
      case DateType => v.asInstanceOf[Number].intValue()
      case TimestampType | TimestampNTZType => v.asInstanceOf[Number].longValue()
      case IntegerType => v.asInstanceOf[Number].intValue()
      case LongType => v.asInstanceOf[Number].longValue()
      case FloatType => v.asInstanceOf[Number].floatValue()
      case DoubleType => v.asInstanceOf[Number].doubleValue()
      case BooleanType => v
      case ArrayType(et, _) =>
        val items = v.asInstanceOf[java.util.Collection[_]].asScala.toArray
        new GenericArrayData(items.map(toInternal(_, et)))
      case MapType(StringType, vt, _) =>
        val m = v.asInstanceOf[java.util.Map[_, _]].asScala.toSeq
        ArrayBasedMapData(
          m.map(e => UTF8String.fromString(e._1.toString)).toArray[Any],
          m.map(e => toInternal(e._2, vt)).toArray[Any])
      case st: StructType =>
        val rec = v.asInstanceOf[GenericRecord]
        new GenericInternalRow(st.fields.map(f =>
          toInternal(rec.get(f.name), f.dataType)).asInstanceOf[Array[Any]])
      case other => throw new IllegalArgumentException(
        s"graftavro: unsupported read type $other")
    }
  }

  /** Catalyst internal value → Avro datum (for the WRITE path). */
  def toDatum(v: Any, dt: DataType, avro: Schema): Any = {
    if (v == null) return null
    val target = // unwrap [null, T]
      if (avro.getType == Schema.Type.UNION)
        avro.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
      else avro
    dt match {
      case StringType => v.toString
      case BinaryType => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case DateType | IntegerType | LongType | TimestampType |
           TimestampNTZType | FloatType | DoubleType | BooleanType => v
      case ArrayType(et, _) =>
        val arr = v.asInstanceOf[ArrayData]
        val out = new java.util.ArrayList[Any](arr.numElements())
        var i = 0
        while (i < arr.numElements()) {
          out.add(toDatum(arr.get(i, et), et, target.getElementType)); i += 1
        }
        out
      case MapType(StringType, vt, _) =>
        val m = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
        val out = new java.util.HashMap[String, Any](m.numElements())
        val ks = m.keyArray(); val vs = m.valueArray()
        var i = 0
        while (i < m.numElements()) {
          out.put(ks.get(i, StringType).toString,
            toDatum(vs.get(i, vt), vt, target.getValueType))
          i += 1
        }
        out
      case st: StructType =>
        val row = v.asInstanceOf[InternalRow]
        val rec = new GenericData.Record(target)
        st.fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name,
            toDatum(row.get(i, f.dataType), f.dataType,
              target.getField(f.name).schema()))
        }
        rec
      case other => throw new IllegalArgumentException(
        s"graftavro: unsupported write type $other")
    }
  }
}

class AvroTable(paths: Seq[String], tableSchema: StructType) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"graftavro(${paths.mkString(",")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(paths, tableSchema)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AvroWriteBuilder(paths, info.schema())
}

class AvroScanBuilder(paths: Seq[String], full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  private var required: StructType = full
  private var countPushed = false
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** COUNT(*) pushdown: an Avro container prefixes every block with its
    * object count, so a global count needs only the block HEADERS — no
    * datum decode, no deflate-decompressed field conversion, one long
    * per block. Partial pushdown (`supportCompletePushDown` default
    * false): each file partition emits its block-count sum and Spark's
    * final aggregate adds them — distributed exactly like the real
    * scan. Grouped or expression-bearing aggregates stay in Spark:
    * blocks carry no per-column statistics (that is parquet's job; this
    * connector guards the EXCHANGE boundary). */
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    val ok = agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall(_.isInstanceOf[
        org.apache.spark.sql.connector.expressions.aggregate.CountStar])
    if (ok) countPushed = true
    ok
  }

  override def build(): Scan =
    if (countPushed) new AvroCountScan(paths) else new AvroScan(paths, required)
}

/** Block-header count scan: one row per container file carrying the sum
  * of its block counts. [[DataFileReader.nextBlock]] advances a whole
  * block without per-record decoding. */
class AvroCountScan(paths: Seq[String]) extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(Seq(StructField("count", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftAvro COUNT(block headers) ${paths.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    AvroSourceUtil.listFiles(paths)
      .map(f => AvroInputPartition(f._1): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition)
          : PartitionReader[InternalRow] =
        new AvroCountReader(p.asInstanceOf[AvroInputPartition])
    }
}

class AvroCountReader(part: AvroInputPartition)
    extends PartitionReader[InternalRow] {
  private var done = false
  override def next(): Boolean = !done
  override def get(): InternalRow = {
    val reader = new DataFileReader[GenericRecord](
      new FsInput(new Path(part.path), new Configuration()),
      new GenericDatumReader[GenericRecord]())
    var total = 0L
    try {
      while (reader.hasNext) {
        total += reader.getBlockCount
        reader.nextBlock() // skip the block wholesale, no datum decode
      }
    } finally reader.close()
    done = true
    new GenericInternalRow(Array[Any](total))
  }
  override def close(): Unit = ()
}

case class AvroInputPartition(path: String) extends InputPartition

class AvroScan(paths: Seq[String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftAvro ${paths.mkString(",")} cols=[${required.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    AvroSourceUtil.listFiles(paths)
      .map(f => AvroInputPartition(f._1): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(required)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new AvroMicroBatchStream(paths, required)
}

/** Offset = exclusive (mtime, path) boundary into the sorted container
  * listing — the shared [[StreamListing]] machinery, same append-only
  * contract (and the same fix: a prefix COUNT both duplicated and lost
  * files on same-mtime late arrivals) as the flatjson stream. */
case class AvroStreamOffset(boundary: StreamListing.Boundary) extends Offset {
  override def json(): String = boundary.json
}

class AvroMicroBatchStream(paths: Seq[String], required: StructType)
    extends MicroBatchStream {
  private def listing(): Seq[(String, Long, Long)] =
    StreamListing.listed(paths, dirGlob = Some("*.avro"))
  override def initialOffset(): Offset = AvroStreamOffset(StreamListing.Start)
  override def latestOffset(): Offset =
    AvroStreamOffset(StreamListing.latest(listing()))
  override def deserializeOffset(json: String): Offset =
    AvroStreamOffset(StreamListing.parse(json, listing()))
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    StreamListing.between(listing(),
        start.asInstanceOf[AvroStreamOffset].boundary,
        end.asInstanceOf[AvroStreamOffset].boundary)
      .map(e => AvroInputPartition(e._1): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(required)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class AvroReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new AvroPartitionReader(p.asInstanceOf[AvroInputPartition], required)
}

class AvroPartitionReader(part: AvroInputPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val reader = {
    val in = new FsInput(new Path(part.path), new Configuration())
    new DataFileReader[GenericRecord](in,
      new GenericDatumReader[GenericRecord]())
  }
  // schema is inferred from ONE file; a later file missing a required
  // field would return null from GenericRecord.get(name), planting nulls
  // in columns the inferred schema declared non-nullable (codegen that
  // trusts nullability then NPEs or mis-reads). Fail LOUDLY at open, per
  // file, naming the field — schema drift across shard drops is a feed
  // bug, not something to paper over with silent nulls.
  locally {
    val fileFields = reader.getSchema.getFields.asScala.map(_.name).toSet
    val missing = required.fieldNames.filterNot(fileFields.contains)
    require(missing.isEmpty,
      s"graftavro: ${part.path} lacks field(s) ${missing.mkString(", ")} " +
        "present in the inferred schema (schema drift across files)")
  }
  private var current: InternalRow = _
  override def next(): Boolean = {
    if (!reader.hasNext) return false
    val rec = reader.next()
    current = new GenericInternalRow(required.fields.map(f =>
      AvroSourceUtil.toInternal(rec.get(f.name), f.dataType))
      .asInstanceOf[Array[Any]])
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}

// -- write side --------------------------------------------------------------

class AvroWriteBuilder(paths: Seq[String], schema: StructType)
    extends WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  // mode("overwrite") arrives as truncate(): the existing container files
  // MUST be deleted before the new tasks write, or a re-export into the
  // same directory silently doubles every row (part names are
  // uuid-unique, so the old files survive any number of overwrites)
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new AvroBatchWrite(paths.head, schema, doTruncate)
  }
}

case class AvroCommitMessage(path: String, rows: Long)
  extends WriterCommitMessage

/** One container file per task under the target directory; commit is the
  * file set itself (tasks write `part-NNNNN-<uuid>.avro` directly — names
  * are unique, so a retried task never collides; an aborted task deletes
  * its own file). At warehouse scale a real sink wants the
  * temporary-dir + rename commit protocol; this connector is the
  * EXCHANGE-boundary writer where single-writer shard directories are the
  * contract, matching the crawler feed layout. */
class AvroBatchWrite(dir: String, schema: StructType,
    truncate: Boolean) extends BatchWrite {
  // file NAMES present before this job's tasks ran (after any truncate):
  // commit() reconciles against this snapshot + the commit messages, so
  // an orphan part file from a task killed before abort(), or a
  // speculative duplicate attempt, is deleted instead of silently read
  // as committed data. Names are uuid-unique, so name-level comparison
  // is exact and immune to scheme differences (file:/ vs bare paths)
  // between driver and executor Path rendering.
  //
  // SINGLE WRITER PER DIRECTORY: the reconciliation makes concurrent
  // jobs appending to the SAME directory mutually destructive (job B's
  // commit would delete job A's files — committed after B's snapshot,
  // absent from B's messages). That is the standard contract for file
  // sinks without a transaction log (Spark's own FileOutputCommitter
  // corrupts under concurrent same-dir writers too); writers needing
  // concurrency should target distinct subdirectories, or publish
  // through [[graft.core.Snapshots]] which serializes by snapshot id.
  private var preExisting: Set[String] = Set.empty
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val fs = new Path(dir).getFileSystem(conf)
    if (truncate && fs.exists(new Path(dir))) {
      Option(fs.globStatus(new Path(dir, "*.avro"))).toSeq.flatten
        .foreach(st => fs.delete(st.getPath, false))
    }
    fs.mkdirs(new Path(dir))
    preExisting = Option(fs.globStatus(new Path(dir, "*.avro"))).toSeq
      .flatten.map(_.getPath.getName).toSet
    new AvroWriterFactory(dir, schema)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // committed = files that existed before the job (append semantics —
    // earlier writes stay) + files the tasks REPORTED. Anything else
    // under the directory is an uncommitted orphan: delete it.
    val committed = preExisting ++ messages.collect {
      case AvroCommitMessage(p, _) => new Path(p).getName
    }
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val fs = new Path(dir).getFileSystem(conf)
    Option(fs.globStatus(new Path(dir, "*.avro"))).toSeq.flatten
      .filterNot(st => committed.contains(st.getPath.getName))
      .foreach(st => fs.delete(st.getPath, false))
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class AvroWriterFactory(dir: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AvroDataWriter(dir, schema, partitionId)
}

class AvroDataWriter(dir: String, schema: StructType, partitionId: Int)
    extends DataWriter[InternalRow] {
  private val avroSchema = AvroSourceUtil.toAvro(schema, "graft_row")
  private val path = new Path(dir,
    f"part-$partitionId%05d-${java.util.UUID.randomUUID()}.avro")
  private val writer = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avroSchema))
    w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
    val fs = path.getFileSystem(new Configuration())
    w.create(avroSchema, fs.create(path, true))
  }
  private var rows = 0L
  override def write(record: InternalRow): Unit = {
    writer.append(AvroSourceUtil.toDatum(record, schema, avroSchema)
      .asInstanceOf[GenericRecord])
    rows += 1
  }
  override def commit(): WriterCommitMessage = {
    writer.close(); AvroCommitMessage(path.toString, rows)
  }
  override def abort(): Unit = {
    writer.close()
    path.getFileSystem(new Configuration()).delete(path, false)
  }
  override def close(): Unit = ()
}

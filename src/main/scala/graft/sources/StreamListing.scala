package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Shared micro-batch listing + offset machinery for the file-drop
  * connectors (`flatjson`, `graftavro`) — one implementation of the
  * contract both streams had hand-rolled (and one place to fix it).
  *
  * Offset = EXCLUSIVE BOUNDARY `(mtime, path)` into the (mtime, path)-
  * sorted listing, NOT a prefix length. The prefix-length spelling had a
  * real loss/duplication window: object stores and HDFS report mtimes at
  * coarse granularity, so a new file can land with an mtime EQUAL to
  * already-processed files; it then sorts into the middle of the
  * listing, and a count-based slice both re-reads one processed file
  * (duplicate rows downstream) and skips the new one (silent loss). With
  * a boundary, "unprocessed" = entries strictly greater than the
  * boundary: a same-granule late arrival sorting AFTER the last
  * processed file is picked up correctly. The residual window — a late
  * arrival with the SAME mtime and a SMALLER path than the boundary — is
  * inherent to any bookkeeping short of Spark's full seen-files map and
  * stays part of the connector contract (append-only feeds whose
  * same-granule drops use ascending names, the crawler shard pattern).
  *
  * Offsets serialize as `{"mtime":N,"path":"..."}`; the legacy
  * `{"fileCount":N}` form (pre-boundary checkpoints) is converted by
  * resolving the Nth prefix of the current listing — the same
  * append-only assumption that form always relied on. */
object StreamListing {

  /** Exclusive high-water mark in (mtime, path) order. */
  final case class Boundary(mtime: Long, path: String) {
    def json: String = s"""{"mtime":$mtime,"path":"${escape(path)}"}"""
    def covers(mtime2: Long, path2: String): Boolean =
      mtime2 < mtime || (mtime2 == mtime && path2 <= path)
  }

  /** Before everything. */
  val Start: Boundary = Boundary(Long.MinValue, "")

  private def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' => sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case o => sb.append(o); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** `(path, mtime, len)` sorted by (mtime, path). `dirGlob` appends a
    * child glob when a listed path is a directory (the graftavro
    * `*.avro` convention); None = paths are globs/files themselves. */
  def listed(paths: Seq[String], dirGlob: Option[String])
      : Seq[(String, Long, Long)] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    paths.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val expanded = dirGlob match {
        case Some(g) if fs.isDirectory(path) =>
          Option(fs.globStatus(new Path(p, g)))
        case _ => Option(fs.globStatus(path))
      }
      expanded.toSeq.flatten.filter(_.isFile)
        .map(s => (s.getPath.toString, s.getModificationTime, s.getLen))
    }.sortBy(s => (s._2, s._1))
  }

  /** The boundary after processing everything currently listed. */
  def latest(listing: Seq[(String, Long, Long)]): Boundary =
    listing.lastOption.map(e => Boundary(e._2, e._1)).getOrElse(Start)

  /** Entries in (start, end] — the micro-batch. */
  def between(listing: Seq[(String, Long, Long)], start: Boundary,
      end: Boundary): Seq[(String, Long, Long)] =
    listing.filter(e =>
      !start.covers(e._2, e._1) && end.covers(e._2, e._1))

  /** Parse either the boundary form or the legacy prefix-count form
    * (converted against the CURRENT listing — append-only contract). */
  def parse(json: String, listing: => Seq[(String, Long, Long)]): Boundary = {
    val m = """"mtime":(-?\d+),"path":"((?:[^"\\]|\\.)*)"""".r
      .findFirstMatchIn(json)
    m.map(x => Boundary(x.group(1).toLong, unescape(x.group(2))))
      .orElse {
        """"fileCount":(\d+)""".r.findFirstMatchIn(json).map { c =>
          val n = c.group(1).toInt
          if (n == 0) Start else latest(listing.take(n))
        }
      }
      .getOrElse(throw new IllegalArgumentException(s"bad offset: $json"))
  }

  /** Shared `path`/`paths` option parsing (both connectors accept the
    * DataFrameReader multi-path JSON-ish list form). */
  def parsePaths(o: Map[String, String], what: String): Seq[String] =
    o.get("paths")
      .map(p => p.stripPrefix("[").stripSuffix("]").split(",")
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq)
      .orElse(o.get("path").map(Seq(_)))
      .getOrElse(throw new IllegalArgumentException(
        s"$what requires a path, e.g. .load(...)"))
}

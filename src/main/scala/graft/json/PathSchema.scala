package graft.json

import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}

/** Builds the pruned nested schema for a parse-once wide projection.
  *
  * A spec with N dotted paths ("author.id", "commit.author.date", …)
  * extracted via `get_json_object` costs N full JSON parses PER ROW —
  * for the reference's widest entities (Event 126, PullRequest 138
  * columns) that is the dominant ETL cost. Assembling the paths into one
  * nested `StructType` and parsing with a single `from_json` brings it
  * to one parse per row; the schema lists only requested subtrees, so
  * Jackson skips everything else.
  *
  * Every leaf is `StringType`: the typed `Get*` contract is per-field
  * null-on-mistype (`try_cast` downstream), and string leaves keep
  * from_json's strictness out of the semantics — a malformed VALUE never
  * nulls its siblings the way a typed from_json leaf can.
  */
object PathSchema {

  private sealed trait Node
  private final case class Branch(children: scala.collection.mutable.LinkedHashMap[String, Node]) extends Node
  private final case class Leaf(dt: DataType) extends Node

  /** Nested StructType covering exactly `paths` (dotted), string leaves.
    * A path that is both a leaf and a prefix of a longer path (rare;
    * e.g. "repo" and "repo.id") keeps only the branch — extracting the
    * shorter path then yields null, which callers relying on whole-object
    * text should not do through this API (use jstr). */
  def forPaths(paths: Seq[String]): StructType =
    forTypedPaths(paths.map(_ -> StringType))

  /** [[forPaths]] with an explicit leaf type per path — lets an array
    * subtree (e.g. "payload.commits" → array<struct<…>>) parse in the
    * same single pass as its sibling scalar paths, instead of the
    * extract-text-then-reparse double parse. */
  def forTypedPaths(paths: Seq[(String, DataType)]): StructType = {
    val root = Branch(scala.collection.mutable.LinkedHashMap.empty)
    paths.foreach { case (p, dt) =>
      var cur = root
      val segs = p.split('.')
      segs.zipWithIndex.foreach { case (s, i) =>
        val last = i == segs.length - 1
        cur.children.get(s) match {
          case Some(b: Branch) if !last => cur = b
          case Some(_: Branch) => // longer path exists; keep branch
          case Some(_: Leaf) if !last =>
            val b = Branch(scala.collection.mutable.LinkedHashMap.empty)
            cur.children(s) = b; cur = b
          case Some(_: Leaf) => // duplicate leaf
          case None =>
            if (last) cur.children(s) = Leaf(dt)
            else {
              val b = Branch(scala.collection.mutable.LinkedHashMap.empty)
              cur.children(s) = b; cur = b
            }
        }
      }
    }
    def toStruct(b: Branch): StructType =
      StructType(b.children.toSeq.map {
        case (name, Leaf(dt)) => StructField(name, dt, nullable = true)
        case (name, br: Branch) => StructField(name, toStruct(br), nullable = true)
      })
    toStruct(root)
  }

  /** Nested field access for a dotted path over a parsed struct column. */
  def at(parsed: org.apache.spark.sql.Column, path: String): org.apache.spark.sql.Column =
    path.split('.').foldLeft(parsed)(_.getField(_))

  /** True when `path` survives as a string leaf in [[forPaths]] (i.e. it
    * is not shadowed by a longer path sharing it as a prefix). */
  def isLeaf(schema: StructType, path: String): Boolean = {
    def walk(dt: DataType, segs: List[String]): Boolean = (dt, segs) match {
      case (s: StructType, h :: t) =>
        s.fields.find(_.name == h).exists(f => walk(f.dataType, t))
      case (StringType, Nil) => true
      case _ => false
    }
    walk(schema, path.split('.').toList)
  }
}

package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, LeafNode, LogicalPlan, Project, Union, Window => WindowPlan}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Column-level lineage from the analyzed logical plan: for every output
  * column, the set of SOURCE columns (leaf-relation attributes) it
  * transitively derives from — the dependency map a governance catalog
  * records (which outputs are tainted by a PII input; what breaks if a
  * source column is dropped).
  *
  * The reference's U-SQL scripts carry this information only implicitly
  * in 3,500 lines of SELECT lists; here it is computed, not documented:
  * walk the plan once, collect every `Alias` definition site
  * (Project / Aggregate / Window emit them), and resolve each output
  * attribute through the alias graph down to leaf attributes. Joins,
  * filters, unions need no special casing — their outputs ARE their
  * children's attributes, which the alias graph already covers.
  *
  * Driver-side metadata walk over the LOGICAL plan — nothing executes,
  * no data moves; cost is plan size, not table size.
  */
object Lineage {

  /** Leaf label: the scan's file path(s) or table name, else the node
    * name — enough to tell two sources apart. */
  private def leafLabel(p: LeafNode): String = p match {
    case r: LogicalRelation =>
      r.relation.toString.takeWhile(_ != '[').trim match {
        case "" => "relation"; case s => s
      }
    case r: DataSourceV2Relation => r.table.name()
    case other => other.nodeName
  }

  /** out column name → set of "leafLabel.columnName" source columns.
    * Constant-only outputs (lit, monotonically_increasing_id) map to the
    * empty set. */
  def columnLineage(df: DataFrame): Map[String, Set[String]] = {
    val plan = df.queryExecution.analyzed
    // every Alias definition anywhere in the plan, by exprId
    val defs = scala.collection.mutable.Map[Long, Expression]()
    def collectDefs(p: LogicalPlan): Unit = {
      val named: Seq[NamedExpression] = p match {
        case pr: Project => pr.projectList
        case ag: Aggregate => ag.aggregateExpressions
        case w: WindowPlan => w.windowExpressions
        case _ => Nil
      }
      named.foreach {
        case a: Alias => defs(a.exprId.id) = a.child
        case _ => ()
      }
      p match {
        // a generator OUTPUT attribute (explode/posexplode/inline) is
        // neither a leaf attribute nor an Alias — without a definition
        // it resolved to the EMPTY set and a column exploded straight
        // out of a PII array was reported clean (a false negative in
        // the taint tool's one job). Every generator output derives
        // from the generator expression.
        case g: Generate =>
          g.generatorOutput.foreach(a => defs(a.exprId.id) = g.generator)
        // Union reuses the FIRST child's exprIds for its output — map
        // each output to the same-position attribute of EVERY branch,
        // or sources feeding only the 2nd+ branch were never reported
        case u: Union =>
          u.output.zipWithIndex.foreach { case (out, i) =>
            val branches = u.children.map(_.output(i))
            defs(out.exprId.id) = org.apache.spark.sql.catalyst.expressions
              .Coalesce(branches)
          }
        case _ => ()
      }
      p.children.foreach(collectDefs)
      p.subqueries.foreach(collectDefs)
    }
    collectDefs(plan)
    // leaf attributes, labelled by their relation
    val leafAttr = scala.collection.mutable.Map[Long, String]()
    plan.foreach {
      case l: LeafNode =>
        val lbl = leafLabel(l)
        l.output.foreach(a => leafAttr(a.exprId.id) = s"$lbl.${a.name}")
      case _ => ()
    }
    def resolve(e: Expression, seen: Set[Long]): Set[String] = e match {
      case a: Attribute =>
        val id = a.exprId.id
        if (seen(id)) Set.empty
        else {
          // BOTH, not either-or: Union reuses its head child's exprIds
          // for its output, so one id can be a leaf attribute (head
          // branch) AND carry a definition spanning the other branches
          val leaf = leafAttr.get(id).toSet
          val viaDef = defs.get(id)
            .map(resolve(_, seen + id)).getOrElse(Set.empty[String])
          leaf ++ viaDef
        }
      case other =>
        other.children.flatMap(resolve(_, seen)).toSet
    }
    plan.output.map(a => a.name -> resolve(a, Set.empty)).toMap
  }

  /** Outputs that depend on any of the given source columns (names as
    * "label.column" suffixes are matched on the column part when no dot
    * is given) — "which report fields are PII-tainted". */
  def taintedBy(df: DataFrame, sourceCols: Seq[String]): Seq[String] = {
    val lin = columnLineage(df)
    lin.collect { case (out, srcs)
      if srcs.exists(s => sourceCols.exists(t =>
        if (t.contains(".")) s == t else s.endsWith("." + t))) => out
    }.toSeq.sorted
  }
}

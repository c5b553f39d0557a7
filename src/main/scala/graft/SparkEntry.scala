package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q1Agg(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.defs ++ graft.queries.Training.defs ++
      graft.queries.StreamingQueries.defs ++ graft.queries.Advanced.defs ++
      graft.queries.Lifecycle.defs ++ graft.queries.Corpus.defs ++
      graft.queries.Graphs.defs ++ graft.queries.Analytics.defs ++
      graft.queries.Mining.defs ++ graft.queries.TpchShapes.defs
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ graft.queries.Training.oracles ++
      graft.queries.StreamingQueries.oracles ++ graft.queries.Advanced.oracles ++
      graft.queries.Lifecycle.oracles ++ graft.queries.Corpus.oracles ++
      graft.queries.Graphs.oracles ++ graft.queries.Analytics.oracles ++
      graft.queries.Mining.oracles ++ graft.queries.TpchShapes.oracles
}

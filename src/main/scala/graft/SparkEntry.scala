package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  type Q = (SparkSession, String) => DataFrame

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The line graph exercises the whole stack: filter DSL → table routing →
    * top-N (+ folding) → aligned buckets → gap fill.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_line")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] =
    graft.queries.Core.defs ++ graft.queries.Flow.defs ++
      graft.queries.Pipeline.defs ++ graft.queries.Extra.defs ++
      graft.queries.Decode.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Core.oracles ++ graft.queries.Flow.oracles ++
      graft.queries.Pipeline.oracles ++ graft.queries.Extra.oracles ++
      graft.queries.Decode.oracles
}

package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator registry: one named entry per implemented
  * operator from SURVEY.md §2, each a function (spark, sfDir) => DataFrame
  * over the harness parquet tables. `oracleSql` carries the DuckDB
  * equivalent for the driver's differential check; entries without oracle
  * SQL (engine-specific sketches, non-SQL plumbing) get a rows-only check.
  */
object SparkEntry {

  /** Registry assembled from the per-family query packs. */
  private val packs: Seq[(String, QU.Q, Option[String])] =
    StarQueries.defs ++ SmtQueries.defs ++ EventQueries.defs ++
      LlmQueries.defs ++ ScalarQueries.defs

  require(packs.map(_._1).distinct.size == packs.size, "duplicate query names")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_flagship")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map { case (n, q, _) => n -> q }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the oracle-checked operator inventory (one entry per
  * SURVEY.md §2 row plus the training-data extension operators);
  * `oracleSql` carries the DuckDB-equivalent SQL for each entry that is
  * SQL-expressible (the rest get the driver's rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all ++ DomainQueries.all ++ ExtensionQueries.all ++
      PipelineQueries.all ++ CurationQueries.all ++ TokenizerQueries.all ++
      SearchQueries.all

  /** Index-LIFECYCLE gates: builders with an eager build/mutate
    * section wrapped in [[graft.queries.Phases]].phase("build") before
    * the probe. Derived from the per-family declarations that sit next
    * to each family's registration map — PhasesSpec enumerates THIS
    * set (build recorded, strictly inside the total, every name
    * registered), so a declaration typo or an unwired gate fails a
    * spec instead of silently losing its bench build/probe split. */
  def lifecycleQueries: Set[String] =
    ExtensionQueries.lifecycle ++ SearchQueries.lifecycle ++
      PipelineQueries.lifecycle ++ CurationQueries.lifecycle ++
      TokenizerQueries.lifecycle

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ DomainQueries.oracles ++
      ExtensionQueries.oracles ++ PipelineQueries.oracles ++
      CurationQueries.oracles ++ TokenizerQueries.oracles ++
      SearchQueries.oracles
}

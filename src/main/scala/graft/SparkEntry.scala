package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All query definitions live in graft.queries.*; each module pairs the
  * Spark implementation with its DuckDB oracle SQL so they evolve together.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The signature ETL chain (parse → dedup-by-key → report agg) as one
    * oracle-gated job — see graft.queries.EtlPipeline (q57). */
  def entry(spark: SparkSession): DataFrame =
    Registry.queries("q57_etl_report")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (ML,
    * sketches) → driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] = Registry.oracles
}

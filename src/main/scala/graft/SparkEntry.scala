package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.queries.* (each built through the graft DSL +
  * compiler); oracle SQL is the DuckDB-equivalent of each.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the TPC-H Q1 pricing summary through the DSL pipeline.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ LLM-pipeline
    * extras).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++ graft.queries.ExtQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys → driver records rows-only checks
    * (non-SQL-expressible ops: hash-family dedup, fingerprints, multimodal).
    */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracle ++ graft.queries.ExtQueries.oracle
}

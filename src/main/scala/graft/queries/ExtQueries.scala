package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** LLM-data-pipeline extension operators (BASELINE.json north-star): dedup,
  * similarity search, text analysis, multimodal plumbing. Filled in by
  * graft.ext.*; starts empty and grows.
  */
object ExtQueries {
  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map()
  val oracle: Map[String, String] = Map()
}

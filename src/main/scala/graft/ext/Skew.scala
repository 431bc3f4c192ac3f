package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation: two-phase salted combine for hot keys. AQE's
  * skew-join handling covers joins; for aggregations whose key distribution
  * is pathological (one user with 10^9 events), the classic fix is an extra
  * deterministic salt level so the hot key's rows spread over `salts`
  * reducers, then a cheap final combine per key. Works for any decomposable
  * aggregate (sum/count/min/max — pass the partial and final forms).
  */
object Skew {

  /** Salted sum: Σ valueCol per key, immune to key skew. The salt derives
    * from row content (xxhash64), not rand() — deterministic replays.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                salts: Int = 16): DataFrame = {
    val salt = pmod(xxhash64(df.columns.map(col): _*), lit(salts)).as("__salt")
    df.select(col("*"), salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Salted count per key. */
  def saltedCount(df: DataFrame, keys: Seq[String], salts: Int = 16): DataFrame = {
    val salt = pmod(xxhash64(df.columns.map(col): _*), lit(salts)).as("__salt")
    df.select(col("*"), salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).cast("long").as("n"))
  }
}

package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support — the co-located-join strategy for repeated big
  * joins at 100 TB: write both sides bucketed (and sorted) by the join key
  * into the warehouse once, and every subsequent equi-join on that key is
  * exchange-free (Spark trusts the on-disk hash layout; with matching
  * bucket counts it can also skip the sort). The write pays one shuffle;
  * every downstream join of the table pays none.
  *
  * This is the persistent analog of the DSL's `:repartitioned` — use it for
  * the fact tables a pipeline joins repeatedly (events×users, lineitem×
  * orders), not for one-shot joins where AQE already picks the right plan.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int): Unit =
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata comes from the catalog —
    * a plain path read would lose it).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}

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

  /** Write `df` as directory-partitioned parquet laid out for 100 TB
    * consumers: one directory per `partitionCols` value (readers touching
    * one partition never list the rest), rows within each file sorted by
    * `sortCols` so parquet row-group min/max statistics prune point and
    * range predicates inside the partition, and files capped at
    * `maxRecordsPerFile` so a skewed partition value still yields
    * parallel-readable, memory-bounded files instead of one giant file.
    *
    * The repartition on the partition columns puts each output partition
    * value on one task (no N-files-per-task explosion: without it, every
    * one of the shuffle's tasks writes a file into every partition
    * directory); sortWithinPartitions then orders rows inside each task's
    * files without a global sort.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String], sortCols: Seq[String],
                       maxRecordsPerFile: Long = 5000000L): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout control: Z-order (Morton) keys and a layout-aware
  * writer. Nothing like it exists in the reference (Kafka topics have no
  * within-partition ordering to exploit — SURVEY §2.1's sources are
  * append logs), but at 100 TB on parquet/ORC the file layout IS the
  * query plan: min/max footer stats prune whole files and row groups, and
  * they only prune if rows that are close in the filter dimensions are
  * close on disk. Sorting by one column clusters that column alone; a
  * Z-order key interleaves the bits of several, so a range predicate on
  * ANY of the dimensions maps to a bounded set of key ranges — multi-
  * dimensional data skipping from one sort.
  *
  * Built on the composition rung of the §7.4 ladder: the key is a tree of
  * built-in shift/mask/or expressions (whole-stage-codegen'd, no UDF, no
  * custom Expression needed) and the writer is `repartitionByRange` +
  * `sortWithinPartitions` + `maxRecordsPerFile` — all existing operators.
  */
object Layout {

  /** Morton key interleaving the low `bits` bits of each dimension:
    * bit `b` of dimension `i` lands at position `b * dims.size + i`.
    * Dimensions must already be bucketed into `[0, 2^bits)` — higher bits
    * are masked off (values alias into the grid), negatives are the
    * caller's bug. `dims.size * bits` must fit a positive long (≤ 63).
    */
  def zorderKey(dims: Seq[Column], bits: Int): Column = {
    val n = dims.size
    require(n >= 1 && bits >= 1 && n * bits <= 63,
      s"need 1 <= dims and dims*bits <= 63, got $n * $bits")
    val longs = dims.map(_.cast("long"))
    val terms = for {
      b <- 0 until bits
      (d, i) <- longs.zipWithIndex
    } yield shiftleft(shiftright(d, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Write `df` as parquet clustered by the Z-order of `dims`: range-
    * partition on the key (contiguous, balanced key ranges per output
    * task — a total order across files, unlike hash repartition), sort
    * within each partition, split files at `maxRecordsPerFile`. Every
    * file then covers a small hyper-rectangle of the dim space, so
    * min/max stats prune on any dimension.
    *
    * At 100 TB: one range exchange (sampled boundaries, AQE-coalesced)
    * plus a per-partition sort that spills — the same cost as any global
    * sort, paid once at write time and amortized over every subsequent
    * selective scan.
    */
  def writeZOrdered(df: DataFrame, dims: Seq[Column], bits: Int,
                    path: String, numFiles: Int,
                    maxRecordsPerFile: Long = 1L << 20): Unit =
    df.withColumn("__zkey", zorderKey(dims, bits))
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
}

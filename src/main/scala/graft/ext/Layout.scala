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

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetBytes` files (computed from the directory's actual on-disk
    * size, floor 1). The remedy for streaming sinks and over-partitioned
    * jobs whose thousands of KB-sized files dominate scan time with open
    * overhead and starve footer pruning. Optional `sortCols` restores
    * clustering while the data is being rewritten anyway (compaction is
    * the natural moment to re-sort).
    *
    * Returns the file count written. Output goes to `outPath` — in-place
    * compaction of a live table needs a transactional table format;
    * write-aside + atomic swap is the honest primitive here.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
              outPath: String, targetBytes: Long,
              sortCols: Seq[Column] = Nil): Int = {
    require(targetBytes >= 1, s"targetBytes must be >= 1")
    val fs = new org.apache.hadoop.fs.Path(inPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // in-place guard: mode("overwrite") DELETES outPath before the lazy
    // read job runs — compact(p, p) would destroy the source outright.
    // Compare fully-qualified paths so "dir", "./dir" and "file:/…/dir"
    // all collide.
    val qIn = fs.makeQualified(new org.apache.hadoop.fs.Path(inPath))
    val qOut = fs.makeQualified(new org.apache.hadoop.fs.Path(outPath))
    require(qIn != qOut,
      s"compact: outPath ($qOut) must differ from inPath — in-place " +
        "compaction needs a transactional table format; write aside, " +
        "then swap")
    val totalBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(inPath)).getLength
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes)
      .toInt
    val df = spark.read.parquet(inPath)
    val laid =
      if (sortCols.nonEmpty)
        df.repartitionByRange(nFiles, sortCols: _*)
          .sortWithinPartitions(sortCols: _*)
      else df.repartition(nFiles)
    laid.write.mode("overwrite").parquet(outPath)
    nFiles
  }

  /** Write parquet with BLOOM FILTERS on the given columns — the
    * point-lookup face of layout: a 100 TB table keyed by doc_id/url
    * hash answers "is this id in this file?" from the footer-adjacent
    * bloom bytes instead of decoding row groups, so needle-in-haystack
    * reads (td retrieval by id, dedup survivor lookups, IQ) touch only
    * the files that might match. `expectedNdv` sizes each filter
    * (Parquet's split-block bloom: ~1 byte/value at the default FPP).
    * Compose with [[zorderKey]]/`repartitionByRange` sorting — min/max
    * pruning handles ranges, blooms handle point probes the sort order
    * cannot.
    */
  def writeBloomIndexed(df: DataFrame, path: String,
                        bloomCols: Seq[String],
                        expectedNdv: Long = 1000000L,
                        numFiles: Int = 0): Unit = {
    require(bloomCols.nonEmpty, "writeBloomIndexed needs bloom columns")
    require(expectedNdv >= 1, s"expectedNdv must be >= 1")
    val missing = bloomCols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"bloom columns not in frame: $missing")
    val laid = if (numFiles >= 1) df.repartition(numFiles) else df
    val opts = bloomCols.flatMap { c =>
      Seq(s"parquet.bloom.filter.enabled#$c" -> "true",
        s"parquet.bloom.filter.expected.ndv#$c" -> expectedNdv.toString)
    }.toMap
    laid.write.mode("overwrite").options(opts).parquet(path)
  }

  /** Per-file manifest of a parquet directory: (file, n_rows, n_bytes) —
    * the integrity/lineage record a training run stores beside its
    * shards (row counts catch truncated writes; byte sizes catch
    * recompression drift). One distributed scan counting rows per
    * `input_file_name`, joined to the filesystem listing (so zero-row
    * files still appear).
    */
  def manifest(spark: org.apache.spark.sql.SparkSession,
               path: String): DataFrame = {
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.toString, s.getLen))
    val sizes = files.toSeq.toDF("file", "n_bytes")
    // join on the basename: input_file_name() renders a file:/// URI,
    // FileStatus.getPath a file:/ one — the path STRINGS differ for the
    // same file
    val base: Column => Column = f => regexp_extract(f, "[^/]+$", 0)
    val rowCounts = spark.read.parquet(path)
      .select(base(input_file_name()).as("__base"))
      .groupBy(col("__base")).agg(count(lit(1)).as("n_rows"))
    sizes.withColumn("__base", base(col("file")))
      .join(rowCounts, Seq("__base"), "left")
      .select(col("file"), coalesce(col("n_rows"), lit(0L)).as("n_rows"),
              col("n_bytes"))
  }
}

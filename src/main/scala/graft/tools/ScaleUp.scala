package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture scale-up: replicate the driver's TPC-H-ish
  * tables `factor`× with shifted keys, so the ENTIRE gate suite and
  * bench can run at 10× data (VERDICT r10 next #1: convert the 100 TB
  * plan-audit arguments into per-query measurements). Correctness is
  * unaffected by the synthesis — the DuckDB oracle runs on the SAME
  * generated parquet, so every gate stays a two-engine cross-check.
  *
  * Shapes preserved per table:
  *  - dimension tables (region, nation) copy as-is — joins stay
  *    broadcastable, exactly like a real 10× corpus;
  *  - fact tables shift every primary AND foreign key by
  *    `copy · (max_key + 1)` so referential integrity holds per copy
  *    and nothing collides across copies;
  *  - `documents.text` for copy k > 0 interleaves each doc's words
  *    with a hash-picked partner doc's words — keeps the token
  *    distribution and length profile without minting 10-way
  *    near-duplicate groups (verbatim replication would quadratically
  *    inflate every pair-mining gate, which is a different pathology —
  *    ScaleSpec's planted mega-bucket rows own that axis);
  *  - `embeddings.embedding` for copy k > 0 rotates the vector by
  *    7k dims — norms and the label structure survive, near-identity
  *    pairs don't replicate.
  *
  * Output: single-file parquet per table (the check_oracle.py / driver
  * contract). Usage:
  *   runMain graft.tools.ScaleUp <srcDir> <outDir> [factor=10]
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scaleAll(spark, src, out, factor)
    spark.stop()
  }

  def scaleAll(spark: SparkSession, src: String, out: String,
               factor: Int): Unit = {
    def rd(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).collect()(0).getLong(0) + 1L

    // dimensions: unchanged
    writeOne(rd("region"), s"$out/region.parquet")
    writeOne(rd("nation"), s"$out/nation.parquet")

    val cust = rd("customer"); val cs = stride(cust, "c_custkey")
    val supp = rd("supplier"); val ss = stride(supp, "s_suppkey")
    val part = rd("part"); val ps = stride(part, "p_partkey")
    val ords = rd("orders"); val os = stride(ords, "o_orderkey")
    val li = rd("lineitem")
    val ev = rd("events")
    val es = stride(ev, "event_id"); val us = stride(ev, "user_id")

    def copies(df: DataFrame)(shift: (DataFrame, Int) => DataFrame) =
      (0 until factor).map(k => shift(df, k)).reduce(_ unionByName _)

    writeOne(copies(cust) { (d, k) =>
      d.withColumn("c_custkey", col("c_custkey") + k * cs)
    }, s"$out/customer.parquet")
    writeOne(copies(supp) { (d, k) =>
      d.withColumn("s_suppkey", col("s_suppkey") + k * ss)
    }, s"$out/supplier.parquet")
    writeOne(copies(part) { (d, k) =>
      d.withColumn("p_partkey", col("p_partkey") + k * ps)
    }, s"$out/part.parquet")
    writeOne(copies(ords) { (d, k) =>
      d.withColumn("o_orderkey", col("o_orderkey") + k * os)
        .withColumn("o_custkey", col("o_custkey") + k * cs)
    }, s"$out/orders.parquet")
    writeOne(copies(li) { (d, k) =>
      d.withColumn("l_orderkey", col("l_orderkey") + k * os)
        .withColumn("l_partkey", col("l_partkey") + k * ps)
        .withColumn("l_suppkey", col("l_suppkey") + k * ss)
    }, s"$out/lineitem.parquet")
    // events stay TIME-ORDERED in the file: the source fixture is, and a
    // naive union of copies rewinds event time at every copy boundary —
    // any watermark-driven replay over the file then measures late-drop,
    // not aggregation (caught by the sf1 streaming-probe sentinel)
    writeOne(copies(ev) { (d, k) =>
      d.withColumn("event_id", col("event_id") + k * es)
        .withColumn("user_id", col("user_id") + k * us)
    }.orderBy(col("ts"), col("event_id")), s"$out/events.parquet")

    // documents: copy 0 verbatim; copy k interleaves words with a
    // hash-offset partner (odd offsets, coprime to any doc count)
    val docs = rd("documents")
    val nd = docs.count()
    val ds = stride(docs, "doc_id")
    val partner = docs.select(col("doc_id").as("p_id"),
      col("text").as("p_text"))
    val docCopies = (0 until factor).map { k =>
      if (k == 0) docs
      else {
        val off = 2L * (k * 1327L % nd) + 1L
        val joined = docs
          .withColumn("p_id", pmod(col("doc_id") + off, lit(nd)))
          .join(partner, Seq("p_id"), "left")
        val merged = array_join(flatten(zip_with(
          split(col("text"), " "),
          split(coalesce(col("p_text"), lit("")), " "),
          (a, b) => array(coalesce(a, lit("")), coalesce(b, lit(""))))),
          " ")
        val cleaned = trim(regexp_replace(merged, " +", " "))
        joined.select(
          (col("doc_id") + k * ds).as("doc_id"),
          cleaned.as("text"),
          col("lang"), col("source"),
          length(cleaned).as("n_chars"))
      }
    }
    writeOne(docCopies.reduce(_ unionByName _), s"$out/documents.parquet")

    // embeddings: rotate by 7k dims per copy
    val emb = rd("embeddings")
    val vs = stride(emb, "vec_id")
    val embCopies = (0 until factor).map { k =>
      if (k == 0) emb
      else {
        val r = (7 * k) % 64
        emb.select((col("vec_id") + k * vs).as("vec_id"),
          concat(slice(col("embedding"), r + 1, 4096),
            slice(col("embedding"), 1, r)).as("embedding"),
          col("label"))
      }
    }
    writeOne(embCopies.reduce(_ unionByName _), s"$out/embeddings.parquet")
    println(s"scaled $src -> $out at ${factor}x")
  }

  /** Write as ONE parquet FILE at `path` (not a directory) — the
    * fixture layout check_oracle.py and the driver read. Row groups are
    * capped at 8 MB so the file stays SPLITTABLE: a single-row-group
    * 100 MB file serializes every scan to one task (measured: the sf1
    * sweep ran single-threaded until this), which is also the property
    * a real 100 TB layout must never have. Readers pair this with
    * `spark.sql.files.maxPartitionBytes` ≈ the row-group size
    * (SPARK_GRAFT_MAX_PARTITION_BYTES in Verify/Bench).
    */
  private def writeOne(df: DataFrame, path: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = path + ".tmpdir"
    df.repartition(1).write.mode("overwrite")
      .option("parquet.block.size", (8L * 1024 * 1024).toString)
      .parquet(tmp)
    val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet") && p.contains("part-"))
    require(part.length == 1, s"expected one part file, got ${part.length}")
    Files.createDirectories(Paths.get(path).getParent)
    Files.move(Paths.get(part(0)), Paths.get(path),
      StandardCopyOption.REPLACE_EXISTING)
    // clean the temp dir (part + _SUCCESS + crc files)
    Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.delete(p))
    println(s"wrote $path")
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis

/** Round-7 additions: BM25 postings partition pruning (VERDICT r6 #1),
  * plus fixes/observability from the r6 advice.
  */
class Round7Spec extends SparkSpecBase {
  import spark.implicits._

  // ---- BM25 term-bucket pruning ----

  test("bm25TermBucket: driver-side bucket matches the engine's column " +
    "for every postings term") {
    val docsDf = spark.read.parquet(s"$sfDir/documents.parquet")
    val idx = TextAnalysis.bm25Index(docsDf, "text", "doc_id")
    val terms = idx.postings.select("term", "tbucket").distinct()
      .collect().map(r => r.getString(0) -> r.getInt(1))
    assert(terms.nonEmpty)
    terms.foreach { case (t, b) =>
      assert(TextAnalysis.bm25TermBucket(t) == b,
        s"bucket mismatch for term '$t'")
    }
    // a term's postings live entirely in one bucket (df-exactness under
    // pruning depends on this)
    val multi = idx.postings.groupBy("term")
      .agg(count_distinct(col("tbucket")).as("nb"))
      .where(col("nb") =!= 1).count()
    assert(multi == 0L)
  }

  test("bm25TopKIndexed over a tbucket-partitioned index: identical " +
    "rows, and the probe's bucket filter reaches PartitionFilters") {
    val docsDf = spark.read.parquet(s"$sfDir/documents.parquet")
    val qs: Seq[(Long, Seq[String])] = Seq(
      0L -> Seq("spark", "table"), 1L -> Seq("hash", "join", "merge"),
      2L -> Seq("zzz_unseen"))
    val inline = TextAnalysis.bm25TopK(docsDf, "text", "doc_id", qs, k = 7)
      .collect().map(_.toSeq).toSet
    graft.ext.OpCaches.releaseAll()
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_bm25_part").toString
    val built = TextAnalysis.bm25Index(docsDf, "text", "doc_id")
    built.postings.write.mode("overwrite").partitionBy("tbucket")
      .parquet(s"$tmp/postings")
    built.meta.write.mode("overwrite").parquet(s"$tmp/meta")
    val idx = TextAnalysis.Bm25Index(
      spark.read.parquet(s"$tmp/postings"),
      spark.read.parquet(s"$tmp/meta"))
    val probe = TextAnalysis.bm25TopKIndexed(idx, qs, k = 7)
    assert(probe.collect().map(_.toSeq).toSet == inline)
    // the pruning must be a PARTITION filter on the postings scan — the
    // ivfTopKPruned pattern: only the queried terms' bucket directories
    // are read
    val scan = probe.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("FileScan"))
      .find(_.contains("postings")).getOrElse("")
    assert(scan.contains("PartitionFilters: [") &&
           scan.replaceAll(".*PartitionFilters", "").contains("tbucket"),
      s"term-bucket filter did not reach the partitioned scan: $scan")
    // and the probed bucket set is a strict subset of all buckets
    val probed = qs.flatMap(_._2).map(TextAnalysis.bm25TermBucket).distinct
    assert(probed.length < TextAnalysis.bm25TermBuckets)
  }
}

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

  // ---- arbitrary-length duplicate substring removal ----

  test("dedupSubstrings: planted Lee-et-al duplicates — embedded passage " +
    "removed at the non-canonical site at any offset, within-doc repeats " +
    "collapse, unique and short docs untouched") {
    import graft.ext.Dedup
    val passage = (1 to 12).map(i => s"p$i").mkString(" ") // 12 tokens
    val corpus = Seq(
      // canonical site: passage at offset 3
      (1L, s"intro a b $passage outro x"),
      // duplicate site: same passage embedded at a DIFFERENT offset in
      // different context (the case dedupSpans' fixed chunk grid misses)
      (2L, s"zz $passage trailing words here"),
      // within-doc repetition: 8-token phrase twice
      (3L, ("q1 q2 q3 q4 q5 q6 q7 q8 mid q1 q2 q3 q4 q5 q6 q7 q8")),
      // unique long doc
      (4L, (1 to 20).map(i => s"u$i").mkString(" ")),
      // too short to carry an 8-token window
      (5L, "tiny doc few words")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSubstrings(corpus, "text", "doc_id", minTokens = 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    // doc 1 is the global keeper (min doc id): fully intact
    assert(out(1L) == (s"intro a b $passage outro x", 0L))
    // doc 2 loses exactly the 12 passage tokens, keeps its own context
    assert(out(2L) == ("zz trailing words here", 12L))
    // doc 3 keeps the first phrase occurrence + the bridge token; the
    // second occurrence is removed (8 tokens)
    assert(out(3L) == ("q1 q2 q3 q4 q5 q6 q7 q8 mid", 8L))
    assert(out(4L)._2 == 0L)
    assert(out(5L) == ("tiny doc few words", 0L))
  }

  test("dedupSubstrings: exact duplicate documents collapse to one " +
    "surviving copy; n_tokens_removed reconciles") {
    import graft.ext.Dedup
    val text = (1 to 15).map(i => s"w$i").mkString(" ")
    val corpus = Seq((10L, text), (11L, text), (12L, text))
      .toDF("doc_id", "text")
    val out = Dedup.dedupSubstrings(corpus, "text", "doc_id", minTokens = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out(0) == ((10L, text, 0L)))
    assert(out(1) == ((11L, "", 15L)))
    assert(out(2) == ((12L, "", 15L)))
  }

  // ---- Bloom-verified incremental dedup ----

  test("incrementalExactBloomVerified ≡ incrementalExact even with a " +
    "saturated filter (false positives re-checked, not dropped)") {
    import graft.ext.Dedup
    val docsDf = spark.read.parquet(s"$sfDir/documents.parquet")
    val inc = docsDf.where(pmod(col("doc_id"), lit(2)) === 1)
    val corpus = docsDf.where(pmod(col("doc_id"), lit(2)) === 0)
    val exact = Dedup.incrementalExact(inc, corpus)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // expectedItems=1 saturates the Bloom: nearly EVERY incoming doc
    // flags, so the whole answer rides on the exact confirm join
    val viaBloom = Dedup.incrementalExactBloomVerified(inc, corpus,
        expectedItems = 1L, fpp = 0.01)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaBloom == exact)
    assert(exact.nonEmpty)
    // and at a sane fpp too
    val sane = Dedup.incrementalExactBloomVerified(inc, corpus, fpp = 0.001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sane == exact)
  }

  // ---- tokenizer decode faces ----

  private val decodeTexts = Seq(
    "the quick brown fox",
    "hello, world! 123 foo-bar",
    "  double  spaces   collapse ",
    "unicode café straße 日本語",
    "",
    "trailing space ",
    "a")

  test("decodeBpe ∘ bpeEncode ≡ pretokNormalize (learned merges)") {
    val docsDf = spark.read.parquet(s"$sfDir/documents.parquet")
    val merges = TextAnalysis.learnBpe(docsDf, "text", numMerges = 12)
    assert(merges.nonEmpty)
    val df = decodeTexts.toDF("t")
    val bad = df.select(
        TextAnalysis.decodeBpe(TextAnalysis.bpeEncode(col("t"), merges))
          .as("dec"),
        TextAnalysis.pretokNormalize(col("t")).as("norm"))
      .where(col("dec") =!= col("norm"))
    assert(bad.count() == 0)
    // and on real corpus text too
    val badCorpus = docsDf.select(
        TextAnalysis.decodeBpe(TextAnalysis.bpeEncode(col("text"), merges))
          .as("dec"),
        TextAnalysis.pretokNormalize(col("text")).as("norm"))
      .where(col("dec") =!= col("norm"))
    assert(badCorpus.count() == 0)
  }

  test("decodeUnigram ∘ unigramEncode ≡ pretokNormalize, and the id lane " +
    "(piecesToIds → idsToPieces → decode) round-trips") {
    val docsDf = spark.read.parquet(s"$sfDir/documents.parquet")
    val vocab = TextAnalysis.learnUnigram(docsDf, "text",
      vocabSize = 80, seedSize = 300, emIters = 1)
    val pieces = vocab.map(_._1)
    val bad = docsDf.select(
        TextAnalysis.unigramEncode(col("text"), vocab).as("enc"),
        TextAnalysis.pretokNormalize(col("text")).as("norm"))
      .select(
        TextAnalysis.decodeUnigram(col("enc")).as("dec"),
        TextAnalysis.decodeIds(
          TextAnalysis.piecesToIds(col("enc"), pieces), pieces).as("decIds"),
        col("norm"))
      .where(col("dec") =!= col("norm") || col("decIds") =!= col("norm"))
    assert(bad.count() == 0)
  }

  test("piecesToIds: unknown piece → -1; idsToPieces: out-of-range id " +
    "fails loud") {
    val vocab = Seq("ab", "c", "d")
    val got = Seq(Tuple1(Seq("c", "ab", "zz")))
      .toDF("p")
      .select(TextAnalysis.piecesToIds(col("p"), vocab).as("ids"))
      .collect()(0).getSeq[Int](0)
    assert(got == Seq(1, 0, -1))
    val err = intercept[Exception] {
      Seq(Tuple1(Seq(5))).toDF("ids")
        .select(TextAnalysis.idsToPieces(col("ids"), vocab))
        .collect()
    }
    assert(err.getMessage.contains("piece id out of range") ||
      Option(err.getCause).exists(_.getMessage
        .contains("piece id out of range")))
  }
}

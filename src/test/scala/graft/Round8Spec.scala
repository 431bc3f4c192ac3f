package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Round-8 additions: the incremental substring-dedup face (VERDICT r7
  * "what's missing" #2 / next #6) and the crafted keeper-contiguity
  * divergence pin for [[graft.ext.Dedup.dedupSubstrings]] (next #5).
  */
class Round8Spec extends SparkSpecBase {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  private def cleaned(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[String]("clean_text"), r.getAs[Long]("n_tokens_removed")))
      .toMap

  // ---- keeper-contiguity divergence (documented approximation) ----

  test("dedupSubstrings tangled overlap: when a passage's windows have " +
    "keepers in THREE different contexts, the per-window keeper rule " +
    "removes every copy of the middle string — the documented " +
    "divergence from the per-passage suffix-array answer") {
    // k=3. doc1 owns window (pa pb pc); doc2 owns (pc pd pe); docs 3+4
    // both carry the full passage "pa pb pc pd pe". Window keepers:
    //   (pa pb pc) -> (1,0)   (pb pc pd) -> (3,1)   (pc pd pe) -> (2,1)
    // In doc3, windows @0 and @2 are removable and their UNION covers
    // all five tokens — including the tokens of doc3's OWN keeper
    // window (pb pc pd). A suffix-array per-passage keeper would leave
    // one contiguous copy of the passage; the per-window rule leaves
    // none (doc3 and doc4 both empty), while the string's content still
    // survives split across doc1 and doc2. Pin exactly that.
    val d = docsDf(
      1L -> "pa pb pc x1 x2",
      2L -> "y1 pc pd pe",
      3L -> "pa pb pc pd pe",
      4L -> "pa pb pc pd pe")
    val out = cleaned(
      Dedup.dedupSubstrings(d, "text", "doc_id", minTokens = 3))
    assert(out(1L) == ("pa pb pc x1 x2", 0L)) // all keepers / unique
    assert(out(2L) == ("y1 pc pd pe", 0L))
    assert(out(3L) == ("", 5L)) // own keeper window's tokens covered
    assert(out(4L) == ("", 5L))
    // the divergence, stated as an assertion: no contiguous copy of the
    // duplicated middle string "pb pc pd" survives anywhere
    assert(!out.values.exists(_._1.contains("pb pc pd")))
  }

  test("dedupSubstrings verbatim duplicates (the mass case): keeper " +
    "sites coincide and the first copy survives contiguously") {
    val d = docsDf(
      1L -> "s1 s2 s3 s4 u1 u2",
      2L -> "v1 s1 s2 s3 s4 v2",
      3L -> "s1 s2 s3 s4 u1 u2")
    val out = cleaned(
      Dedup.dedupSubstrings(d, "text", "doc_id", minTokens = 4))
    assert(out(1L) == ("s1 s2 s3 s4 u1 u2", 0L))
    assert(out(2L) == ("v1 v2", 4L))
    assert(out(3L) == ("", 6L)) // whole-doc duplicate of doc1
  }

  // ---- incremental substring face ----

  test("dedupSubstringsIncremental: corpus-hit passages drop from every " +
    "batch occurrence; batch-only duplicates keep the batch-first copy; " +
    "unique batch docs pass through") {
    val corpus = docsDf(
      100L -> "c1 c2 q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12 c3")
    val batch = docsDf(
      1L -> "f1 f2 q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12 f3",
      2L -> "r1 r2 r3 r4 r5 r6 r7 r8 r9 a1",
      3L -> "b1 r1 r2 r3 r4 r5 r6 r7 r8 r9",
      4L -> "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")
    val out = cleaned(Dedup.dedupSubstringsIncremental(batch,
      Dedup.substringIndex(corpus, "text", minTokens = 8),
      "text", "doc_id", minTokens = 8))
    // doc1: the 12-token passage q1..q12 exists in the corpus -> every
    // covered token drops even though the batch holds a single copy
    assert(out(1L) == ("f1 f2 f3", 12L))
    // docs 2+3 share the batch-only 9-token run r1..r9: doc2 holds the
    // batch-first (min (doc,pos)) windows and survives; doc3 loses them
    assert(out(2L) == ("r1 r2 r3 r4 r5 r6 r7 r8 r9 a1", 0L))
    assert(out(3L) == ("b1", 9L))
    assert(out(4L) == ("u1 u2 u3 u4 u5 u6 u7 u8 u9 u10", 0L))
  }

  test("substringIndex parquet roundtrip: a written index cleans batches " +
    "identically to the inline build, across two successive batches") {
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") < 250)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_substr_idx").toString
    Dedup.substringIndex(corpus, "text", minTokens = 8)
      .write.mode("overwrite").parquet(tmp)
    val idx = spark.read.parquet(tmp)
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
    Seq(
      all.where(col("doc_id") >= 250 && col("doc_id") < 375),
      all.where(col("doc_id") >= 375)
    ).foreach { batch =>
      val viaIdx = cleaned(Dedup.dedupSubstringsIncremental(
        batch, idx, "text", "doc_id", minTokens = 8))
      val inline = cleaned(Dedup.dedupSubstringsIncremental(
        batch, Dedup.substringIndex(corpus, "text", minTokens = 8),
        "text", "doc_id", minTokens = 8))
      assert(viaIdx == inline)
      assert(viaIdx.nonEmpty)
    }
  }

  // ---- data-quality constraint gate ----

  test("checkConstraints: null predicate counts as violation, mixed " +
    "pass/fail report, duplicate rule names rejected, one-scan plan") {
    val df = Seq(
      (1L, "ok", 10),
      (2L, null.asInstanceOf[String], 5),
      (3L, "x", -1)
    ).toDF("id", "s", "v")
    val rep = graft.ext.Pipeline.checkConstraints(df, Seq(
        "s_nonnull" -> col("s").isNotNull,
        // length(null) is null -> must count as a violation, not pass
        "s_short" -> (length(col("s")) <= 2),
        "v_pos" -> (col("v") > 0),
        "id_pos" -> (col("id") > 0)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(rep("s_nonnull") == (3L, 1L, false))
    assert(rep("s_short") == (3L, 1L, false)) // the null row violates
    assert(rep("v_pos") == (3L, 1L, false))
    assert(rep("id_pos") == (3L, 0L, true))
    intercept[IllegalArgumentException] {
      graft.ext.Pipeline.checkConstraints(df,
        Seq("a" -> lit(true), "a" -> lit(false)))
    }
    // all rules ride ONE aggregate: exactly one Exchange in the plan
    val plan = graft.ext.Pipeline.checkConstraints(df, Seq(
        "a" -> col("v").isNotNull, "b" -> (col("v") > 0)))
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1, plan)
  }

  // ---- semantic decontamination ----

  test("contaminationSemantic / decontaminateSemantic: scaled copies " +
    "flag (cosine is scale-invariant), orthogonal eval rows don't, " +
    "threshold respected") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.6f, 0.8f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    // eval 10: a 2x-scaled copy of corpus 1 (paraphrase-with-same-
    // direction — cos exactly 1); eval 11: orthogonal to everything
    val evalSet = Seq(
      (10L, Array(2.0f, 0.0f, 0.0f, 0.0f)),
      (11L, Array(0.0f, 0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val pairs = graft.ext.Pipeline.contaminationSemantic(
        corpus, evalSet, "embedding", "vec_id", threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set(1L -> 10L)) // 3 has cos 0.6 vs eval10 — below t
    val kept = graft.ext.Pipeline.decontaminateSemantic(
        corpus, evalSet, "embedding", "vec_id", threshold = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 4L))
    // a looser threshold pulls in the 0.6-cos neighbor too
    val keptLoose = graft.ext.Pipeline.decontaminateSemantic(
        corpus, evalSet, "embedding", "vec_id", threshold = 0.5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(keptLoose == Set(2L, 4L))
  }

  // ---- PII redaction ----

  test("redactPii / piiCounts: precedence, placeholders, conservative " +
    "over-match, idempotence") {
    val rows = Seq(
      (1L, "mail a.b+c@x-y.example.com now"),
      (2L, "srv 10.0.0.1 bad 999.999.999.999"), // over-match documented
      (3L, "ssn 123-45-6789 tel +491234567890"),
      (4L, "tel 123-456-7890"), // US dashed phone: NOT +international,
                                // and not SSN-shaped -> untouched
      (5L, "plain text no pii 12.3 v1.2.3.4.5"))
    val df = rows.toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        graft.ext.TextAnalysis.redactPii(col("text")).as("r"),
        graft.ext.TextAnalysis.piiCounts(col("text")).as("c"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getStruct(2).toSeq.map(_.asInstanceOf[Long])))
      .toMap
    assert(out(1L) == ("mail <EMAIL> now", Seq(1L, 0L, 0L, 0L)))
    assert(out(2L) == ("srv <IP> bad <IP>", Seq(0L, 2L, 0L, 0L)))
    assert(out(3L) == ("ssn <ID> tel <PHONE>", Seq(0L, 0L, 1L, 1L)))
    assert(out(4L) == ("tel 123-456-7890", Seq(0L, 0L, 0L, 0L)))
    // v1.2.3.4.5: the first four dotted groups ARE an IPv4-shaped match
    // after the 'v' boundary? no — 'v1' makes 1 a non-boundary digit,
    // but 2.3.4.5 has a \b before '2'... conservative scrubbing keeps
    // the document usable either way; pin the actual behavior:
    assert(out(5L)._1 == "plain text no pii 12.3 v1.<IP>")
    assert(out(5L)._2 == Seq(0L, 1L, 0L, 0L))
    // idempotent: placeholders contain no redactable material
    val again = df.select(graft.ext.TextAnalysis.redactPii(
      graft.ext.TextAnalysis.redactPii(col("text"))).as("r2"))
      .collect().map(_.getString(0)).toSet
    assert(again == out.values.map(_._1).toSet)
    // precedence: an email whose local part is all digits never counts
    // as a phone (counted AFTER email redaction)
    val prec = Seq((9L, "+123456789012@num.example.com"))
      .toDF("doc_id", "text")
      .select(graft.ext.TextAnalysis.piiCounts(col("text")).as("c"))
      .collect()(0).getStruct(0).toSeq.map(_.asInstanceOf[Long])
    assert(prec == Seq(1L, 0L, 0L, 0L))
  }

  test("substringIndexAppend: append ≡ rebuild, and the ingest loop " +
    "catches a passage introduced by an earlier batch's survivors") {
    val corpus = docsDf(
      100L -> "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")
    val idx0 = Dedup.substringIndex(corpus, "text", minTokens = 8)
    // batch 1 introduces passage z1..z10 (new to the corpus — survives)
    val b1 = docsDf(1L -> "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")
    val cleaned1 = Dedup.dedupSubstringsIncremental(b1, idx0,
      "text", "doc_id", minTokens = 8)
    assert(cleaned(cleaned1)(1L) ==
      ("z1 z2 z3 z4 z5 z6 z7 z8 z9 z10", 0L))
    val idx1 = Dedup.substringIndexAppend(idx0, cleaned1,
      "clean_text", minTokens = 8)
    // append ≡ rebuild: same window-hash set as indexing the grown corpus
    val rebuilt = Dedup.substringIndex(
      corpus.unionByName(b1), "text", minTokens = 8)
    assert(idx1.collect().map(_.getLong(0)).toSet ==
      rebuilt.collect().map(_.getLong(0)).toSet)
    // batch 2 repeats batch 1's passage: only the APPENDED index drops it
    val b2 = docsDf(2L -> "m1 z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 m2")
    assert(cleaned(Dedup.dedupSubstringsIncremental(b2, idx1,
      "text", "doc_id", minTokens = 8))(2L) == ("m1 m2", 10L))
    assert(cleaned(Dedup.dedupSubstringsIncremental(b2, idx0,
      "text", "doc_id", minTokens = 8))(2L)._2 == 0L) // stale index misses
  }

  test("dedupSubstringsIncrementalBloom ≡ dedupSubstringsIncremental at " +
    "loose AND tight fpp — the prefilter tunes confirm-join traffic, " +
    "never the answer") {
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = all.where(col("doc_id") < 250)
    val batch = all.where(col("doc_id") >= 250)
    val idx = Dedup.substringIndex(corpus, "text", minTokens = 8)
    val exact = cleaned(Dedup.dedupSubstringsIncremental(batch, idx,
      "text", "doc_id", minTokens = 8))
    Seq(0.5, 0.001).foreach { fpp =>
      val viaBloom = cleaned(Dedup.dedupSubstringsIncrementalBloom(
        batch, idx, "text", "doc_id", minTokens = 8, fpp = fpp))
      assert(viaBloom == exact, s"bloom face diverged at fpp=$fpp")
    }
    // Bloom-negative novelty survives: a passage absent from the corpus
    // must pass through even when the filter is tiny and saturated
    val novel = docsDf(9L -> "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10")
    val out = cleaned(Dedup.dedupSubstringsIncrementalBloom(novel, idx,
      "text", "doc_id", minTokens = 8, expectedItems = 100L, fpp = 0.3))
    assert(out(9L) == ("n1 n2 n3 n4 n5 n6 n7 n8 n9 n10", 0L))
  }

  test("streaming ingest loop: foreachBatch cleans each micro-batch " +
    "against the standing index and appends survivors — a passage " +
    "surviving batch 1 is dropped when batch 2 repeats it") {
    val corpus = docsDf(
      100L -> "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")
    @volatile var idx = Dedup.substringIndex(corpus, "text", minTokens = 8)
      .localCheckpoint(true)
    val results = scala.collection.concurrent.TrieMap[Long, (String, Long)]()
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // materialize the cleaned batch BEFORE mutating the index handle
        // (the clean of batch N must see the index as of batch N-1)
        val cl = Dedup.dedupSubstringsIncremental(batch, idx,
          "text", "doc_id", minTokens = 8).localCheckpoint(true)
        cl.collect().foreach(r => results(r.getAs[Long]("doc_id")) =
          (r.getAs[String]("clean_text"), r.getAs[Long]("n_tokens_removed")))
        idx = Dedup.substringIndexAppend(idx, cl, "clean_text",
          minTokens = 8).localCheckpoint(true)
        ()
      }
      .start()
    try {
      // batch 1: one corpus-hit doc, one novel-passage doc
      ms.addData(
        (1L, "a1 c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 a2"),
        (2L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"))
      q.processAllAvailable()
      // batch 2 repeats batch 1's novel passage — only the appended
      // index knows it
      ms.addData((3L, "m1 z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 m2"))
      q.processAllAvailable()
    } finally q.stop()
    assert(results(1L) == ("a1 a2", 10L))
    assert(results(2L) == ("z1 z2 z3 z4 z5 z6 z7 z8 z9 z10", 0L))
    assert(results(3L) == ("m1 m2", 10L))
  }

  test("incremental ≡ batch dedupSubstrings restricted to the batch when " +
    "corpus ids precede batch ids (the ingest-order keeper convention " +
    "coincides with the global min-(doc,pos) keeper)") {
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = all.where(col("doc_id") < 250)
    val batch = all.where(col("doc_id") >= 250)
    val incr = cleaned(Dedup.dedupSubstringsIncremental(batch,
      Dedup.substringIndex(corpus, "text", minTokens = 8),
      "text", "doc_id", minTokens = 8))
    val full = cleaned(Dedup.dedupSubstrings(all, "text", "doc_id",
        minTokens = 8)
      .where(col("doc_id") >= 250))
    assert(incr == full)
    assert(incr.size == batch.count())
  }
}

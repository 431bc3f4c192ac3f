package graft

import org.apache.spark.sql.functions._
import graft.ext.EvalMetrics

/** Round 10d: reference-vs-candidate eval metrics — ROUGE-N clipping,
  * corpus BLEU components, brevity penalty, codegen participation.
  */
class Round10dSpec extends SparkSpecBase {
  import spark.implicits._

  test("rougeN: hand-computed bigram example with clipping — a " +
    "candidate repeating one reference bigram gets credit once per " +
    "reference occurrence") {
    // ref bigrams: [the cat, cat sat, sat down] (each ×1)
    // cand bigrams: [the cat, cat the, the cat] → clipped match = 1
    val df = Seq((1L, "the cat sat down", "the cat the cat"))
      .toDF("id", "ref", "cand")
    val r = EvalMetrics.rougeN(df, "id", "ref", "cand", n = 2).collect()(0)
    assert(r.getLong(1) == 4 && r.getLong(2) == 4) // token counts
    assert(r.getLong(3) == 1L, s"clipped overlap ${r.getLong(3)}")
    assert(r.getLong(4) == 333333L, s"p_ppm ${r.getLong(4)}")  // 1/3
    assert(r.getLong(5) == 333333L, s"r_ppm ${r.getLong(5)}")  // 1/3
    assert(r.getLong(6) == 333333L, s"f1_ppm ${r.getLong(6)}") // 2/6
  }

  test("rougeN: identical texts score exactly 10^6 ppm on P, R and F1; " +
    "an empty candidate scores 0, not NULL") {
    val df = Seq((1L, "a b c d e", "a b c d e"),
                 (2L, "a b c d e", "")).toDF("id", "ref", "cand")
    val out = EvalMetrics.rougeN(df, "id", "ref", "cand", n = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out(1L) == ((4L, 1000000L, 1000000L, 1000000L)))
    assert(out(2L) == ((0L, 0L, 0L, 0L)))
  }

  test("bleuCorpus: hand-computed components, brevity penalty and " +
    "log-BLEU on a two-pair corpus") {
    // pair 1: ref 6 toks, cand = first 4 → m1=4/4, m2=3/3, m3=2/2, m4=1/1
    // pair 2: ref "x y z w", cand identical → all precisions 1
    val df = Seq(("a b c d e f", "a b c d"),
                 ("x y z w", "x y z w")).toDF("ref", "cand")
    val r = EvalMetrics.bleuCorpus(df, "ref", "cand", maxN = 4).collect()(0)
    val m = r.getValuesMap[Any](r.schema.fieldNames)
    assert(m("n_pairs") == 2L && m("ref_len") == 10L && m("cand_len") == 8L)
    assert(m("m_1") == 8L && m("t_1") == 8L)
    assert(m("m_2") == 6L && m("t_2") == 6L)
    assert(m("m_3") == 4L && m("t_3") == 4L)
    assert(m("m_4") == 2L && m("t_4") == 2L)
    // all precisions exactly 1 → log terms 0; BP = (8-10)*1000 trunc/ 8
    assert(m("bp_milli") == -250L, s"bp ${m("bp_milli")}")
    assert(m("log_bleu_milli") == -250L)
    val b = EvalMetrics.bleuScore(
      EvalMetrics.bleuCorpus(df, "ref", "cand", 4)).collect()(0)
    val bleu = b.getDouble(b.fieldIndex("bleu"))
    assert(math.abs(bleu - math.exp(-0.25)) < 1e-9, s"bleu $bleu")
  }

  test("bleuCorpus: zero matches at any order give NULL log-BLEU " +
    "(corpus log-BLEU is -inf, not a smoothed number)") {
    // 4-token pair with no shared 4-gram anywhere in the corpus
    val df = Seq(("a b c d", "a b c e")).toDF("ref", "cand")
    val r = EvalMetrics.bleuCorpus(df, "ref", "cand", maxN = 4).collect()(0)
    assert(r.getLong(r.fieldIndex("m_4")) == 0L)
    assert(r.isNullAt(r.fieldIndex("log_bleu_milli")))
    val b = EvalMetrics.bleuScore(
      EvalMetrics.bleuCorpus(df, "ref", "cand", 4)).collect()(0)
    assert(b.isNullAt(b.fieldIndex("bleu")))
  }

  test("bleuCorpus: no brevity penalty when the candidate is longer " +
    "than the reference") {
    val df = Seq(("a b c", "a b c d e")).toDF("ref", "cand")
    val r = EvalMetrics.bleuCorpus(df, "ref", "cand", maxN = 1).collect()(0)
    assert(r.getLong(r.fieldIndex("bp_milli")) == 0L)
  }

  test("retrievalMetrics: hand-computed recall/MRR/nDCG at k=3 with " +
    "graded relevance, plus the zero-retrieved and unlabeled-query " +
    "edges") {
    val run = Seq(
      (1L, 9L, 1L), (1L, 2L, 2L), (1L, 1L, 3L), (1L, 8L, 4L),
      (1L, 3L, 5L),
      (2L, 7L, 1L), (2L, 6L, 2L),         // q2 retrieves nothing relevant
      (3L, 4L, 1L)                        // q3 has no labels → absent
    ).toDF("q", "doc", "rank")
    val labels = Seq(
      (1L, 1L, 2L), (1L, 2L, 1L), (1L, 3L, 1L),
      (2L, 5L, 1L)
    ).toDF("q", "doc", "rel")
    val out = EvalMetrics.retrievalMetrics(run, labels,
      "q", "doc", "rank", "rel", k = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L), "driving set = labeled queries")
    val r1 = out(1L)
    assert(r1.getLong(1) == 3L && r1.getLong(2) == 2L) // n_rel, hits
    assert(r1.getLong(3) == 666666L)                   // recall 2/3
    assert(r1.getLong(4) == 500000L)                   // first rel rank 2
    val dcg = math.round(1000000.0 / (math.log(3) / math.log(2))) +
      1000000L // rel1@rank2 + rel2@rank3 (log2(4)=2 → 2e6/2)
    // ideal order [2,1,1]: 2e6/log2(2) + 1e6/log2(3) + 1e6/log2(4)
    val idcg = 2000000L +
      math.round(1000000.0 / (math.log(3) / math.log(2))) + 500000L
    assert(r1.getLong(5) == dcg, s"dcg ${r1.getLong(5)} != $dcg")
    assert(r1.getLong(6) == idcg, s"idcg ${r1.getLong(6)} != $idcg")
    assert(r1.getLong(7) == dcg * 1000000L / idcg)
    val r2 = out(2L)
    assert(r2.getLong(2) == 0L && r2.getLong(3) == 0L &&
      r2.getLong(4) == 0L && r2.getLong(5) == 0L && r2.getLong(7) == 0L)
  }

  test("rougeN runs unchanged on a STREAMING frame (codegen'd narrow " +
    "map, no state) and matches the batch scores per row") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val rows = Seq((1L, "the cat sat down", "the cat the cat"),
      (2L, "a b c d e", "a b c d e"))
    val ms = MemoryStream[(Long, String, String)]
    val q = EvalMetrics.rougeN(ms.toDF().toDF("id", "ref", "cand"),
        "id", "ref", "cand", n = 2)
      .writeStream.format("memory").queryName("rouge_stream")
      .outputMode("append").start()
    try {
      ms.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("rouge_stream").collect()
        .map(r => r.getLong(0) -> r.getLong(6)).toMap
      val want = EvalMetrics.rougeN(rows.toDF("id", "ref", "cand"),
        "id", "ref", "cand", 2).collect()
        .map(r => r.getLong(0) -> r.getLong(6)).toMap
      assert(got == want && got(2L) == 1000000L)
    } finally q.stop()
  }

  test("ngram_overlap participates in whole-stage codegen via the " +
    "static kernel, and the SQL face resolves") {
    val gen = org.apache.spark.sql.execution.debug.codegenString(
      spark.range(2).select(
        graft.functions.VectorFunctions.ngram_overlap(
          concat(lit("a b "), col("id").cast("string")),
          lit("a b c"), 2).as("c"))
        .queryExecution.executedPlan)
    assert(gen.contains("Kernels.ngramOverlapCounts"),
      "ngram_overlap fell out of whole-stage codegen")
    graft.functions.VectorFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT ngram_overlap('the cat sat', 'the cat ran', 2) AS c")
      .collect()(0).getSeq[Long](0)
    // [ref_toks, cand_toks, m1, t1, m2, t2]
    assert(viaSql == Seq(3L, 3L, 2L, 3L, 1L, 2L), viaSql)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis

/** Round 10f: WordPiece tokenizer — greedy longest-match semantics,
  * UNK rules, decode, codegen, SQL face.
  */
class Round10fSpec extends SparkSpecBase {
  import spark.implicits._

  private val vocab = Seq("un", "##aff", "##able", "##ffa", "aff",
    "the", "t", "##h", "##e", "a", "##b", "b")

  private def enc(txt: String, v: Seq[String] = vocab,
                  maxChars: Int = 200): Seq[String] =
    Seq(txt).toDF("t")
      .select(TextAnalysis.wordpieceEncode(col("t"), v,
        maxWordChars = maxChars).as("p"))
      .collect()(0).getSeq[String](0)

  test("wordpieceEncode: the BERT reference example — 'unaffable' " +
    "splits into un ##aff ##able by greedy longest-match") {
    assert(enc("unaffable") == Seq("un", "##aff", "##able"))
  }

  test("wordpieceEncode: greedy prefers the longest match at each " +
    "cursor even when a shorter split would also cover the word") {
    // 'the' matches whole (vs t ##h ##e)
    assert(enc("the") == Seq("the"))
    // 'thea': greedy takes 'the' then needs ##a — absent → whole word
    // UNK, even though t ##h ##e + a-as-##? also fails; UNK is correct
    assert(enc("thea") == Seq("[UNK]"))
  }

  test("wordpieceEncode: unmatchable and over-long words become UNK " +
    "whole; neighbors are unaffected") {
    assert(enc("aff xyz ab") == Seq("aff", "[UNK]", "a", "##b"))
    assert(enc("ab", maxChars = 1) == Seq("[UNK]"))
    assert(enc("a", maxChars = 1) == Seq("a"))
  }

  test("decodeWordpiece inverts UNK-free encodes and renders UNK " +
    "literally") {
    val df = Seq("unaffable the aff").toDF("t")
    val round = df.select(TextAnalysis.decodeWordpiece(
      TextAnalysis.wordpieceEncode(col("t"), vocab)).as("r"))
      .collect()(0).getString(0)
    assert(round == "unaffable the aff")
    assert(Seq("zq").toDF("t").select(TextAnalysis.decodeWordpiece(
      TextAnalysis.wordpieceEncode(col("t"), vocab)).as("r"))
      .collect()(0).getString(0) == "[UNK]")
  }

  test("spanCorrupt: roundtrip reconstruction on every doc, T5 target " +
    "format, deterministic and partition-invariant, salt redraws") {
    val docs = (0 until 300).map(i => (i.toLong,
      (0 until 40).map(j => s"w${(i * 131 + j * 7) % 97}")
        .mkString(" "))).toDF("doc_id", "t")
    def run(salt: String, parts: Int) = graft.ext.Pipeline
      .spanCorrupt(docs.repartition(parts), "doc_id", "t", 0.15, 3, salt)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    val a = run("s1", 1)
    assert(a == run("s1", 7), "not partition-invariant")
    assert(a != run("s2", 1), "salt did not redraw the spans")
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1))
      .toMap
    val rebuilt = graft.ext.Pipeline.spanCorrupt(docs, "doc_id", "t",
        0.15, 3, "s1")
      .select(col("id"), graft.ext.Pipeline.spanUncorrupt(col("input"),
        col("targets")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rebuilt == orig, "roundtrip failed")
    // format: targets always terminate with sentinel n_spans; coverage
    // lands in a loose band around the 15% target over the corpus
    a.values.foreach { case (_, tg, _, _, nSpans) =>
      assert(tg.endsWith(s"<extra_id_$nSpans>"), tg)
    }
    val masked = a.values.map(_._4).sum.toDouble
    val toks = a.values.map(_._3).sum.toDouble
    assert(masked / toks > 0.08 && masked / toks < 0.25,
      s"corpus mask coverage ${masked / toks} outside [0.08, 0.25]")
  }

  test("spanCorrupt edge cases: empty text, single token, and unknown " +
    "sentinels passing through spanUncorrupt") {
    val df = Seq((1L, ""), (2L, "solo")).toDF("doc_id", "t")
    val out = graft.ext.Pipeline.spanCorrupt(df, "doc_id", "t",
        0.15, 3, "s")
      .select(col("id"), col("input"), col("targets"), col("n_tokens"),
        graft.ext.Pipeline.spanUncorrupt(col("input"), col("targets"))
          .as("r"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3), r.getString(4)))
      .toMap
    assert(out(1L)._3 == 0L && out(1L)._4 == "")
    assert(out(2L)._4 == "solo")
    import spark.implicits._
    val pass = Seq(("a <extra_id_9> b", "<extra_id_0>")).toDF("i", "t")
      .select(graft.ext.Pipeline.spanUncorrupt(col("i"), col("t")))
      .collect()(0).getString(0)
    assert(pass == "a <extra_id_9> b", pass)
  }

  test("spanCorrupt runs unchanged on a STREAMING frame (narrow map, " +
    "no state) and matches the batch rewrite per row") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val rows = Seq((1L, "a b c d e f g h i j"),
      (2L, "k l m n o p q r s t"))
    val ms = MemoryStream[(Long, String)]
    val q = graft.ext.Pipeline.spanCorrupt(
        ms.toDF().toDF("doc_id", "t"), "doc_id", "t", 0.3, 2, "s")
      .writeStream.format("memory").queryName("span_stream")
      .outputMode("append").start()
    try {
      ms.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("span_stream").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
      val want = graft.ext.Pipeline.spanCorrupt(
        rows.toDF("doc_id", "t"), "doc_id", "t", 0.3, 2, "s").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
      assert(got == want)
    } finally q.stop()
  }

  test("span_corrupt participates in whole-stage codegen and the SQL " +
    "face resolves") {
    val gen = org.apache.spark.sql.execution.debug.codegenString(
      spark.range(2).select(graft.functions.VectorFunctions.span_corrupt(
        col("id").cast("string"), lit("a b c d e f g h"),
        50000, 3, "s").as("a")).queryExecution.executedPlan)
    assert(gen.contains("Kernels.spanCorrupt"),
      "span_corrupt fell out of whole-stage codegen")
    graft.functions.VectorFunctions.register(spark)
    val viaSql = spark.sql("SELECT span_uncorrupt(" +
      "'a <extra_id_0> d', '<extra_id_0> b c <extra_id_1>') AS r")
      .collect()(0).getString(0)
    assert(viaSql == "a b c d", viaSql)
  }

  test("wordpiece_encode participates in whole-stage codegen and the " +
    "SQL face resolves with a literal array vocabulary") {
    val gen = org.apache.spark.sql.execution.debug.codegenString(
      spark.range(2).select(TextAnalysis.wordpieceEncode(
        concat(lit("the "), col("id").cast("string")), vocab).as("p"))
        .queryExecution.executedPlan)
    assert(gen.contains("Kernels.wordpieceEncode"),
      "wordpiece_encode fell out of whole-stage codegen")
    graft.functions.VectorFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT wordpiece_encode('unaffable', " +
        "array('un','##aff','##able'), '[UNK]', 200) AS p")
      .collect()(0).getSeq[String](0)
    assert(viaSql == Seq("un", "##aff", "##able"), viaSql)
  }
}

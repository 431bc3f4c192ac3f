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

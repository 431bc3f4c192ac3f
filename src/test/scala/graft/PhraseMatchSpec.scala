package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftfn.AhoCorasick
import graft.ext.TextAnalysis

/** Aho-Corasick multi-phrase matcher: automaton vs naive `contains`
  * equivalence, suffix-output emission on nested phrases, overlap
  * handling, and the DataFrame face's codegen path.
  */
class PhraseMatchSpec extends SparkSpecBase {
  import spark.implicits._

  private def naive(text: String, phrases: Seq[String]): Seq[String] =
    phrases.distinct.sorted.filter(text.contains)

  test("matchedIds ≡ naive contains over randomized texts and phrase sets") {
    val rnd = new scala.util.Random(42)
    val vocab = Seq("ab", "abc", "bc", "c", "cab", "ba", "aa", "abab", "x")
    (1 to 200).foreach { _ =>
      val phrases = rnd.shuffle(vocab).take(1 + rnd.nextInt(vocab.size)).toSeq
      val text = Seq.fill(3 + rnd.nextInt(30))(
        "abcx" (rnd.nextInt(4))).mkString
      val ac = new AhoCorasick(phrases)
      val got = ac.matchedIds(text).map(ac.phrases(_)).toSeq
      assert(got == naive(text, phrases), s"text=$text phrases=$phrases")
    }
  }

  test("nested phrases emit via suffix outputs: abc/bc/c all fire on xabc") {
    val ac = new AhoCorasick(Seq("abc", "bc", "c", "zz"))
    assert(ac.matchedIds("xabc").map(ac.phrases(_)).toSeq == Seq("abc", "bc", "c"))
  }

  test("overlapping occurrences count once per phrase; empty text matches nothing") {
    val ac = new AhoCorasick(Seq("aa", "aaa"))
    assert(ac.matchedIds("aaaa").map(ac.phrases(_)).toSeq == Seq("aa", "aaa"))
    assert(ac.matchedIds("").isEmpty)
    assert(ac.matchedIds("b").isEmpty)
  }

  test("duplicate phrases dedup at build; empty phrase and empty list rejected") {
    val ac = new AhoCorasick(Seq("q", "q", "q"))
    assert(ac.phrases.toSeq == Seq("q"))
    intercept[IllegalArgumentException](new AhoCorasick(Seq.empty))
    intercept[IllegalArgumentException](new AhoCorasick(Seq("a", "")))
  }

  test("blocklistPhrases face: sorted distinct matches, null text -> null row") {
    val df = Seq((1L, "the slow query ran a table scan twice: table scan"),
                 (2L, "clean"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.blocklistPhrases(df, "text",
        Seq("table scan", "slow query", "never"))
      .select($"doc_id", $"blocked_phrases", $"n_blocked")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getSeq[String](1)), Option(r.get(2)))).toMap
    assert(out(1L) == (Some(Seq("slow query", "table scan")), Some(2)))
    assert(out(2L) == (Some(Seq.empty[String]), Some(0)))
    assert(out(3L) == (None, None)) // null text propagates through both
  }

  test("expression survives whole-stage codegen over the documents fixture") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val phrases = Seq("slow query", "batch batch", "the quick brown fox")
    val got = TextAnalysis.blocklistPhrases(docs, "text", phrases)
      .agg(sum(when($"n_blocked" > 0, 1).otherwise(0))).as[Long].first()
    val want = docs.where($"text".contains("slow query") ||
        $"text".contains("batch batch")).count()
    assert(got == want)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis

/** Round 10e: Stupid-Backoff trigram LM — every backoff branch
  * hand-computed, fit shape, partition invariance.
  */
class Round10eSpec extends SparkSpecBase {
  import spark.implicits._

  // fit corpus: unigrams a:2 b:2 c:1 d:1 x:1 (N=7); bigrams (a b):2,
  // (b c):1, (c d):1, (b x):1; trigrams (a b c):1, (b c d):1, (a b x):1
  private def lm = TextAnalysis.sbTrigramFit(
    Seq("a b c d", "a b x").toDF("text"), "text")

  private def score(txt: String): (Long, Double) = {
    val r = TextAnalysis.sbScore(Seq((1L, txt)).toDF("id", "text"),
      lm, "text", "id").collect()(0)
    (r.getLong(1), r.getDouble(2))
  }

  test("sbTrigramFit counts all three orders in one table") {
    val m = lm.collect().map(r =>
      (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(m(("a", 1)) == 2L && m(("x", 1)) == 1L)
    assert(m(("a b", 2)) == 2L && m(("b x", 2)) == 1L)
    assert(m(("a b c", 3)) == 1L && m(("b c d", 3)) == 1L)
    assert(m.keys.count(_._2 == 1) == 5)
    assert(lm.where(col("o") === 1).agg(sum("c")).collect()(0)
      .getLong(0) == 7L)
  }

  test("attested trigram scores c123/c12 — 'a b c' gives S = 1/2, " +
    "sb_ppl = 2") {
    assert(score("a b c") == ((1L, 2.0)))
  }

  test("bigram backoff: unseen trigram, attested (w2 w3) gives " +
    "alpha * c23/c2 — 'x a b' gives S = 0.4 * 2/2, sb_ppl = 2.5") {
    assert(score("x a b") == ((1L, 2.5)))
  }

  test("unigram backoff: unseen bigram gives alpha^2 * c3/N — " +
    "'c x d' gives S = 0.16 * 1/7, sb_ppl = 43.75") {
    assert(score("c x d") == ((1L, 43.75)))
  }

  test("OOV floor: an unseen w3 takes the 0.5 pseudo-count — " +
    "'a b zz' gives S = 0.16 * 0.5/7, sb_ppl = 87.5") {
    assert(score("a b zz") == ((1L, 87.5)))
  }

  test("multi-trigram doc averages logs: 'a b c d' gives " +
    "exp(-(ln 0.5 + ln 1)/2) = sqrt(2)") {
    val (n, p) = score("a b c d")
    assert(n == 2L && p == 1.4142, s"($n, $p)")
  }

  test("sbScore is partition-invariant and fluent text scores better " +
    "than shuffled text on the fixture corpus") {
    val dd = spark.read.parquet(s"$sfDir/documents.parquet")
    val model = TextAnalysis.sbTrigramFit(dd, "text")
    val sample = dd.where(col("doc_id") < 40)
    val a = TextAnalysis.sbScore(sample.repartition(1), model,
      "text", "doc_id").collect().map(r => r.getLong(0) -> r.getDouble(2))
      .toMap
    val b = TextAnalysis.sbScore(sample.repartition(7), model,
      "text", "doc_id").collect().map(r => r.getLong(0) -> r.getDouble(2))
      .toMap
    assert(a == b, "partitioning changed sb_ppl")
    // self-scored text hits the trigram branch everywhere → ppl is the
    // geometric mean of attested trigram ratios; reversing the word
    // order destroys most trigrams → strictly worse (higher) score
    val rev = sample.select(col("doc_id"),
      array_join(reverse(filter(split(col("text"), " "),
        w => w =!= "")), " ").as("text"))
    val pRev = TextAnalysis.sbScore(rev, model, "text", "doc_id")
      .agg(avg("sb_ppl")).collect()(0).getDouble(0)
    val pSelf = TextAnalysis.sbScore(sample, model, "text", "doc_id")
      .agg(avg("sb_ppl")).collect()(0).getDouble(0)
    assert(pSelf < pRev, s"fluent $pSelf !< shuffled $pRev")
  }
}

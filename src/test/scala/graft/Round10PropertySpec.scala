package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ext.TextAnalysis

/** Property laws for the round-10 operators, checked against independent
  * in-memory reference implementations over randomized inputs (the
  * PropertySpec house pattern).
  */
class Round10PropertySpec extends SparkSpecBase {

  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(5)
    .withWorkers(1)

  private def holds(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  // ---- redactCreditCards: reference equivalence + idempotence ----

  // texts biased toward digit runs straddling the 13-19 candidate window
  private val ccTextGen: Gen[String] = {
    val word = Gen.oneOf("pay", "ref", "x", "order", ".", "-", "")
    val run = Gen.choose(1, 22).flatMap(n =>
      Gen.listOfN(n, Gen.numChar).map(_.mkString))
    val piece = Gen.frequency(2 -> word, 3 -> run)
    Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, piece))
      .map(_.mkString(" "))
  }

  private def refLuhn(s: String): Boolean = s.nonEmpty && {
    s.reverse.zipWithIndex.map { case (c, i) =>
      val d = c - '0'
      if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
    }.sum % 10 == 0
  }

  private def refRedact(s: String): String =
    """\d+""".r.replaceAllIn(s, m =>
      if (m.matched.length >= 13 && m.matched.length <= 19 &&
          refLuhn(m.matched)) "<CC>" else m.matched)

  test("redactCreditCards: equals an independent regex+fold reference " +
    "on random digit-run texts, and is idempotent") {
    holds(Prop.forAll(Gen.listOfN(12, ccTextGen)) { texts =>
      val out = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
        .select(col("id"),
          TextAnalysis.redactCreditCards(col("t")).as("r1"),
          TextAnalysis.redactCreditCards(
            TextAnalysis.redactCreditCards(col("t"))).as("r2"))
        .collect()
        .map(r => r.getLong(0).toInt -> (r.getString(1), r.getString(2)))
        .toMap
      texts.indices.forall { i =>
        val (r1, r2) = out(i)
        r1 == refRedact(texts(i)) && r2 == r1 // idempotent: <CC> has no digits
      }
    })
  }
}

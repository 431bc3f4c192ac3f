package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ext.{Labels, Pipeline}

/** Property laws for the round-9 operators, checked against independent
  * in-memory reference implementations over randomized inputs (the
  * PropertySpec house pattern).
  */
class Round9PropertySpec extends SparkSpecBase {

  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(5)
    .withWorkers(1)

  private def holds(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  // ---- corpusDigest: equality ⟺ row-multiset equality ----

  private val rowGen: Gen[(Long, String)] = for {
    id <- Gen.choose(0L, 6L)
    s <- Gen.oneOf("x", "y", "", "zz")
  } yield (id, s)

  private val corpusGen: Gen[List[(Long, String)]] =
    Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, rowGen))

  private def digest(rows: Seq[(Long, String)]): (Long, Long, BigInt) = {
    val r = Pipeline.corpusDigest(rows.toDF("id", "s").repartition(3),
      Seq("id", "s")).collect()(0)
    (r.getAs[Long]("n_rows"), r.getAs[Long]("xor_h"),
      BigInt(r.getAs[Long]("sum_h_hi")) * BigInt(Pipeline.DigestSplitBase) +
        BigInt(r.getAs[Long]("sum_h_lo")))
  }

  test("corpusDigest: digests are equal exactly when the row MULTISETS " +
    "are equal, for random small corpora and any row order") {
    holds(Prop.forAll(corpusGen, corpusGen) { (a, b) =>
      val sameMultiset =
        a.groupBy(identity).view.mapValues(_.size).toMap ==
          b.groupBy(identity).view.mapValues(_.size).toMap
      val da = digest(scala.util.Random.shuffle(a))
      val db = digest(b)
      // multiset equality ⇒ digest equality is the exact law; the
      // converse is collision-bounded (2^60 hash + count + exact sum —
      // no counterexample can exist in this tiny value domain)
      (da == db) == sameMultiset
    })
  }

  // ---- dawidSkene: equivariant under monotone label renaming ----

  private val annGen: Gen[List[(Long, Long, Long)]] = for {
    nItems <- Gen.choose(2, 8)
    nAnn <- Gen.choose(2, 4)
    labels <- Gen.listOfN(nItems * nAnn, Gen.choose(0L, 2L))
  } yield {
    (for { i <- 0 until nItems; a <- 0 until nAnn }
      yield (i.toLong, a.toLong,
        labels(i * nAnn + a))).toList
  }

  test("dawidSkene: renaming labels by a strictly increasing map " +
    "renames the output labels identically (scores unchanged) — the " +
    "min-label tie-break is the only order dependence") {
    holds(Prop.forAll(annGen) { ann =>
      val f = (l: Long) => l * 7 + 3 // strictly increasing on 0..2
      val base = Labels.dawidSkene(
        ann.toDF("item", "annotator", "label"), iters = 2)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      val renamed = Labels.dawidSkene(
        ann.map { case (i, a, l) => (i, a, f(l)) }
          .toDF("item", "annotator", "label"), iters = 2)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      base.keySet == renamed.keySet &&
        base.forall { case (i, (l, s)) => renamed(i) == ((f(l), s)) }
    })
  }
}

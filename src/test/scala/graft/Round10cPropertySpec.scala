package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ext.{EvalMetrics, Stats}

/** Property laws for the round-10c/10d operators, checked against
  * independent in-memory reference implementations over randomized
  * inputs (the PropertySpec house pattern).
  */
class Round10cPropertySpec extends SparkSpecBase {

  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(5)
    .withWorkers(1)

  private def holds(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  private val samplesGen: Gen[(List[Long], List[Long])] = for {
    na <- Gen.choose(1, 40)
    nb <- Gen.choose(1, 40)
    a <- Gen.listOfN(na, Gen.choose(0L, 25L))
    b <- Gen.listOfN(nb, Gen.choose(0L, 25L))
  } yield (a, b)

  test("ksTest law: d_ppm equals the brute-force max ECDF gap over " +
    "all observed values, for arbitrary tied samples") {
    holds(Prop.forAll(samplesGen) { case (a, b) =>
      val df = (a.map((_, "a")) ++ b.map((_, "b"))).toDF("v", "side")
      val r = Stats.ksTest(df, "v", "side", "a", "b").collect()(0)
      val vals = (a ++ b).distinct.sorted
      val gaps = vals.map(v => math.abs(
        a.count(_ <= v).toLong * b.size - b.count(_ <= v).toLong * a.size))
      r.getLong(2) == gaps.max * 1000000L / (a.size.toLong * b.size)
    })
  }

  test("mannWhitneyU law: u_a_x2 equals the doubled brute-force pair " +
    "count 2·(#(a>b) + ½·#(a=b)), plus conservation") {
    holds(Prop.forAll(samplesGen) { case (a, b) =>
      val df = (a.map((_, "a")) ++ b.map((_, "b"))).toDF("v", "side")
      val r = Stats.mannWhitneyU(df, "v", "side", "a", "b").collect()(0)
      val uX2 = (for (x <- a; y <- b) yield {
        if (x > y) 2L else if (x == y) 1L else 0L
      }).sum
      r.getLong(2) == uX2 &&
        r.getLong(2) + r.getLong(3) == 2L * a.size * b.size
    })
  }

  private val tokensGen: Gen[List[String]] =
    Gen.choose(0, 25).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")))

  test("rougeN law: the kernel's clipped overlap equals the " +
    "brute-force multiset min over n-grams, for n in 1..3") {
    holds(Prop.forAll(tokensGen, tokensGen, Gen.choose(1, 3)) {
      (ref, cand, n) =>
        val df = Seq((1L, ref.mkString(" "), cand.mkString(" ")))
          .toDF("id", "ref", "cand")
        val r = EvalMetrics.rougeN(df, "id", "ref", "cand", n)
          .collect()(0)
        def grams(t: List[String]) =
          t.sliding(n).filter(_.size == n).map(_.mkString(" ")).toList
        val rg = grams(ref).groupBy(identity).view.mapValues(_.size)
        val cg = grams(cand).groupBy(identity).view.mapValues(_.size)
        val overlap = rg.keys.map(g =>
          math.min(rg(g), cg.getOrElse(g, 0))).sum.toLong
        r.getLong(3) == overlap &&
          r.getLong(1) == ref.size.toLong &&
          r.getLong(2) == cand.size.toLong
    })
  }

  test("robustScale law: at least half the group's mass sits within " +
    "one MAD of the median (|z_milli| <= 1000), for arbitrary groups") {
    val groupGen = Gen.choose(3, 30).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-40L, 40L)))
    holds(Prop.forAll(groupGen) { vs =>
      val df = vs.map(("g", _)).toDF("g", "v")
      val rows = Stats.robustScale(df, "v", "g").collect()
      val within = rows.count(r => math.abs(r.getLong(4)) <= 1000)
      // median-of-|v−med| definition: ≥ half the rows are within one
      // MAD (interpolated MAD can sit between order statistics, so use
      // the weak form; degenerate MAD=0 groups satisfy it trivially on
      // the median-valued rows)
      within * 2 >= rows.length
    })
  }
}

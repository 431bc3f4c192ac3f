package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property laws for the round-5 continuation operators, each checked
  * against an independent in-memory reference implementation over
  * randomized inputs (the PropertySpec house pattern).
  */
class Round5bPropertySpec extends SparkSpecBase {

  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(5)
    .withWorkers(1)

  private def holds(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  private val eventsGen: Gen[List[(Long, Long, Long)]] =
    Gen.listOfN(60, for {
      user <- Gen.choose(1L, 4L)
      ts <- Gen.choose(0L, 20000L)
      id <- Gen.choose(0L, 1000000L)
    } yield (user, ts, id)).map(_.distinctBy(_._3))

  test("sessionize ≡ per-user linear reference scan for random events " +
    "and gaps") {
    holds(Prop.forAll(eventsGen, Gen.choose(100L, 5000L)) {
      (rows: List[(Long, Long, Long)], gap: Long) =>
        val df = rows.map { case (u, t, i) =>
          (u, new java.sql.Timestamp(t * 1000L), i) }
          .toDF("user_id", "ts", "event_id")
        val got = graft.ext.Funnel.sessionize(df, Seq("user_id"), "ts",
            gapSeconds = gap, tieBreak = Seq("event_id"))
          .select("event_id", "session_idx")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // reference: sort per user, walk linearly
        val want = rows.groupBy(_._1).flatMap { case (_, es) =>
          val sorted = es.sortBy(e => (e._2, e._3))
          var idx = 0L
          var prev = Long.MinValue
          sorted.map { case (_, t, i) =>
            if (prev == Long.MinValue || t - prev > gap) idx += 1
            prev = t
            i -> idx
          }
        }
        got == want
    })
  }

  test("scd2 ≡ reference collapse for random attribute histories") {
    val logGen = Gen.listOfN(40, for {
      user <- Gen.choose(1L, 3L)
      ts <- Gen.choose(0L, 50L)
      attr <- Gen.oneOf("a", "b", "c")
      id <- Gen.choose(0L, 1000000L)
    } yield (user, ts, id, attr)).map(_.distinctBy(_._3))
      // unique (user, ts, id) order key
      .map(_.distinctBy(t => (t._1, t._2, t._3)))
    holds(Prop.forAll(logGen) { rows: List[(Long, Long, Long, String)] =>
      val df = rows.toDF("user_id", "ts", "event_id", "tier")
      val got = graft.ext.Pipeline.scd2(df, Seq("user_id"), "ts",
          Seq("tier"), tieBreak = Seq("event_id"))
        .select("user_id", "effective_from", "effective_to", "tier")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2), r.getString(3))).toSet
      val want = rows.groupBy(_._1).flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e._2, e._3))
        val changed = sorted.foldLeft(List.empty[(Long, Long, String)]) {
          case (acc, (_, t, _, a)) =>
            if (acc.nonEmpty && acc.head._3 == a) acc
            else (u, t, a) :: acc
        }.reverse
        changed.zipAll(changed.drop(1).map(c => Some(c._2)), null, None)
          .collect { case ((uu, t, a), next) =>
            (uu, t, next.map(identity).getOrElse(-1L), a) }
      }.toSet
      got == want
    })
  }

  test("histogram conserves non-null counts and respects clamping for " +
    "random ranges") {
    val valsGen = Gen.listOfN(80, Gen.option(Gen.choose(-50.0, 150.0)))
    holds(Prop.forAll(valsGen, Gen.choose(2, 12)) {
      (vs: List[Option[Double]], bins: Int) =>
        val df = vs.toDF("v")
        val h = graft.ext.Pipeline.histogram(df, "v", 0.0, 100.0, bins)
          .collect().map(r => r.getInt(0) -> r.getLong(3))
        val nonNull = vs.count(_.isDefined).toLong
        h.map(_._2).sum == nonNull &&
          h.forall { case (b, n) => b >= 0 && b < bins && n > 0 }
    })
  }

  test("sampleExactWeighted returns min(k, eligible) rows and never a " +
    "zero-weight row, for random weights") {
    val rowsGen = Gen.listOfN(50, for {
      id <- Gen.choose(0L, 1000000L)
      w <- Gen.oneOf(Gen.const(0.0), Gen.choose(0.1, 10.0))
    } yield (id, w)).map(_.distinctBy(_._1))
    holds(Prop.forAll(rowsGen, Gen.choose(1, 30)) {
      (rows: List[(Long, Double)], k: Int) =>
        val df = rows.toDF("id", "w")
        val got = graft.ext.Pipeline.sampleExactWeighted(
            df, col("w"), k, "id")
          .select("id").as[Long].collect().toSet
        val eligible = rows.filter(_._2 > 0).map(_._1).toSet
        got.size == math.min(k, eligible.size) && got.subsetOf(eligible)
    })
  }

  test("banded levenshtein ≡ built-in levenshtein within the band, " +
    "sentinel beyond, for random string pairs") {
    val strGen = Gen.choose(0, 25).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    holds(Prop.forAll(strGen, strGen, Gen.choose(0, 12)) {
      (a: String, b: String, k: Int) =>
        val row = Seq((a, b, k)).toDF("a", "b", "k")
          .select(levenshtein(col("a"), col("b")).as("full"),
            graft.functions.VectorFunctions.banded_levenshtein(
              col("a"), col("b"), col("k")).as("banded"))
          .collect()(0)
        val (full, banded) = (row.getInt(0), row.getInt(1))
        if (full <= k) banded == full else banded == k + 1
    })
  }

  test("editSimilarityBounded ≡ thresholded editSimilarity on random " +
    "pairs") {
    val strGen = Gen.choose(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('x', 'y', 'z', ' ')).map(_.mkString))
    holds(Prop.forAll(strGen, strGen, Gen.oneOf(0.5, 0.7, 0.9)) {
      (a: String, b: String, t: Double) =>
        val row = Seq((a, b)).toDF("a", "b")
          .select(graft.ext.Dedup.editSimilarity(col("a"), col("b"))
              .as("full"),
            graft.ext.Dedup.editSimilarityBounded(col("a"), col("b"), t)
              .as("banded"))
          .collect()(0)
        val full = row.getDouble(0)
        val banded = if (row.isNullAt(1)) None else Some(row.getDouble(1))
        if (full >= t) banded.contains(full)
        else banded.isEmpty || banded.exists(_ < t)
    })
  }

  test("rrfFuse scores ≡ reference integer fusion for random rank lists") {
    val listGen = Gen.listOfN(20, for {
      q <- Gen.choose(0L, 2L)
      d <- Gen.choose(0L, 15L)
      r <- Gen.choose(1L, 10L)
    } yield (q, d, r)).map(_.distinctBy(t => (t._1, t._2)))
    holds(Prop.forAll(listGen, listGen) {
      (a: List[(Long, Long, Long)], b: List[(Long, Long, Long)]) =>
        Prop.propBoolean(a.nonEmpty && b.nonEmpty) ==> {
          val fused = graft.ext.TextAnalysis.rrfFuse(
              Seq(a.toDF("query_id", "doc_id", "rank"),
                b.toDF("query_id", "doc_id", "rank")), k = 100)
            .collect()
            .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
          val want = (a ++ b).groupBy(t => (t._1, t._2))
            .map { case (k2, ts) =>
              k2 -> ts.map(t => 1000000000000L / (t._3 + 60L)).sum }
          fused == want
        }
    })
  }
}

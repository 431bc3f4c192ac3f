package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ext.{Funnel, Pipeline, TimeSeries}

/** Property laws for the round-10b operators, checked against
  * independent in-memory reference implementations over randomized
  * inputs (the PropertySpec house pattern).
  */
class Round10bPropertySpec extends SparkSpecBase {

  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(5)
    .withWorkers(1)

  private def holds(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  // ---- cusum: closed window form ≡ sequential recursion ----

  private val seriesGen: Gen[List[Long]] =
    Gen.choose(1, 60).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 12L)))

  test("cusum law: running-sum-minus-running-min equals the " +
    "max(0, C + v - k) recursion for arbitrary series and drifts") {
    holds(Prop.forAll(seriesGen, Gen.choose(0L, 8L)) { (vs, k) =>
      val df = vs.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
        .toDF("key", "t", "v")
      val got = TimeSeries.cusum(df, "key", "t", "v", k, threshold = 5L)
        .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
      var c = 0L
      vs.zipWithIndex.forall { case (v, i) =>
        c = math.max(0L, c + v - k)
        got(i.toLong) == c
      }
    })
  }

  // ---- quantileNormalize: range, tie, and monotonicity laws ----

  test("quantileNormalize law: q in [0,1], equal values share q, and " +
    "q is monotone in the value within each group") {
    val groupsGen = Gen.choose(1, 3).flatMap(g =>
      Gen.listOfN(g * 15, Gen.zip(Gen.choose(0, g - 1).map(i => s"s$i"),
        Gen.choose(-50L, 50L))))
    holds(Prop.forAll(groupsGen) { rows =>
      val out = Pipeline.quantileNormalize(
          rows.toDF("src", "score"), "src", "score")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      out.forall { case (_, _, q) => q >= 0.0 && q <= 1.0 } &&
        out.groupBy(t => (t._1, t._2)).values
          .forall(g => g.map(_._3).distinct.size == 1) &&
        out.groupBy(_._1).values.forall { g =>
          val sorted = g.sortBy(_._2)
          sorted.zip(sorted.tail).forall { case (a, b) => a._3 <= b._3 }
        }
    })
  }

  // ---- foldsByHash: partition + growth stability ----

  test("foldsByHash law: every id gets exactly one fold in [0,k), and " +
    "an id's fold never moves when other rows are added or dropped") {
    holds(Prop.forAll(Gen.choose(2, 7),
        Gen.nonEmptyListOf(Gen.choose(0L, 5000L)).map(_.distinct)) {
      (k, ids) =>
        val full = Pipeline.foldsByHash(ids.toDF("id"), "id", k)
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        val half = ids.take(math.max(1, ids.size / 2))
        val sub = Pipeline.foldsByHash(half.toDF("id"), "id", k)
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        full.size == ids.size &&
          full.values.forall(f => f >= 0 && f < k) &&
          half.forall(id => sub(id) == full(id))
    })
  }

  // ---- collapseBursts: conservation + coverage laws ----

  test("collapseBursts law: kept rows are a subset, burst sizes " +
    "conserve the input count, and every dropped event chains back to " +
    "a kept one within the gap") {
    val evGen = Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 400L)).map(_.distinct))
    holds(Prop.forAll(evGen, Gen.choose(1L, 50L)) { (secs, gap) =>
      val rows = secs.zipWithIndex.map { case (s, i) =>
        (1L, i.toLong, new java.sql.Timestamp(s * 1000L)) }
      val kept = Funnel.collapseBursts(rows.toDF("u", "id", "ts"),
          Seq("u"), "ts", gapSeconds = gap, tieBreak = Seq("id"))
        .collect().map(r => r.getAs[Long]("id") ->
          r.getAs[Long]("burst_size")).toMap
      val byTime = rows.sortBy(_._3.getTime)
      // reference fold: burst starts when gap from PREDECESSOR > gap
      val ref = scala.collection.mutable.Map[Long, Long]()
      var head = -1L
      var prev = Long.MinValue
      byTime.foreach { case (_, id, ts) =>
        val t = ts.getTime / 1000L
        if (head < 0 || t - prev > gap) { head = id; ref(head) = 0L }
        ref(head) += 1L
        prev = t
      }
      kept == ref.toMap && kept.values.sum == secs.size
    })
  }

  // ---- coverageGaps: reference-fold equivalence ----

  test("coverageGaps law: equals an independent sort-and-sweep " +
    "reference on random interval sets (overlaps and duplicates " +
    "included)") {
    val ivGen = Gen.choose(1, 30).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0L, 120L), Gen.choose(0L, 25L))
        .map { case (s, len) => (s, s + len) }))
    holds(Prop.forAll(ivGen) { ivs =>
      val got = graft.ext.IntervalJoin.coverageGaps(
          ivs.map { case (s, e) => ("k", s, e) }.toDF("k", "s", "e"),
          Seq("k"), "s", "e")
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      // reference: sweep sorted intervals, record holes between the
      // running covered frontier and the next start
      var frontier = Long.MinValue
      val ref = scala.collection.mutable.Set[(Long, Long)]()
      ivs.sorted.foreach { case (s, e) =>
        if (frontier != Long.MinValue && s > frontier + 1)
          ref += ((frontier + 1, s - 1))
        frontier = math.max(frontier, e)
      }
      got == ref.toSet
    })
  }

  // ---- resampleInterp: interpolation stays inside its neighbors ----

  test("resampleInterp law: every gap value lies between its two " +
    "neighbors, and observed buckets reproduce their reading") {
    val obsGen = Gen.choose(2, 12).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0L, 40L), Gen.choose(-100, 100).map(_ / 4.0))))
      .map(_.groupBy(_._1).map(_._2.head).toList) // one obs per bucket
      .suchThat(_.size >= 2)
    holds(Prop.forAll(obsGen) { obs =>
      val ev = obs.map { case (day, v) =>
        (1L, new java.sql.Timestamp(day * 86400000L), v) }
        .toDF("k", "ts", "v")
      val out = TimeSeries.resampleInterp(ev, "k", "ts", "v", 86400L)
        .collect().map(r => r.getLong(1) / 86400L ->
          (r.getDouble(2), r.getBoolean(3))).toMap
      val byDay = obs.toMap
      val days = obs.map(_._1).sorted
      out.forall { case (d, (v, seen)) =>
        if (seen) v == byDay(d)
        else {
          val prev = days.filter(_ < d).max
          val next = days.filter(_ > d).min
          val (lo, hi) = (math.min(byDay(prev), byDay(next)),
            math.max(byDay(prev), byDay(next)))
          v >= lo - 1e-9 && v <= hi + 1e-9
        }
      } && days.forall(d => out(d)._2)
    })
  }

  // ---- hazardCurve: reference-fold equivalence ----

  test("hazardCurve law: equals an independent lifetime-histogram " +
    "reference on random event sets, and churn conserves the " +
    "population") {
    val evGen = Gen.choose(1, 25).flatMap(nUsers =>
      Gen.listOfN(nUsers, Gen.nonEmptyListOf(Gen.choose(0L, 40L)))
        .map(_.zipWithIndex.flatMap { case (days, u) =>
          days.map(d => (u.toLong, d)) }))
    holds(Prop.forAll(evGen) { rows =>
      val df = rows.map { case (u, d) =>
        (u, new java.sql.Timestamp(d * 86400000L)) }.toDF("u", "ts")
      val got = graft.ext.Funnel.hazardCurve(df, "u", "ts", 86400L)
        .collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val life = rows.groupBy(_._1).values
        .map(g => g.map(_._2).max - g.map(_._2).min)
      val hist = life.groupBy(identity).map { case (t, g) =>
        t -> g.size.toLong }
      val ref = hist.map { case (t, d) =>
        val risk = life.count(_ >= t).toLong
        t -> (risk, d, d * 1000000L / risk)
      }
      got == ref && got.values.map(_._2).sum == life.size
    })
  }

  // ---- seasonalAdjust: residuals vanish per phase cell ----

  test("seasonalAdjust law: residuals sum to ~0 within every " +
    "(key, phase) cell (the mean is removed, nothing else)") {
    holds(Prop.forAll(Gen.choose(24, 96).flatMap(n =>
        Gen.listOfN(n, Gen.choose(0L, 30L)))) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
        .toDF("key", "t", "v")
      val out = TimeSeries.seasonalAdjust(df, "key", "t", "v",
          period = 8, bucketSeconds = 1L)
        .collect().map(r => r.getAs[Long]("phase") ->
          r.getAs[Double]("resid"))
      out.groupBy(_._1).values.forall(g =>
        math.abs(g.map(_._2).sum) < 1e-9 * math.max(1, g.size))
    })
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.ext.{Pipeline, Stats}

/** Round 10c: two-sample distribution statistics (KS / Mann-Whitney /
  * Jensen-Shannon) and the l-diversity release gate.
  */
class Round10cSpec extends SparkSpecBase {
  import spark.implicits._

  test("ksTest: crafted offset samples give the hand-computed max ECDF " +
    "gap and the smallest witness value") {
    // A = {1..10}, B = {6..15}: at v=5 cumA=5, cumB=0 → gap 50/100 = 0.5;
    // the same gap repeats at v=10, so at_v must pick 5 (smallest)
    val df = ((1 to 10).map(v => (v.toLong, "a")) ++
      (6 to 15).map(v => (v.toLong, "b"))).toDF("v", "side")
    val r = Stats.ksTest(df, "v", "side", "a", "b").collect()(0)
    assert(r.getLong(0) == 10 && r.getLong(1) == 10)
    assert(r.getLong(2) == 500000L, s"d_ppm ${r.getLong(2)}")
    assert(r.getLong(3) == 5L, s"at_v ${r.getLong(3)}")
  }

  test("ksTest: identical samples give D = 0") {
    val df = ((1 to 20).map(v => (v.toLong, "a")) ++
      (1 to 20).map(v => (v.toLong, "b"))).toDF("v", "side")
    val r = Stats.ksTest(df, "v", "side", "a", "b").collect()(0)
    assert(r.getLong(2) == 0L)
  }

  test("mannWhitneyU: hand-computed midrank example with ties, plus " +
    "the U_a + U_b = 2·n_a·n_b conservation law") {
    // A = {1,2,2}, B = {2,3}: midranks 1, 3, 3 / 3, 5 →
    // R_a = 7, U_a = 7 − 6 = 1 (one a=b tie pair counting ½ ×2)
    val df = (Seq(1L, 2L, 2L).map((_, "a")) ++ Seq(2L, 3L).map((_, "b")))
      .toDF("v", "side")
    val r = Stats.mannWhitneyU(df, "v", "side", "a", "b").collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 2)
    assert(r.getLong(2) == 2L, s"u_a_x2 ${r.getLong(2)}")    // 2·U_a
    assert(r.getLong(3) == 10L, s"u_b_x2 ${r.getLong(3)}")
    assert(r.getLong(2) + r.getLong(3) == 2 * 3 * 2)
    assert(r.getLong(4) == 166666L, s"cles_ppm ${r.getLong(4)}")
  }

  test("mannWhitneyU: fully separated samples give U_a = 0 and " +
    "cles_ppm = 0 (every a below every b)") {
    val df = ((1 to 8).map(v => (v.toLong, "a")) ++
      (100 to 107).map(v => (v.toLong, "b"))).toDF("v", "side")
    val r = Stats.mannWhitneyU(df, "v", "side", "a", "b").collect()(0)
    assert(r.getLong(2) == 0L && r.getLong(4) == 0L)
    assert(r.getLong(3) == 2L * 8 * 8)
  }

  test("two-sample stats are partition-invariant (the distributed " +
    "prefix sum sees different range partitionings)") {
    val base = (0 until 500).map(i =>
      (((i * 2654435761L) >>> 7) % 50, if (i % 2 == 0) "a" else "b"))
      .toDF("v", "side")
    val one = base.repartition(1)
    val many = base.repartition(13)
    assert(Stats.ksTest(one, "v", "side", "a", "b").collect().toSeq ==
      Stats.ksTest(many, "v", "side", "a", "b").collect().toSeq)
    assert(Stats.mannWhitneyU(one, "v", "side", "a", "b")
        .collect().toSeq ==
      Stats.mannWhitneyU(many, "v", "side", "a", "b").collect().toSeq)
  }

  test("ksTestByGroup: per-group rows match the global ksTest run on " +
    "each group alone — shifted group detects, identical group is 0") {
    val g1 = (1 to 10).map(v => ("g1", v.toLong, "a")) ++
      (6 to 15).map(v => ("g1", v.toLong, "b"))
    val g2 = (1 to 20).flatMap(v =>
      Seq(("g2", v.toLong, "a"), ("g2", v.toLong, "b")))
    val df = (g1 ++ g2).toDF("lang", "v", "side")
    val out = Stats.ksTestByGroup(df, "v", "lang", "side", "a", "b")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("g1") == ((10L, 10L, 500000L, 5L)))
    assert(out("g2")._3 == 0L)
    val solo = Stats.ksTest(df.where(col("lang") === "g1"),
      "v", "side", "a", "b").collect()(0)
    assert((solo.getLong(0), solo.getLong(1), solo.getLong(2),
      solo.getLong(3)) == out("g1"), "grouped face diverged from global")
  }

  test("robustScale: the outlier cannot inflate its own scale, and a " +
    "zero-MAD group floors the denominator and flags mad_zero") {
    val df = (Seq(1L, 2L, 3L, 4L, 100L).map(("g1", _)) ++
      Seq(5L, 5L, 5L, 9L).map(("g2", _))).toDF("g", "v")
    val out = Stats.robustScale(df, "v", "g")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toMap
    // g1: med 3, MAD 1 → the 100 outlier scores (100−3)/1 = 97
    assert(out(("g1", 100L)) == ((3000L, 1000L, 97000L, false)))
    assert(out(("g1", 2L)) == ((3000L, 1000L, -1000L, false)))
    // g2: med 5, |v−med| = [0,0,0,4] → MAD 0 → floor + flag
    assert(out(("g2", 5L))._4 && out(("g2", 5L))._3 == 0L)
    assert(out(("g2", 9L)) == ((5000L, 0L, 4000000L, true)))
  }

  test("jsDivergence: identical mixes give 0; disjoint supports give " +
    "ln 2 = 693 milli-nats (the JSD upper bound)") {
    val same = (Seq.fill(30)("x") ++ Seq.fill(20)("y")).zipWithIndex
      .flatMap { case (c, _) => Seq((c, "p"), (c, "q")) }
      .toDF("cat", "ver")
    val rs = Stats.jsDivergence(same, "cat", "ver", "p", "q").collect()(0)
    assert(rs.getLong(3) == 0L && rs.getLong(4) == 0L &&
      rs.getLong(5) == 0L)
    val disj = (Seq.fill(25)(("only_p", "p")) ++
      Seq.fill(40)(("only_q", "q"))).toDF("cat", "ver")
    val rd = Stats.jsDivergence(disj, "cat", "ver", "p", "q").collect()(0)
    assert(rd.getLong(3) == 693L && rd.getLong(4) == 693L &&
      rd.getLong(5) == 693L, s"disjoint JSD row $rd")
  }

  test("jsDivergence: a planted one-category shift moves JSD strictly " +
    "above 0 and below the ln 2 bound") {
    val p = Seq.fill(80)("x") ++ Seq.fill(20)("y")
    val q = Seq.fill(50)("x") ++ Seq.fill(50)("y")
    val df = (p.map((_, "p")) ++ q.map((_, "q"))).toDF("cat", "ver")
    val r = Stats.jsDivergence(df, "cat", "ver", "p", "q").collect()(0)
    assert(r.getLong(5) > 0L && r.getLong(5) < 693L,
      s"jsd_milli ${r.getLong(5)}")
  }

  test("chatAudit: flag truth table over crafted transcripts — " +
    "malformed JSON, empty array, missing keys, alternation breaks, " +
    "missing completion, empty content") {
    val rows = Seq(
      1L -> """[{"role":"user","content":"hi"},{"role":"assistant","content":"yo"}]""",
      2L -> """[{"role":"system","content":"s"},{"role":"user","content":"hi"},{"role":"assistant","content":"yo"}]""",
      3L -> """[{"role":"user","content":"hi"},{"role":"user","content":"again"},{"role":"assistant","content":"x"}]""",
      4L -> """[{"role":"assistant","content":"yo"}]""",
      5L -> "not json",
      6L -> "[]",
      7L -> """[{"role":"user","content":""},{"role":"assistant","content":"x"}]""",
      8L -> """[{"role":"user","content":"hi"},{"role":"assistant"}]""",
      9L -> """[{"role":"user","content":"hi"},{"role":"assistant","content":"a"},{"role":"user","content":"more"}]""",
      10L -> """[{"role":"system","content":"s"}]"""
    ).toDF("id", "chat")
    val out = graft.ext.Pipeline.chatAudit(rows, "id", "chat")
      .collect().map(r => r.getLong(0) -> r).toMap
    def flags(id: Long) = {
      val r = out(id)
      (r.getLong(1), r.getBoolean(2), r.getBoolean(4), r.getBoolean(5),
        r.getBoolean(6), r.getBoolean(7))
    } // (n_turns, parse_ok, alternates, ends_assistant, no_empty, valid)
    assert(flags(1L) == ((2L, true, true, true, true, true)))
    assert(flags(2L) == ((3L, true, true, true, true, true)))
    assert(out(2L).getBoolean(3), "has_system")
    assert(flags(3L) == ((3L, true, false, true, true, false)))
    assert(flags(4L) == ((1L, true, false, true, true, false)))
    assert(flags(5L) == ((0L, false, false, false, false, false)))
    assert(flags(6L) == ((0L, false, false, false, false, false)))
    assert(flags(7L) == ((2L, true, true, true, false, false)))
    assert(flags(8L) == ((2L, true, true, true, false, false)))
    assert(flags(9L) == ((3L, true, true, false, true, false)))
    // only-system: core is empty (alternation vacuous), fails n >= 2
    assert(flags(10L) == ((1L, true, true, false, true, false)))
    // flat renders only valid rows, in the fixed template
    assert(out(1L).getString(8) == "<|user|>\nhi\n<|assistant|>\nyo")
    assert(out(3L).isNullAt(8) && out(5L).isNullAt(8))
  }

  test("holtStream: driver-fold parity, constant series pins trend 0, " +
    "a pure ramp's forecast converges to the next true value, and " +
    "cross-batch streaming state matches the batch fold") {
    import graft.ext.TimeSeries
    val alpha = 0.25; val beta = 0.125
    def fold(vs: Seq[Double]): Seq[(Double, Double)] = {
      var l = Double.NaN; var b = 0.0
      vs.map { v =>
        if (l.isNaN) { l = v; b = 0.0 }
        else {
          val lNew = alpha * v + (1 - alpha) * (l + b)
          b = beta * (lNew - l) + (1 - beta) * b
          l = lNew
        }
        (l, b)
      }
    }
    val vs = (0 until 80).map(i => (3.0 + (i % 5)) * (1 + i / 40))
    val df = vs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("key", "t", "v")
    val got = TimeSeries.holtStream(df, "key", "t", "v", alpha, beta)
      .collect().map(r => r.getLong(1) -> (r.getDouble(3), r.getDouble(4)))
      .toMap
    fold(vs.map(_.toDouble)).zipWithIndex.foreach { case ((l, b), i) =>
      assert(got(i.toLong) == ((l, b)), s"t=$i")
    }
    // constant series: level locks to the constant, trend stays 0
    val const = (0 until 30).map(i => ("c", i.toLong, 7.0))
      .toDF("key", "t", "v")
    TimeSeries.holtStream(const, "key", "t", "v", alpha, beta)
      .collect().foreach { r =>
        assert(r.getDouble(3) == 7.0 && r.getDouble(4) == 0.0)
      }
    // ramp v_t = 2t: trend converges to the slope, so the one-step
    // forecast approaches the next true value (EWMA would lag forever)
    val ramp = (0 until 120).map(i => ("r", i.toLong, 2.0 * i))
      .toDF("key", "t", "v")
    val last = TimeSeries.holtStream(ramp, "key", "t", "v", alpha, beta)
      .orderBy(col("t")).collect().last
    assert(math.abs(last.getDouble(5) - 2.0 * 120) < 0.3,
      s"ramp forecast ${last.getDouble(5)} vs 240")
    // cross-batch streaming: (level, trend) carried in state across a
    // batch boundary reproduces the batch fold bit for bit
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(String, Long, Double)]
    val q = TimeSeries.holtStream(ms.toDF().toDF("key", "t", "v"),
        "key", "t", "v", alpha, beta)
      .writeStream.format("memory").queryName("holt_stream")
      .outputMode("append").start()
    try {
      val rows = vs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      ms.addData(rows.take(30): _*)
      q.processAllAvailable()
      ms.addData(rows.drop(30): _*)
      q.processAllAvailable()
      val streamed = spark.table("holt_stream").collect()
        .map(r => r.getLong(1) -> (r.getDouble(3), r.getDouble(4)))
        .toMap
      fold(vs.map(_.toDouble)).zipWithIndex.foreach { case ((l, b), i) =>
        assert(streamed(i.toLong) == ((l, b)),
          s"stream diverged from batch at t=$i")
      }
    } finally q.stop()
  }

  test("survivalCurve: hand-computed Kaplan-Meier on crafted " +
    "lifetimes — log-survival matches the product limit, the final " +
    "all-churn bucket reports NULL + surv_zero") {
    // lifetimes (seconds): a=0, b=0, c=1, d=2 → buckets t=0 (churn 2 of
    // 4), t=1 (1 of 2), t=2 (1 of 1 — h=1, survival 0)
    val ev = Seq(("a", 0L), ("a", 0L), ("b", 0L),
      ("c", 0L), ("c", 1L), ("d", 0L), ("d", 2L))
      .toDF("u", "sec")
      .select(col("u"), timestamp_seconds(col("sec")).as("ts"))
    val out = graft.ext.Funnel.survivalCurve(ev, "u", "ts",
        bucketSeconds = 1L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          r.getBoolean(5))).toMap
    val l2 = math.round(math.log(0.5) * 1000) // -693
    assert(out(0L) == ((4L, 2L, Some(l2), false)))
    assert(out(1L) == ((2L, 1L, Some(2 * l2), false)))
    assert(out(2L) == ((1L, 1L, None, true)))
    // KM without censoring = empirical survivor fraction:
    // exp(ls(t)/1000) ≈ #(lifetime > t)/N
    assert(math.abs(math.exp(l2 / 1000.0) - 0.5) < 2e-3)
    assert(math.abs(math.exp(2 * l2 / 1000.0) - 0.25) < 2e-3)
  }

  test("neymanAllocation: high-variance strata earn budget, " +
    "largest-remainder sums exactly to it, zero-variance strata get " +
    "w = 0, and the cap binds at the stratum size") {
    // g1: spread values (var > 0, 4 rows); g2: constant (var 0);
    // g3: tiny but very spread (cap binds)
    val df = (Seq(0L, 10L, 20L, 30L).map(("g1", _)) ++
      Seq.fill(5)(("g2", 7L)) ++ Seq(("g3", 0L), ("g3", 1000L)))
      .toDF("g", "v")
    val out = graft.ext.Pipeline.neymanAllocation(df, "g", "v", 10L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // weights: w = floor(sqrt(n·ssq − s²))
    def w(vs: Seq[Long]) = math.sqrt(
      (vs.size * vs.map(x => x * x).sum - math.pow(vs.sum.toDouble, 2))
    ).toLong
    assert(out("g1")._2 == w(Seq(0L, 10L, 20L, 30L)))
    assert(out("g2")._2 == 0L)
    assert(out("g3")._2 == w(Seq(0L, 1000L)))
    assert(out.values.map(_._3).sum == 10L, "allocs must sum to budget")
    // g3's weight (1000) dwarfs g1's (~44): Neyman demands ~all of the
    // budget there, but only 2 rows exist — the cap binds
    assert(out("g3")._3 > out("g3")._1 && out("g3")._4 == out("g3")._1)
    assert(out("g2")._3 == 0L)
  }

  test("dpNoisyCounts: driver-replicated Laplace draw, noise bounded " +
    "by the grid tail, deterministic per salt, redrawn across salts, " +
    "loud on a missing salt") {
    val df = (0 until 200).map(i => ("g" + (i % 8), i)).toDF("g", "x")
    val eps = 0.5
    def noisy(salt: String) = graft.ext.Pipeline
      .dpNoisyCounts(df, Seq("g"), eps, salt)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = noisy("s1")
    assert(a == noisy("s1"), "not deterministic for a fixed salt")
    assert(a != noisy("s2"), "salt did not redraw the noise")
    // driver replication of the exact formula for every group
    val md = java.security.MessageDigest.getInstance("MD5")
    a.foreach { case (g, got) =>
      val enc = s"${g.length}:$g" + "\u001fdp:s1"
      val hex = md.digest(enc.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16) % 1000000L
      val u = (h.toDouble + 0.5) / 1000000.0
      val d = u - 0.5
      val lap = -(1.0 / eps) * math.signum(d) *
        math.log(1.0 - 2.0 * math.abs(d))
      val want = 25L * 1000L + math.round(lap * 1000)
      assert(got == want, s"group $g: got $got want $want")
      // grid tail bound: |noise| <= (1/eps)·ln(10^6) milli-nats
      assert(math.abs(got - 25000L) <= math.round(2.0 *
        math.log(1000000.0) * 1000) + 1, s"noise out of bound: $got")
    }
    intercept[IllegalArgumentException] {
      graft.ext.Pipeline.dpNoisyCounts(df, Seq("g"), eps, "")
    }
  }

  test("chatAudit runs unchanged on a STREAMING frame (pure narrow " +
    "map, no state) and matches the batch flags per row") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = Seq(
      1L -> """[{"role":"user","content":"hi"},{"role":"assistant","content":"yo"}]""",
      2L -> "not json",
      3L -> """[{"role":"user","content":"hi"},{"role":"user","content":"x"}]""")
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val audited = graft.ext.Pipeline.chatAudit(
      ms.toDF().toDF("id", "chat"), "id", "chat")
    val q = audited.writeStream.format("memory")
      .queryName("chat_audit_stream").outputMode("append").start()
    try {
      ms.addData(rows.take(2): _*)
      q.processAllAvailable()
      ms.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val got = spark.table("chat_audit_stream")
        .collect().map(r => r.getLong(0) -> r.getBoolean(7)).toMap
      val want = graft.ext.Pipeline.chatAudit(
        rows.toDF("id", "chat"), "id", "chat")
        .collect().map(r => r.getLong(0) -> r.getBoolean(7)).toMap
      assert(got == want && got == Map(1L -> true, 2L -> false,
        3L -> false))
    } finally q.stop()
  }

  test("lDiversity: a k-anonymous group with a concentrated sensitive " +
    "value violates; NULL counts as a sensitive value") {
    val df = Seq(
      // group g1: 4 people, all the same diagnosis — k-anonymous at
      // k=4 yet l-violating at l=2
      ("g1", "flu"), ("g1", "flu"), ("g1", "flu"), ("g1", "flu"),
      // group g2: 3 people, 2 distinct values → passes l=2
      ("g2", "flu"), ("g2", "cold"), ("g2", "cold"),
      // group g3: one real value + NULL → NULL is a value → 2 → passes
      ("g3", "flu"), ("g3", null)
    ).toDF("zip", "diag")
    val out = Pipeline.lDiversity(df, Seq("zip"), "diag", l = 2L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out("g1") == ((4L, 1L, true)))
    assert(out("g2") == ((3L, 2L, false)))
    assert(out("g3") == ((2L, 2L, false)))
  }
}

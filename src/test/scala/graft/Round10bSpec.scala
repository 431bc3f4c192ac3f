package graft

import org.apache.spark.sql.functions._
import graft.ext.TimeSeries

/** Round 10b: time-series diagnostics — CUSUM closed form vs the
  * sequential recursion, planted-shift detection, lag/diff features,
  * ACF on planted periodicity, linear-interpolation resampling.
  */
class Round10bSpec extends SparkSpecBase {
  import spark.implicits._

  // deterministic pseudo-noise (no Random: fixture must never move)
  private def noise(i: Int): Long = math.abs(((i * 2654435761L) >>> 7) % 5)

  test("cusum: the closed window form (running sum - running min) " +
    "equals the sequential recursion C_t = max(0, C_{t-1} + v_t - k)") {
    val series = (0 until 200).map(i => ("a", i.toLong, 3L + noise(i))) ++
      (0 until 150).map(i => ("b", i.toLong, 1L + noise(i * 7)))
    val df = series.toDF("key", "t", "v")
    val got = TimeSeries.cusum(df, "key", "t", "v",
        drift = 4L, threshold = 6L)
      .select("key", "t", "v", "c", "alarm").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getBoolean(4))).toMap
    // driver-side sequential reference
    series.groupBy(_._1).foreach { case (k, rows) =>
      var c = 0L
      rows.sortBy(_._2).foreach { case (_, t, v) =>
        c = math.max(0L, c + v - 4L)
        assert(got((k, t)) == (c, c >= 6L),
          s"key=$k t=$t expected c=$c got ${got((k, t))}")
      }
    }
  }

  test("cusumAdaptive: a planted sustained level shift alarms inside " +
    "the shifted window and never before it") {
    // 300 quiet buckets at ~3/bucket, then 40 buckets shifted to
    // ~9/bucket: median ~4, allowance = floor(4+2) = 6, so the shift
    // accumulates ~+3/bucket and crosses h=8 within a few buckets
    val rows = (0 until 300).map(i => ("svc", i.toLong, 2L + noise(i))) ++
      (300 until 340).map(i => ("svc", i.toLong, 8L + noise(i)))
    val out = TimeSeries.cusumAdaptive(rows.toDF("key", "t", "v"),
        "key", "t", "v", sigmaMult = 1.0, threshold = 8L)
      .select("t", "alarm").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert((0L until 300L).forall(t => !out(t)),
      "false alarm in the quiet window")
    assert((305L until 340L).exists(out(_)), "planted shift never alarmed")
    // and once latched inside a sustained shift it stays latched
    val first = (300L until 340L).find(out(_)).get
    assert((first until 340L).forall(out(_)),
      "alarm dropped mid-shift despite the level staying high")
  }

  test("diffFeatures: d1/dP are exact lagged differences with NULLs " +
    "for the first L rows of each key, and all lags share one window " +
    "(single exchange + sort in the plan)") {
    val df = (0 until 30).map(i => ("k", i.toLong, (i * i).toLong))
      .toDF("key", "t", "v")
    val out = TimeSeries.diffFeatures(df, "key", "t", "v", Seq(1, 7))
    val rows = out.orderBy("t").collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      val d1 = if (i < 1) null else Long.box((i * i) - (i - 1) * (i - 1))
      val d7 = if (i < 7) null else Long.box((i * i) - (i - 7) * (i - 7))
      assert(r.getAs[Any]("d1") == d1 && r.getAs[Any]("d7") == d7,
        s"row $i: ${r.mkString(",")}")
    }
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1,
      s"expected exactly one exchange, plan:\n$plan")
    assert(plan.split("Sort ").length - 1 == 1,
      s"expected exactly one sort (lags share the window), plan:\n$plan")
  }

  test("acf: planted period-12 series scores r=1 at lag 12, negative " +
    "at the half period; constant series yields NULL r") {
    val periodic = (0 until 240).map(i =>
      ("p", i.toLong, (i % 12).toLong))
    val const = (0 until 50).map(i => ("c", i.toLong, 7L))
    val out = TimeSeries.acf((periodic ++ const).toDF("key", "t", "v"),
        "key", "t", "v", lags = Seq(6, 12))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        Option(r.getAs[java.lang.Double]("r"))).toMap
    assert(out(("p", 12)).exists(r => math.abs(r - 1.0) < 1e-12),
      s"lag-12 ACF of an exactly periodic series must be 1: $out")
    assert(out(("p", 6)).exists(_ < 0),
      "half-period lag must anti-correlate for a sawtooth")
    assert(out(("c", 6)).isEmpty && out(("c", 12)).isEmpty,
      "zero-variance series must yield NULL r, not a division blowup")
  }

  test("cusumStream: cross-batch statistic equals the batch cusum " +
    "row-for-row on in-order input, and alarms fire mid-stream") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = (0 until 60).map(i => ("svc", i.toLong, 2L + noise(i))) ++
      (60 until 80).map(i => ("svc", i.toLong, 9L + noise(i))) ++
      (0 until 40).map(i => ("db", i.toLong, 1L + noise(i * 3)))
    // split at t=70 so the planted shift STRADDLES the batch boundary:
    // the carried state must keep accumulating across it
    val (b1, b2) = (all.filter(_._2 < 70), all.filterNot(_._2 < 70))
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long, Long)]
    val q = TimeSeries.cusumStream(ms.toDF().toDF("key", "t", "v"),
        "key", "t", "v", drift = 4L, threshold = 6L)
      .writeStream.format("memory").queryName("cusum10b")
      .outputMode("append").start()
    try {
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getString(0), r.getLong(1))
      def vals(r: org.apache.spark.sql.Row) =
        (r.getLong(2), r.getLong(3), r.getBoolean(4))
      val got = spark.table("cusum10b").collect()
        .map(r => key(r) -> vals(r)).toMap
      val want = TimeSeries.cusum(all.toDF("key", "t", "v"),
          "key", "t", "v", drift = 4L, threshold = 6L)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
      assert(got == want, "stream != batch")
      assert(got.exists { case ((k, t), (_, _, a)) => a && k == "svc" },
        "planted shift never alarmed in the stream")
      // same code path in batch mode: one semantics, two execution modes
      val batchViaStream = TimeSeries.cusumStream(all.toDF("key", "t", "v"),
          "key", "t", "v", drift = 4L, threshold = 6L)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
      assert(batchViaStream == want)
    } finally q.stop()
  }

  test("foldsByCluster: near-dup cluster members share a fold, fold ids " +
    "cover 0..k-1, and unclustered docs keep their own-id fold") {
    val docs = (0L until 200L).map(i => (i, s"unique text body $i " +
      s"${i * 31} ${i * 17} middle words ${i * 7}")).toDF("doc_id", "text")
    // planted edge list: three chained clusters
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L), (50L, 51L))
      .toDF("id_a", "id_b")
    val out = graft.ext.Pipeline.foldsByCluster(docs, pairs, "doc_id", k = 5)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("fold")).toMap
    assert(out.size == 200, "fold assignment must cover every doc")
    assert(out.values.forall(f => f >= 0 && f < 5))
    assert(Set(out(0L), out(1L), out(2L)).size == 1,
      "chained cluster 0-1-2 must share one fold")
    assert(out(10L) == out(11L) && out(50L) == out(51L))
    // unclustered docs use their own id: equal to plain foldsByHash
    val plain = graft.ext.Pipeline.foldsByHash(docs, "doc_id", k = 5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("fold"))
      .toMap
    val clustered = Set(0L, 1L, 2L, 10L, 11L, 50L, 51L)
    assert(out.filterNot(kv => clustered(kv._1)) ==
      plain.filterNot(kv => clustered(kv._1)))
  }

  test("resampleInterp: gap buckets interpolate linearly between their " +
    "neighbors, observed buckets keep their reading, and the grid/dedup " +
    "semantics match resampleLocf's (latest-in-bucket wins)") {
    val day = 86400L
    def ts(d: Long) = new java.sql.Timestamp(d * day * 1000L)
    val events = Seq(
      // key 1: obs at d0 (v=10), d4 (v=2): gap d1..d3 interpolates
      (1L, ts(0), 10.0), (1L, ts(4), 2.0),
      // key 1 d0 also has an EARLIER reading that must lose to 10.0
      (1L, ts(0), 5.0),
      // key 2: single observation -> single-bucket grid, no gaps
      (2L, ts(9), 1.5)
    ).toDF("user_id", "ts", "value")
    // push the winner 2h into the bucket and the loser 1h (both stay
    // inside day 0): latest-in-bucket must pick 10.0
    val fixed = events.withColumn("ts",
      when(col("value") === 10.0, col("ts") + expr("INTERVAL '2' HOUR"))
        .when(col("value") === 5.0, col("ts") + expr("INTERVAL '1' HOUR"))
        .otherwise(col("ts")))
    val out = TimeSeries.resampleInterp(fixed, "user_id", "ts",
        "value", day)
      .orderBy("key", "bucket_start").collect()
      .map(r => (r.getLong(0), r.getLong(1) / day) ->
        (r.getDouble(2), r.getBoolean(3))).toMap
    assert(out((1L, 0L)) == (10.0, true), "latest-in-bucket must win")
    assert(out((1L, 1L)) == (8.0, false))
    assert(out((1L, 2L)) == (6.0, false))
    assert(out((1L, 3L)) == (4.0, false))
    assert(out((1L, 4L)) == (2.0, true))
    assert(out((2L, 9L)) == (1.5, true))
    assert(out.size == 6, s"grid must span first..last obs only: $out")
  }
}

package graft

import graft.ast._
import graft.ast.dsl._
import graft.compile.{Compiler, Env, StreamEnv}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Round-2 hardening specs: broadcast size guard, the 4th timestamp policy,
  * as-of join null atomicity, skew-safe batch kernels, the streaming
  * stream⋈table state kernel, and stream-stream left/outer band joins.
  */
class Round2Spec extends SparkSpecBase {

  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def batchEnv(frames: Map[String, DataFrame]): Env = new Env {
    def spark: SparkSession = Round2Spec.this.spark
    def load(topic: String): DataFrame = frames(topic)
    def topicNames: Seq[String] = frames.keySet.toSeq.sorted
    def isStreaming: Boolean = false
  }

  test("global table over the broadcast guard fails with a clear message") {
    spark.conf.set("graft.globalTable.maxRows", "10")
    try {
      val env = new graft.compile.ParquetEnv(spark, sfDir)
      val e = intercept[IllegalArgumentException] {
        Compiler.compile(
          globalTable("customer", Consumed(keys = Seq("c_custkey")),
            unique = true), env)
      }
      assert(e.getMessage.contains("broadcast guard"))
      assert(e.getMessage.contains("customer"))
      // under the limit still compiles (region has 5 rows)
      spark.conf.set("graft.globalTable.maxRows", "100")
      val ok = Compiler.compile(
        globalTable("region", Consumed(keys = Seq("r_regionkey")),
          unique = true), env)
      assert(ok.df.count() == 5)
    } finally spark.conf.unset("graft.globalTable.maxRows")
  }

  test("PartitionTimeOnInvalid backfills nulls with the running partition max") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, Some(ts("2024-01-01 10:00:00"))),
      (2L, None),                            // → 10:00
      (3L, Some(ts("2024-01-01 11:00:00"))),
      (4L, None)                             // → 11:00
    ).toDF("id", "ts").coalesce(1)
    val env = batchEnv(Map("t" -> df))
    val out = Compiler.compile(
      stream(Seq("t"), Consumed(keys = Seq("id"), eventTime = Some("ts"),
        timestampPolicy = TimestampPolicy.PartitionTimeOnInvalid)), env)
      .df.orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getAs[java.sql.Timestamp]("ts")).toMap
    assert(out(2L) == ts("2024-01-01 10:00:00"))
    assert(out(4L) == ts("2024-01-01 11:00:00"))
    assert(out(1L) == ts("2024-01-01 10:00:00"))
    // leading invalid rows (no partition time yet) pass through as null
    val df2 = Seq((1L, None: Option[java.sql.Timestamp]),
                  (2L, Some(ts("2024-01-01 09:00:00")))).toDF("id", "ts")
      .coalesce(1)
    val out2 = Compiler.compile(
      stream(Seq("t"), Consumed(keys = Seq("id"), eventTime = Some("ts"),
        timestampPolicy = TimestampPolicy.PartitionTimeOnInvalid)),
      batchEnv(Map("t" -> df2)))
      .df.orderBy("id").collect()
    assert(out2(0).isNullAt(1))
  }

  test("as-of join carries the matched row atomically: real NULLs survive") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq((1L, ts("2024-01-01 12:00:00"), 10L)).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Option(5L), Option("old")),
      (1L, ts("2024-01-01 11:00:00"), None: Option[Long], Option("new"))
    ).toDF("k", "ts", "rv", "tag")
    val out = graft.ext.AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts",
      Map("rv" -> "rv", "tag" -> "tag")).collect()
    assert(out.length == 1)
    // the 11:00 row is the as-of match; its rv is genuinely NULL and must
    // NOT be backfilled from the older 10:00 row
    assert(out.head.getAs[String]("tag") == "new")
    assert(out.head.isNullAt(out.head.fieldIndex("rv")))
  }

  test("batch ProcessOp on a skewed key: ordered streaming fold, no OOM path") {
    val n = 200000
    val hot = (1 to n).map(i => (1L, (n - i).toLong, i.toLong)) // ts descending
    val cold = Seq((2L, 0L, 1L))
    val df = (hot ++ cold).toDF("k", "seq", "payload")
      .withColumn("ts", timestamp_seconds(col("seq")))
      .drop("seq")
      .repartition(8) // scramble physical order; the kernel must re-sort
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("running",
        org.apache.spark.sql.types.LongType)))
    // state = running count; emit only every 50000th record per key
    val node = ProcessOp(
      stream(Seq("t"), Consumed(keys = Seq("k"), eventTime = Some("ts"))),
      init = () => Array[Byte](0, 0, 0, 0),
      process = (st, r) => {
        val c = java.nio.ByteBuffer.wrap(st).getInt + 1
        val ns = java.nio.ByteBuffer.allocate(4).putInt(c).array()
        val out: Iterator[Row] = if (c % 50000 == 0)
          Iterator.single(Row(r.getAs[Long]("k"), c.toLong)) else Iterator.empty
        (ns, out)
      },
      outSchema = outSchema)
    val out = Compiler.compile(node, batchEnv(Map("t" -> df)))
      .df.orderBy("k", "running").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 50000L), (1L, 100000L), (1L, 150000L), (1L, 200000L)))
  }

  test("streaming stream⋈table joins the CURRENT value, not the changelog") {
    val sms = MemoryStream[(Long, Long)]
    val tms = MemoryStream[(Long, String, Long)]
    val env = new StreamEnv(spark, Map(
      "clicks" -> sms.toDF().toDF("k", "click_id"),
      "profile" -> tms.toDF().toDF("k", "name", "off")))
    val node = stream(Seq("clicks"), Consumed(keys = Seq("k")))
      .join(table("profile", Consumed(keys = Seq("k")), orderBy = Some("off")))
    val q = Compiler.compile(node, env).df.writeStream
      .format("memory").queryName("st_join").outputMode("append").start()
    try {
      tms.addData((1L, "v1", 1L))
      tms.addData((1L, "v2", 2L)) // two historical upserts BEFORE any click
      q.processAllAvailable()
      sms.addData((1L, 100L))
      q.processAllAvailable()
      // exactly ONE enriched row (current value v2) — the round-1 equi-join
      // against the changelog would have emitted one per historical upsert
      val rows = spark.table("st_join").collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[String]("name") == "v2")
      // inner join: a click for an unknown key emits nothing
      sms.addData((9L, 101L))
      q.processAllAvailable()
      assert(spark.table("st_join").count() == 1)
    } finally q.stop()
  }

  test("anomaly-detection golden: full topology via Runner, checkpoint recovery") {
    // the reference's complete example (anomaly_detection.clj:29-43):
    // stream → group-by-key → 1-minute windowed count → to-stream →
    // filter(count > 3) → to! — run through Runner with a checkpoint, kill
    // the query, restart from the checkpoint, and verify no loss and no
    // duplicates across the restart (file sink is exactly-once).
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ms = MemoryStream[(String, java.sql.Timestamp)]
    val env = new StreamEnv(spark, Map("clicks" -> ms.toDF().toDF("user", "ts")))
    val node = stream(Seq("clicks"),
        Consumed(keys = Seq("user"), eventTime = Some("ts")))
      .groupByKey
      .windowedBy(WindowSpec.Tumbling("1 minute"))
      .count(as = "clicks")
      .toStream
      .filter(col("clicks") > 3)
    val dir = java.nio.file.Files.createTempDirectory("graft_anomaly").toString
    val cfg = graft.streaming.Runner.StreamsCfg(
      queryName = "anomaly", checkpointLocation = Some(s"$dir/ckpt"),
      outputMode = "append")
    val sink = SinkSpec.To(s"$dir/out", "parquet")

    val q1 = graft.streaming.Runner.start(node, env, sink, cfg)
    try {
      ms.addData(("u1", ts("2024-01-01 10:00:05")), ("u1", ts("2024-01-01 10:00:15")),
                 ("u1", ts("2024-01-01 10:00:25")), ("u1", ts("2024-01-01 10:00:35")),
                 ("u2", ts("2024-01-01 10:00:45"))) // u2: only 1 click → no anomaly
      q1.processAllAvailable()
      ms.addData(("wm", ts("2024-01-01 10:05:00"))) // advance watermark past window
      q1.processAllAvailable()
      ms.addData(("wm", ts("2024-01-01 10:06:00"))) // extra batch to flush append
      q1.processAllAvailable()
    } finally q1.stop() // kill

    val q2 = graft.streaming.Runner.start(node, env, sink, cfg) // recover
    try {
      ms.addData(("u3", ts("2024-01-01 10:10:05")), ("u3", ts("2024-01-01 10:10:15")),
                 ("u3", ts("2024-01-01 10:10:25")), ("u3", ts("2024-01-01 10:10:35")))
      q2.processAllAvailable()
      ms.addData(("wm", ts("2024-01-01 10:15:00")))
      q2.processAllAvailable()
      ms.addData(("wm", ts("2024-01-01 10:16:00")))
      q2.processAllAvailable()
    } finally q2.stop()

    val rows = spark.read.parquet(s"$dir/out")
      .select("user", "clicks").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    // exactly once each, across the kill/restart boundary
    assert(rows.sorted.toSeq == Seq("u1" -> 4L, "u3" -> 4L))
  }

  test("pure-expression pipeline ops run unchanged on a stream") {
    // langId/quality/splitByHash/normalize are Column expressions, so the
    // same code enriches a live stream — the batch/stream duality the
    // engine promises for the LLM-pipeline layer, not just the DSL core
    import graft.ext.{Pipeline, TextAnalysis}
    val ms = MemoryStream[(Long, String)]
    ms.addData((1L, "the cat and the dog of the house"),
               (2L, "el gato y los perros que viven"))
    val enriched = Pipeline.splitByHash(
      ms.toDF().toDF("doc_id", "text")
        .withColumn("lang_pred", TextAnalysis.langId(col("text")))
        .withColumn("norm", Pipeline.normalize(col("text")))
        .withColumn("quality", TextAnalysis.qualityFeatures(col("text"))("quality")),
      "doc_id", Seq("train" -> 0.9, "val" -> 0.1))
    val q = enriched.writeStream.format("memory").queryName("enrich_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("enrich_stream").orderBy("doc_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("lang_pred") == "en")
    assert(rows(1).getAs[String]("lang_pred") == "es")
    assert(rows.forall(r => Set("train", "val")(r.getAs[String]("split"))))
  }

  test("bucketed tables join without a shuffle exchange") {
    import graft.ext.Bucketing
    val ev = new graft.compile.ParquetEnv(spark, sfDir).load("events")
      .select("event_id", "user_id", "value")
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_name")
    Bucketing.writeBucketed(ev, "ev_bkt", Seq("user_id"), 4)
    Bucketing.writeBucketed(
      cust.withColumnRenamed("c_custkey", "user_id"), "cust_bkt",
      Seq("user_id"), 4)
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = Bucketing.readBucketed(spark, "ev_bkt")
        .join(Bucketing.readBucketed(spark, "cust_bkt"), Seq("user_id"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located: a sort-merge join with NO re-shuffle of either side
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS ev_bkt")
      spark.sql("DROP TABLE IF EXISTS cust_bkt")
    }
  }

  test("approx_count_distinct stays within HLL error of the exact count") {
    // the rows-only gate query's semantic backstop: 5% default rsd → the
    // estimate on the events fixture must sit well within 3σ of exact
    val ev = new graft.compile.ParquetEnv(spark, sfDir).load("events")
    val exact = ev.select(countDistinct(col("user_id"))).head.getLong(0)
    val approx = ev.select(approx_count_distinct(col("user_id"))).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.15)
  }

  test("streaming simhash dedup flags a duplicate arriving in a later batch") {
    val ms = MemoryStream[(Long, String)]
    val stream = ms.toDF().toDF("doc_id", "text")
    val pairs = graft.ext.Dedup.simhashPairsStream(stream, "text", "doc_id")
    val q = pairs.writeStream.format("memory").queryName("stream_dups")
      .outputMode("append").start()
    try {
      ms.addData((1L, "alpha beta gamma delta epsilon zeta"),
                 (2L, "completely unrelated content in this one here"))
      q.processAllAvailable()
      assert(spark.table("stream_dups").count() == 0)
      // duplicate of doc 1 arrives in a LATER batch → cross-batch state hit
      ms.addData((3L, "alpha beta gamma delta epsilon zeta"))
      q.processAllAvailable()
      val dups = spark.table("stream_dups").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(dups.toSeq == Seq((1L, 3L, 0)))
    } finally q.stop()
  }

  test("StoreKind.Persistent runs on RocksDB and is scoped to its own query") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val ms = MemoryStream[(String, java.sql.Timestamp)]
    ms.addData(("u1", ts("2024-01-01 10:00:05")), ("u1", ts("2024-01-01 10:00:15")),
               ("u2", ts("2024-01-01 10:00:25")))
    val env = new StreamEnv(spark, Map("clicks" -> ms.toDF().toDF("user", "ts")))
    val node = stream(Seq("clicks"),
        Consumed(keys = Seq("user"), eventTime = Some("ts")))
      .groupByKey.count(as = "n")
    val prev = spark.conf.getOption(providerKey)
    val q = graft.streaming.Runner.start(node, env, SinkSpec.Memory("rocks_counts"),
      graft.streaming.Runner.StreamsCfg(queryName = "rocks_counts",
        store = StoreKind.Persistent))
    try {
      q.processAllAvailable()
      // provider is observed from the running query's state-store metrics,
      // not the session conf — the conf is restored right after start()
      val metrics = q.lastProgress.stateOperators.head.customMetrics.keySet()
      assert(metrics.toString.contains("rocksdb"), metrics.toString)
      assert(spark.conf.getOption(providerKey) == prev) // no session leak
      val m = spark.table("rocks_counts").groupBy("user").agg(max("n").as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(m == Map("u1" -> 2L, "u2" -> 1L))

      // a SECOND topology launched with the default store in the SAME
      // session must NOT inherit RocksDB (the round-2 leak)
      val ms2 = MemoryStream[(String, java.sql.Timestamp)]
      ms2.addData(("u9", ts("2024-01-01 10:00:05")))
      val env2 = new StreamEnv(spark, Map("clicks" -> ms2.toDF().toDF("user", "ts")))
      val q2 = graft.streaming.Runner.start(node, env2,
        SinkSpec.Memory("default_counts"),
        graft.streaming.Runner.StreamsCfg(queryName = "default_counts"))
      try {
        q2.processAllAvailable()
        val m2 = q2.lastProgress.stateOperators.head.customMetrics.keySet()
        assert(!m2.toString.contains("rocksdb"), m2.toString)
      } finally q2.stop()
    } finally q.stop()
  }

  test("print! sink (console) starts and processes a batch") {
    val ms = MemoryStream[(Long, String)]
    ms.addData((1L, "a"))
    val env = new StreamEnv(spark, Map("t" -> ms.toDF().toDF("k", "v")))
    val q = graft.streaming.Runner.start(
      stream(Seq("t"), Consumed(keys = Seq("k"))), env, SinkSpec.Print,
      graft.streaming.Runner.StreamsCfg(queryName = "print_smoke",
        outputMode = "append"))
    try q.processAllAvailable() finally q.stop()
  }

  test("stream-stream left band join emits null-padded rows past watermark") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val lms = MemoryStream[(Long, java.sql.Timestamp)]
    val rms = MemoryStream[(Long, java.sql.Timestamp, String)]
    val env = new StreamEnv(spark, Map(
      "l" -> lms.toDF().toDF("k", "ts"),
      "r" -> rms.toDF().toDF("k", "rts", "tag")))
    val node = stream(Seq("l"), Consumed(keys = Seq("k"), eventTime = Some("ts")))
      .join(stream(Seq("r"), Consumed(keys = Seq("k"), eventTime = Some("rts"))),
        how = JoinHow.Left,
        window = Some(JoinWindow("10 seconds", "10 seconds")))
    val q = Compiler.compile(node, env).df.writeStream
      .format("memory").queryName("ss_left").outputMode("append").start()
    try {
      lms.addData((1L, ts("2024-01-01 10:00:00"))) // will match
      lms.addData((2L, ts("2024-01-01 10:00:00"))) // never matches
      rms.addData((1L, ts("2024-01-01 10:00:05"), "hit"))
      q.processAllAvailable()
      // advance both watermarks far past the band so the unmatched left
      // row can be finalized and emitted with nulls
      lms.addData((99L, ts("2024-01-01 12:00:00")))
      rms.addData((99L, ts("2024-01-01 12:00:00"), "wm"))
      q.processAllAvailable()
      val rows = spark.table("ss_left").collect()
      val k1 = rows.filter(_.getLong(0) == 1L)
      val k2 = rows.filter(_.getLong(0) == 2L)
      assert(k1.length == 1 && k1.head.getAs[String]("tag") == "hit")
      assert(k2.length == 1 && k2.head.isNullAt(k2.head.fieldIndex("tag")))
    } finally q.stop()
  }

  test("stream-stream outer band join keeps right-only rows past watermark") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val lms = MemoryStream[(Long, java.sql.Timestamp)]
    val rms = MemoryStream[(Long, java.sql.Timestamp, String)]
    val env = new StreamEnv(spark, Map(
      "l" -> lms.toDF().toDF("k", "ts"),
      "r" -> rms.toDF().toDF("k", "rts", "tag")))
    val node = stream(Seq("l"), Consumed(keys = Seq("k"), eventTime = Some("ts")))
      .join(stream(Seq("r"), Consumed(keys = Seq("k"), eventTime = Some("rts"))),
        how = JoinHow.Outer,
        window = Some(JoinWindow("10 seconds", "10 seconds")))
    val q = Compiler.compile(node, env).df.writeStream
      .format("memory").queryName("ss_outer").outputMode("append").start()
    try {
      lms.addData((1L, ts("2024-01-01 10:00:00"))) // matches
      rms.addData((1L, ts("2024-01-01 10:00:05"), "hit"))
      rms.addData((3L, ts("2024-01-01 10:00:00"), "right_only")) // no left
      q.processAllAvailable()
      lms.addData((99L, ts("2024-01-01 12:00:00"))) // advance watermarks
      rms.addData((99L, ts("2024-01-01 12:00:00"), "wm"))
      q.processAllAvailable()
      val rows = spark.table("ss_outer").collect()
      val k3 = rows.filter(_.getLong(0) == 3L) // key survives via coalesce
      assert(k3.length == 1 && k3.head.getAs[String]("tag") == "right_only")
      assert(k3.head.isNullAt(k3.head.fieldIndex("ts"))) // left side null
      assert(rows.filter(_.getLong(0) == 1L).head.getAs[String]("tag") == "hit")
    } finally q.stop()
  }
}

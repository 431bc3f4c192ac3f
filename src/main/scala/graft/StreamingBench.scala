package graft

import graft.ast._
import graft.ast.dsl._
import graft.compile.{Compiler, StreamEnv}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming throughput probe: replay the events fixture through a
  * MemoryStream-backed env into the windowed-count topology (the
  * anomaly-detection shape) in a few micro-batches, driving it to
  * completion. Measures end-to-end stateful-streaming cost at the bench
  * scale factor — the per-record path Kafka Streams would take.
  *
  * The fixture is replayed `replicas`× with the user-id key space shifted
  * per replica, so both row volume AND state volume scale ~10× over the
  * raw fixture — large enough that the measured figure is engine
  * throughput, not micro-batch scheduling latency. Returns
  * (rowsIngested, ingestSeconds): the timer covers addData → final state
  * only (fixture load/collect excluded), so rows/s is comparable across
  * rounds.
  */
object StreamingBench {

  def windowedCount(spark: SparkSession, sfDir: String,
                    replicas: Int = 10, batches: Int = 8): (Long, Double) = {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    // fixture ts is TIMESTAMP(NANOS); replay needs typed rows on the driver
    val rows = events
      .select(col("user_id"),
        expr("timestamp_micros(CAST(ts AS LONG) DIV 1000)").as("ts"),
        col("event_type"))
      .as[(Long, java.sql.Timestamp, String)]
      .collect()
    // disjoint user-id ranges per replica: state (one row per user×window)
    // grows with the replay, not just the row count
    val replayed: Array[(Long, java.sql.Timestamp, String)] =
      Array.tabulate(rows.length * replicas) { i =>
        val (u, t, e) = rows(i % rows.length)
        (u + (i / rows.length).toLong * 1000000000L, t, e)
      }
    val ms = MemoryStream[(Long, java.sql.Timestamp, String)]
    val env = new StreamEnv(spark,
      Map("events" -> ms.toDF().toDF("user_id", "ts", "event_type")))
    val topo = stream(Seq("events"),
        Consumed(keys = Seq("user_id"), eventTime = Some("ts")))
      .filter(col("event_type") === "click")
      .groupByKey
      .windowedBy(WindowSpec.Tumbling("1 hour"))
      .count(as = "clicks")
    val name = s"bench_wc_${System.nanoTime()}"
    // Stateful micro-batches pay per (partition × batch) state-store
    // overhead; 8 partitions is plenty for the probe's state volume and
    // measures the per-record path, not file bookkeeping. Restored after.
    // noop sink: a memory sink would collect every updated (user, window)
    // row to the driver each batch (~input volume in total) and dominate
    // the measurement; real deployments write to Kafka/parquet, so the
    // engine-side cost is the honest figure.
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "8"))
    val q = Compiler.compile(topo, env).df.writeStream
      .format("noop").queryName(name).outputMode("update").start()
    try {
      val t0 = System.nanoTime()
      var ingested = 0L
      replayed.grouped(math.max(1, replayed.length / batches)).foreach { batch =>
        ms.addData(batch.toSeq)
        q.processAllAvailable()
      }
      ingested = q.recentProgress.map(_.numInputRows).sum
      require(ingested == replayed.length,
        s"probe lost rows: $ingested of ${replayed.length}")
      (ingested, (System.nanoTime() - t0) / 1e9)
    } finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over event streams: regular resampling with gap
  * fill, and rolling aggregates over the regularized series — the shape
  * feature pipelines need before feeding fixed-rate models (a raw event
  * table has no row for a quiet hour; the model needs the zero).
  */
object TimeSeries {

  /** Per-key counts resampled onto a regular `bucketSeconds` grid, with
    * missing buckets between each key's first and last event filled with
    * zero. Returns (key, bucket_start seconds-since-epoch, n).
    *
    * Scale shape: one map-side-combined count shuffle on (key, bucket),
    * then a per-key min/max agg (tiny) whose `sequence` explode generates
    * the grid — grid rows never exceed span/bucket per key, and only
    * (key, long) pairs shuffle. The left join filling the gaps is
    * key+bucket equi-join, AQE-broadcastable when the observed counts are
    * sparse.
    */
  def resampleCounts(events: DataFrame, keyCol: String, tsCol: String,
                     bucketSeconds: Long): DataFrame = {
    val bucket = floor(unix_timestamp(col(tsCol)) / bucketSeconds).cast("long")
    val counts = events
      .groupBy(col(keyCol).as("key"), bucket.as("bucket"))
      .agg(count(lit(1)).cast("long").as("n"))
    val grid = counts.groupBy("key")
      .agg(min("bucket").as("lo"), max("bucket").as("hi"))
      .select(col("key"), explode(sequence(col("lo"), col("hi"))).as("bucket"))
    grid.join(counts, Seq("key", "bucket"), "left")
      .select(col("key"),
              (col("bucket") * bucketSeconds).as("bucket_start"),
              coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Per-key VALUE series resampled onto a regular grid with
    * last-observation-carried-forward (LOCF): each key's observations
    * land in buckets (the LATEST observation per bucket wins — ties at
    * equal ts break on the larger value, deterministically), the grid
    * spans the key's first..last bucket, and empty buckets carry the
    * most recent earlier value — the regularization sensor/metric
    * pipelines run before fixed-rate models. Counts get zeros
    * ([[resampleCounts]]); measurements get carried values (this).
    * NULL observations are dropped first (a missing reading is no
    * observation, not a zero). Returns (key, bucket_start, v,
    * observed); `v` is never NULL (each key's first grid bucket is its
    * first observation).
    *
    * Scale shape: one map-side-combined (key, bucket) max-struct
    * shuffle, the [[resampleCounts]] sequence-explode grid (rows ≤
    * span/bucket per key), and one per-key window for the carry — only
    * (key, long, value) rows ever shuffle; LOCF moves values without
    * arithmetic, so results are engine-exact.
    */
  def resampleLocf(events: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String, bucketSeconds: Long): DataFrame = {
    val bucket =
      floor(unix_timestamp(col(tsCol)) / bucketSeconds).cast("long")
    val obs = events
      .where(col(valueCol).isNotNull)
      .select(col(keyCol).as("key"), bucket.as("bucket"),
        col(tsCol).as("__ts"), col(valueCol).as("__v"))
      .groupBy(col("key"), col("bucket"))
      .agg(max(struct(col("__ts"), col("__v"))).as("__last"))
      .select(col("key"), col("bucket"), col("__last.__v").as("v_obs"))
    val grid = obs.groupBy("key")
      .agg(min("bucket").as("lo"), max("bucket").as("hi"))
      .select(col("key"),
        explode(sequence(col("lo"), col("hi"))).as("bucket"))
    val carry = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("key", "bucket"), "left")
      .select(col("key"),
        (col("bucket") * bucketSeconds).as("bucket_start"),
        last(col("v_obs"), ignoreNulls = true).over(carry).as("v"),
        col("v_obs").isNotNull.as("observed"))
  }

  /** Rolling sum of the last `window` buckets (current included) over an
    * already-regular series — integer-valued, so results are deterministic
    * and engine-portable (a rolling MEAN would differ in last-ulp float
    * division order). Partitions by key: each key's series sorts
    * independently, so the shuffle is one hash exchange, and skew equals
    * the longest single series, not the corpus.
    */
  def rollingSum(series: DataFrame, keyCol: String, orderCol: String,
                 valCol: String, window: Int): Column =
    sum(col(valCol)).over(
      Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
        .rowsBetween(-(window - 1), 0))

  /** Volume-anomaly detection over a resampled series (the reference's
    * flagship example domain, `examples/ksml/examples/anomaly_detection
    * .clj`, as a batch diagnostic): z-score each key's bucket counts
    * against that key's own mean/stddev and keep buckets `zMin` deviations
    * or more above it. Gap-filled via [[resampleCounts]] first — a quiet
    * hour is a zero that belongs in the baseline, not a missing row.
    *
    * Scale shape: resample's count shuffle, then per-key moments via one
    * window pass (no second shuffle — the window partitions on the key the
    * counts already hash by). Population stddev of integer counts keeps
    * the z-scores engine-portable.
    */
  def anomalousWindows(events: DataFrame, keyCol: String, tsCol: String,
                       bucketSeconds: Long, zMin: Double): DataFrame = {
    val series = resampleCounts(events, keyCol, tsCol, bucketSeconds)
    val byKey = Window.partitionBy(col("key"))
    series
      .withColumn("mu", avg(col("n")).over(byKey))
      .withColumn("sigma", stddev_pop(col("n")).over(byKey))
      .where(col("sigma") > 0 &&
        (col("n") - col("mu")) / col("sigma") >= zMin)
      .select(col("key"), col("bucket_start"), col("n"),
              ((col("n") - col("mu")) / col("sigma")).as("z"))
  }

  /** Robust variant of [[anomalousWindows]]: median/MAD instead of
    * mean/stddev — a burst no longer inflates its own baseline, so a
    * series that is quiet except for one incident still flags the
    * incident (mean/σ can swallow it: the outlier drags μ up and σ
    * wide). `rz = (n − median) / MAD`; flags `rz ≥ zMin`, keys with
    * MAD = 0 (over half the buckets identical) are skipped like σ = 0.
    *
    * Scale shape: the regularized series persists once and feeds both
    * statistics; median and MAD are per-key exact `percentile`
    * aggregates (tiny results, broadcast back) — two small shuffles on
    * the key, no window over the full series.
    */
  def anomalousWindowsRobust(events: DataFrame, keyCol: String,
                             tsCol: String, bucketSeconds: Long,
                             zMin: Double): DataFrame = {
    val series = OpCaches.register(
      resampleCounts(events, keyCol, tsCol, bucketSeconds)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val med = series.groupBy(col("key"))
      .agg(expr("percentile(n, 0.5)").as("med"))
    val dev = series.join(broadcast(med), Seq("key"))
    val mad = dev.groupBy(col("key"))
      .agg(expr("percentile(abs(n - med), 0.5)").as("mad"))
    dev.join(broadcast(mad), Seq("key"))
      .where(col("mad") > 0 &&
        (col("n") - col("med")) / col("mad") >= zMin)
      .select(col("key"), col("bucket_start"), col("n"),
              ((col("n") - col("med")) / col("mad")).as("rz"))
  }
}

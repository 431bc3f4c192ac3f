package graft

import graft.ext.{IntervalJoin, Layout}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range/interval joins (binned equi-join vs brute-force theta join) and
  * the Z-order layout (key correctness vs a reference Morton encode;
  * multi-dimensional file skipping vs a single-column sort).
  */
class IntervalLayoutSpec extends SparkSpecBase {

  import spark.implicits._

  // -------------------- interval joins -------------------- //

  private def brutePoints(points: DataFrame, intervals: DataFrame): Set[(Long, Long, Long)] =
    intervals.crossJoin(points)
      .where(col("p").between(col("s"), col("e")))
      .select(col("iid"), col("pid"), col("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("pointInInterval == brute force, incl. boundary ties and negatives") {
    // intervals crossing zero, zero-length, adjacent, and bin-spanning;
    // points sitting exactly on starts, ends, and bin edges
    val intervals = Seq(
      (1L, -25L, -3L), (2L, -5L, 5L), (3L, 0L, 0L), (4L, 7L, 49L),
      (5L, 10L, 10L), (6L, 50L, 51L), (7L, 100L, 40L) // reversed: matches nothing
    ).toDF("iid", "s", "e")
    val points = Seq.tabulate(40)(i => (i.toLong, i * 3L - 30L))
      .toDF("pid", "p")
    for (w <- Seq(1L, 7L, 10L, 1000L)) {
      val got = IntervalJoin.pointInInterval(points, intervals, "p", "s", "e", w)
        .select(col("iid"), col("pid"), col("p"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.length == got.toSet.size, s"duplicate pairs at binWidth=$w")
      assert(got.toSet == brutePoints(points, intervals), s"binWidth=$w")
    }
  }

  test("intervalOverlap == brute force, each pair exactly once") {
    val left = Seq((1L, 0L, 10L), (2L, 5L, 100L), (3L, -20L, -11L), (4L, 40L, 40L))
      .toDF("lid", "ls", "le")
    val right = Seq((10L, 10L, 12L), (20L, -15L, 0L), (30L, 99L, 200L),
                    (40L, 41L, 50L), (50L, 3L, 4L))
      .toDF("rid", "rs", "re")
    val brute = left.crossJoin(right)
      .where(col("ls") <= col("re") && col("rs") <= col("le"))
      .select(col("lid"), col("rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(1L, 8L, 64L)) {
      val got = IntervalJoin.intervalOverlap(left, right,
          "ls", "le", "rs", "re", w)
        .select(col("lid"), col("rid"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size,
        s"pair emitted twice at binWidth=$w (first-shared-bin dedup broken)")
      assert(got.toSet == brute, s"binWidth=$w")
    }
  }

  test("join_interval gate query == brute-force theta join on fixtures") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val intervals = li.where(col("l_quantity") === 50)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").cast("timestamp").cast("long").as("s"),
        (col("l_shipdate").cast("timestamp").cast("long") +
          col("l_linenumber").cast("long") * lit(2L * 86400)).as("e"))
    val points = o.select(col("o_orderkey"), col("o_orderdate").cast("timestamp").cast("long").as("p"))
    val binned = IntervalJoin.pointInInterval(points, intervals, "p", "s", "e",
        binWidth = 14L * 86400)
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("n"))
    val brute = intervals.crossJoin(points)
      .where(col("p").between(col("s"), col("e")))
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("n"))
    assert(binned.except(brute).isEmpty && brute.except(binned).isEmpty)
    assert(binned.count() > 0, "fixture query must be non-trivial")
  }

  test("pointInInterval enriches a STREAM against static intervals") {
    // the campaign-window enrichment shape: events stream in, the interval
    // table is static — the bin join compiles to a stream-static equi-join
    // (per-batch broadcastable), which a raw theta-join condition would not
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val intervals = Seq((100L, 0L, 9L), (200L, 20L, 39L)).toDF("iid", "s", "e")
    val ms = MemoryStream[(Long, Long)]
    val points = ms.toDF().toDF("pid", "p")
    val q = IntervalJoin.pointInInterval(points, intervals, "p", "s", "e",
        binWidth = 10L)
      .select(col("pid"), col("iid"))
      .writeStream.format("memory").queryName("stream_interval")
      .outputMode("append").start()
    try {
      ms.addData((1L, 5L), (2L, 15L), (3L, 25L))
      q.processAllAvailable()
      ms.addData((4L, 39L), (5L, 40L))
      q.processAllAvailable()
      val got = spark.table("stream_interval").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 100L), (3L, 200L), (4L, 200L)),
        s"point 2 (gap) and point 5 (past end) must not match — got $got")
    } finally q.stop()
  }

  // -------------------- z-order layout -------------------- //

  /** Reference Morton encode (bit-by-bit, the textbook formulation). */
  private def morton(xs: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (b <- 0 until bits; (x, i) <- xs.zipWithIndex)
      z |= ((x >> b) & 1L) << (b * xs.size + i)
    z
  }

  test("zorderKey == reference Morton encode (2-dim and 3-dim)") {
    val rows = for (x <- 0L until 64L by 7L; y <- 0L until 64L by 5L)
      yield (x, y, (x * 31 + y) % 64)
    val df = rows.toDF("x", "y", "w")
    val got2 = df.select(col("x"), col("y"),
        Layout.zorderKey(Seq(col("x"), col("y")), 6).as("z"))
      .collect()
    got2.foreach { r =>
      assert(r.getLong(2) == morton(Seq(r.getLong(0), r.getLong(1)), 6))
    }
    val got3 = df.select(col("x"), col("y"), col("w"),
        Layout.zorderKey(Seq(col("x"), col("y"), col("w")), 6).as("z"))
      .collect()
    got3.foreach { r =>
      assert(r.getLong(3) == morton(Seq(r.getLong(0), r.getLong(1), r.getLong(2)), 6))
    }
  }

  test("z-order layout prunes on the NON-sorted dimension; 1-col sort can't") {
    // 64×64 grid. A y-slice predicate must touch every x-sorted file (each
    // covers all of y) but only the z-ordered files whose y-range overlaps.
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    Layout.writeZOrdered(grid, Seq(col("x"), col("y")), 6, s"$base/z",
      numFiles = 8)
    grid.repartitionByRange(8, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(s"$base/x")

    def filesOverlappingYSlice(path: String): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name()).agg(min(col("y")).as("lo"))
        .where(col("lo") < 8) // file's y-range overlaps y ∈ [0, 8)
        .count()
    val zFiles = filesOverlappingYSlice(s"$base/z")
    val xFiles = filesOverlappingYSlice(s"$base/x")
    assert(xFiles == 8, s"every x-sorted file spans all y, got $xFiles")
    assert(zFiles <= xFiles / 2,
      s"z-layout should skip most files on a y predicate: $zFiles vs $xFiles")
    // layout is a re-ordering, not a transformation
    assert(spark.read.parquet(s"$base/z").count() == 64 * 64)
  }
}

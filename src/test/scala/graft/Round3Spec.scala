package graft

import graft.ast._
import graft.ast.dsl._
import graft.compile.{Compiler, StreamEnv}
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Round-3 hardening specs: bounded streaming simhash state (in-kernel
  * cross-bucket dedup, no trailing dropDuplicates stage), and the fused
  * shingle-hash / sorted-merge-Jaccard expressions that replace the
  * interpreted HOF + array_intersect/array_union verify path.
  */
class Round3Spec extends SparkSpecBase {

  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("streaming simhash state is bounded: pairs emitted once, in-kernel") {
    val ms = MemoryStream[(Long, String)]
    val stream = ms.toDF().toDF("doc_id", "text")
    val pairs = graft.ext.Dedup.simhashPairsStream(stream, "text", "doc_id")
    val q = pairs.writeStream.format("memory").queryName("bounded_dups")
      .outputMode("append").start()
    try {
      // n identical docs share ALL 4 pigeonhole buckets — every pair is
      // visible from 4 buckets, so in-kernel dedup (emit only from the
      // pair's lowest matching chunk) is load-bearing here
      val n = 12
      (1 to n).foreach(i => ms.addData((i.toLong, "alpha beta gamma delta")))
      q.processAllAvailable()
      val emitted = spark.table("bounded_dups").count()
      assert(emitted == n * (n - 1) / 2, s"each pair exactly once, got $emitted")

      // exactly ONE stateful operator (round 2 had a second, unbounded
      // dropDuplicates stage), and its state is the per-bucket lists — 4
      // buckets here — NOT one row per emitted pair
      val ops = q.lastProgress.stateOperators
      assert(ops.length == 1, s"want 1 stateful op, got ${ops.length}")
      val stateRows = ops.head.numRowsTotal
      assert(stateRows == 4, s"state = 4 bucket lists, got $stateRows")
      assert(stateRows < emitted, "state must not scale with emitted pairs")
    } finally q.stop()
  }

  test("streaming simhash near-dups across buckets still emit exactly once") {
    // hamming-1 pair: signatures differ in one bit → 3 of 4 chunks match;
    // the kernel must emit from the lowest matching chunk only
    val ms = MemoryStream[(Long, String)]
    val stream = ms.toDF().toDF("doc_id", "text")
    // craft hamming-distance-1 via the kernel's own signature function:
    // find two fixture-ish strings whose simhash differs in ≤ 3 bits is
    // flaky — instead reuse identical text (hamming 0, all 4 chunks match)
    // plus a near variant, and assert no pair is double-emitted
    val pairs = graft.ext.Dedup.simhashPairsStream(stream, "text", "doc_id")
    val q = pairs.writeStream.format("memory").queryName("xbucket_dups")
      .outputMode("append").start()
    try {
      ms.addData((1L, "the quick brown fox jumps over the lazy dog"))
      q.processAllAvailable()
      ms.addData((2L, "the quick brown fox jumps over the lazy dog again"),
                 (3L, "the quick brown fox jumps over the lazy dog"))
      q.processAllAvailable()
      val rows = spark.table("xbucket_dups").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.length == rows.distinct.length, s"double emission: ${rows.toSeq}")
      assert(rows.contains((1L, 3L)), s"missed the exact dup: ${rows.toSeq}")
    } finally q.stop()
  }

  test("streaming minhash kernel: cross-batch dup once, bounded state") {
    val ms = MemoryStream[(Long, String)]
    val stream = ms.toDF().toDF("doc_id", "text")
    val pairs = graft.ext.Dedup.minhashPairsStream(stream, "text", "doc_id")
    val q = pairs.writeStream.format("memory").queryName("mh_stream")
      .outputMode("append").start()
    try {
      ms.addData((1L, "the quick brown fox jumps over the lazy dog"),
                 (2L, "entirely different words appear in this document text"))
      q.processAllAvailable()
      assert(spark.table("mh_stream").count() == 0)
      // identical doc in a LATER batch: collides in all 16 bands — the
      // in-kernel first-matching-band dedup must emit exactly once
      ms.addData((3L, "the quick brown fox jumps over the lazy dog"))
      q.processAllAvailable()
      val rows = spark.table("mh_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows.toSeq == Seq((1L, 3L, 1.0)), rows.toSeq.toString)
      assert(q.lastProgress.stateOperators.length == 1)
    } finally q.stop()
  }

  test("session retention evicts closed sessions; late records are dropped") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(sec: Int) = new java.sql.Timestamp(t0.getTime + sec * 1000L)
    val ms = MemoryStream[(String, java.sql.Timestamp, Double)]
    val env = new StreamEnv(spark, Map("ev" -> ms.toDF().toDF("u", "ts", "v")))
    val node = SessionAggregateOp[Long](
      stream(Seq("ev"), Consumed(keys = Seq("u"), eventTime = Some("ts")))
        .groupByKey,
      gap = "1 minute",
      initializer = () => 0L,
      aggregator = (b, _) => b + 1,
      merger = (x, y) => x + y,
      finisher = b => Row(b),
      outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType))),
      retention = Some("2 minutes"))
    val q = Compiler.compile(node, env).df.writeStream
      .format("memory").queryName("sess_ret").outputMode("append").start()
    try {
      ms.addData(("u1", ts(0), 1.0), ("u2", ts(10), 1.0))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.head.numRowsTotal == 2)
      // watermark jumps to 600-120 = 480s AFTER this batch commits
      ms.addData(("u3", ts(600), 1.0))
      q.processAllAvailable()
      // u1/u2 sessions ended at 60/70s ≤ wm 480s → evicted; a record past
      // retention is dropped by the watermark before it reaches the kernel
      ms.addData(("u3", ts(610), 1.0), ("u1", ts(30), 1.0))
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows == 1, s"only u3's open session may remain, got $stateRows")
      val perUser = spark.table("sess_ret").groupBy("u").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(perUser("u1") == 1, s"late u1 record must not re-open: $perUser")
    } finally q.stop()
  }

  test("struct-row kernel state survives a checkpoint kill/recover") {
    // the encoder change's operational claim: table-join state is a plain
    // struct row in the checkpoint, and a restarted query resumes from it —
    // the left value arrives BEFORE the kill, the right side only AFTER, so
    // the post-restart join row can only come from recovered state
    val lms = MemoryStream[(Long, String, Long)]
    val rms = MemoryStream[(Long, Double, Long)]
    val env = new StreamEnv(spark, Map(
      "lt" -> lms.toDF().toDF("k", "name", "off"),
      "rt" -> rms.toDF().toDF("k", "score", "off")))
    val node = table("lt", Consumed(keys = Seq("k")), orderBy = Some("off"))
      .join(table("rt", Consumed(keys = Seq("k")), orderBy = Some("off")))
    val dir = java.nio.file.Files.createTempDirectory("graft_ttckpt").toString
    // memory sinks don't support checkpoint recovery — use the parquet sink
    def start() = Compiler.compile(node, env).df.writeStream
      .format("parquet").option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt").outputMode("append").start()
    val q1 = start()
    try {
      lms.addData((7L, "gamma", 1L))
      q1.processAllAvailable()
    } finally q1.stop() // kill: inner join emitted nothing (right missing)
    val q2 = start() // recover from checkpoint
    try {
      rms.addData((7L, 0.25, 1L))
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = spark.read.parquet(s"$dir/out").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("name") == "gamma") // recovered left
    assert(rows.head.getAs[Double]("score") == 0.25)
  }

  test("sampleByMixture: deterministic, nested across fractions, exact at 0/1") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def ids(f: Map[String, Double]) =
      graft.ext.Pipeline.sampleByMixture(docs, "lang", "doc_id", f)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val total = docs.count()
    assert(ids(Map("en" -> 1.0)).size == total) // keep-all is exact
    val noEn = graft.ext.Pipeline.sampleByMixture(
      docs, "lang", "doc_id", Map("en" -> 0.0))
    assert(noEn.where(col("lang") === "en").count() == 0) // drop-all is exact
    // the same ids survive on a rerun, and a tighter fraction keeps a
    // strict SUBSET of a looser one (hash-threshold nesting)
    val half = ids(Map("en" -> 0.5))
    assert(half == ids(Map("en" -> 0.5)))
    val quarter = ids(Map("en" -> 0.25))
    assert(quarter.subsetOf(half))
    assert(quarter.size < half.size)
  }

  test("packSequences: exact global offsets without a global window") {
    // crafted: budget 10, token counts 4/4/4/9 in id order
    // starts 0,4,8,12 → bins (0,0) (0,0) (0,1: spans 8..11) (1,2: 12..20)
    val docs = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 9L))
      .toDF("doc_id", "n")
      .repartition(3) // arbitrary input partitioning must not matter
    val out = graft.ext.Pipeline.packSequences(docs, "doc_id", col("n"), 10L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1L, 0L, 0L, 0L), (2L, 4L, 0L, 0L),
                            (3L, 8L, 0L, 1L), (4L, 12L, 1L, 2L)))
    // offsets equal the sum of all lower-id token counts on real data too
    val dd = spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
    val packed = graft.ext.Pipeline.packSequences(
      dd, "doc_id", graft.ext.TextAnalysis.tokenCount(col("text")), 512L)
    val viaWindow = dd.select(col("doc_id"),
        graft.ext.TextAnalysis.tokenCount(col("text")).as("tok"))
      .withColumn("start", coalesce(sum(col("tok")).over(
        org.apache.spark.sql.expressions.Window.orderBy("doc_id")
          .rowsBetween(Long.MinValue, -1)), lit(0L)))
    val mismatch = packed.select(col("id").as("doc_id"), col("start"))
      .join(viaWindow.select(col("doc_id"), col("start").as("want")), Seq("doc_id"))
      .where(col("start") =!= col("want")).count()
    assert(mismatch == 0)
    // fewer distinct ids than shuffle partitions → empty range partitions,
    // whose tasks still read their offset eagerly (regression: OOB index)
    val tiny = Seq((1L, 3L), (2L, 5L)).toDF("doc_id", "n")
    val t = graft.ext.Pipeline.packSequences(tiny, "doc_id", col("n"), 4L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    assert(t.toSeq == Seq((1L, 0L), (2L, 3L)))
  }

  test("clusters: chains collapse to one component, min-id label") {
    // chain 1-2-3 (1≁3 directly), separate pair 5-6, plus 8-2 joining late:
    // everything reachable gets the cluster min
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 2L))
      .toDF("id_a", "id_b")
    val out = graft.ext.Dedup.clusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 8L -> 1L,
                      5L -> 5L, 6L -> 5L))
  }

  test("canonicalize keeps one preferred representative per cluster") {
    // cluster {1,2,3} (chain), cluster {5,6}; 4 untouched. Preference =
    // longest text: doc 2 wins its cluster, doc 6 wins the pair; ties on
    // length fall back to smallest id (docs 5/6 equal → 5... make 6 longer)
    val corpus = Seq(
      (1L, "aa"), (2L, "aaaa"), (3L, "aaa"),
      (4L, "untouched"), (5L, "bb"), (6L, "bbb")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = graft.ext.Dedup.canonicalize(corpus, pairs, "doc_id",
        prefer = Seq(length(col("text")).desc))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L, 6L))

    // default preference = smallest id (the pure survivor rule)
    val keptDefault = graft.ext.Dedup.canonicalize(corpus, pairs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptDefault == Set(1L, 4L, 5L))
  }

  test("incrementalExact: batch vs corpus anti-dedup plus in-batch collapse") {
    val corpus = Seq((10L, "seen before"), (11L, "also seen"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (20L, "seen before"),   // dup of corpus → dropped
      (21L, "brand new"),     // first of an in-batch dup pair → kept
      (22L, "brand new"),     // in-batch dup, larger id → dropped
      (23L, "unique")         // kept
    ).toDF("doc_id", "text")
    val kept = graft.ext.Dedup.incrementalExact(incoming, corpus)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(21L, 23L))
  }

  test("topBigramStats: dominant-bigram count and distinct bigrams per doc") {
    val docs = Seq(
      (1L, "spam spam spam spam"),  // bigrams: 3× "spam spam"
      (2L, "a b a b a"),            // "a b"×2, "b a"×2
      (3L, "one"),                  // < 2 tokens → absent
      (4L, "w x y z")               // 3 distinct bigrams, each once
    ).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.topBigramStats(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(
      1L -> ((1L, 3L)),
      2L -> ((2L, 2L)),
      4L -> ((3L, 1L))))
  }

  test("writePartitioned: pruned directories, capped sorted files") {
    val ev = new graft.compile.ParquetEnv(spark, sfDir).load("events")
      .select(col("event_id"), col("user_id"), col("event_type"))
    val out = java.nio.file.Files.createTempDirectory("wp").toString
    graft.ext.Bucketing.writePartitioned(ev, out,
      partitionCols = Seq("event_type"), sortCols = Seq("user_id"),
      maxRecordsPerFile = 500L)

    // one directory per event_type value
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("event_type=")).sorted
    val types = ev.select("event_type").distinct()
      .collect().map(r => s"event_type=${r.getString(0)}").sorted
    assert(dirs.toSeq == types.toSeq)

    // file cap respected, and rows inside each file sorted by user_id
    val files = dirs.flatMap(dn => new java.io.File(s"$out/$dn").listFiles()
      .filter(_.getName.endsWith(".parquet")))
    assert(files.nonEmpty)
    files.foreach { f =>
      val rows = spark.read.parquet(f.getAbsolutePath)
        .select("user_id").collect().map(_.getLong(0))
      assert(rows.length <= 500, s"${f.getName}: ${rows.length} rows > cap")
      assert(rows.sameElements(rows.sorted), s"${f.getName} not sorted")
    }

    // read-back with a partition predicate prunes to one directory
    val back = spark.read.parquet(out).where(col("event_type") === "click")
    val scan = back.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("event_type"),
      "partition predicate must prune directories, not filter rows")
    assert(back.count() ==
      ev.where(col("event_type") === "click").count())
  }

  test("resampleCounts gap-fills quiet buckets; rollingSum spans them") {
    // user 1: events in buckets 0, 2 (bucket 1 is quiet → explicit zero);
    // user 2: single event (one-bucket grid, no fill)
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:30")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:45")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:02:10")),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 05:00:00"))
    ).toDF("user_id", "ts")
    val grid = graft.ext.TimeSeries.resampleCounts(ev, "user_id", "ts", 60L)
    val out = grid
      .select(col("key"), col("bucket_start"), col("n"),
        graft.ext.TimeSeries.rollingSum(grid, "key", "bucket_start", "n", 3)
          .cast("long").as("roll"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    val b2 = java.sql.Timestamp.valueOf("2024-01-01 05:00:00").getTime / 1000
    assert(out.toSeq == Seq(
      (1L, base, 2L, 2L),        // bucket 0: two events
      (1L, base + 60, 0L, 2L),   // gap-filled zero; rolling still sees 2
      (1L, base + 120, 1L, 3L),  // bucket 2: rolling = 2+0+1
      (2L, b2, 1L, 1L)))
  }

  test("bigramFamiliarity computes corpus-count statistics per doc") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x"))
      .toDF("doc_id", "text")
    // corpus bigram counts: "a b"→3, "b a"→1, "b c"→1
    val out = graft.ext.TextAnalysis.bigramFamiliarity(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      1L -> ((3L, 7L, 2L)),  // a b, b a, a b → 3+1+3, two occurrences known
      2L -> ((2L, 4L, 1L)))) // a b, b c → 3+1; doc 3 has no bigrams
  }

  test("word_bigram_hashes = xxhash64 over the HOF bigram chain") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
    val mismatch = docs.select(
        graft.functions.VectorFunctions.word_bigram_hashes(col("text")).as("fused"),
        transform(graft.ext.TextAnalysis.bigrams(col("text")),
                  b => xxhash64(b)).as("chain"))
      .where(col("fused") =!= col("chain"))
      .count()
    assert(mismatch == 0)
  }

  test("word_shingle_hashes = sorted distinct xxhash64 of word_shingles") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
    val mismatch = docs.select(
        graft.functions.VectorFunctions.word_shingle_hashes(col("text"), 3).as("fused"),
        array_sort(array_distinct(transform(
          graft.functions.VectorFunctions.word_shingles(col("text"), 3),
          s => xxhash64(s)))).as("chain"))
      .where(col("fused") =!= col("chain"))
      .count()
    assert(mismatch == 0)
  }

  test("native text expressions agree with HOF chains on edge-case inputs") {
    // inputs the fixture never produces: empty, whitespace-only, single
    // token, runs of spaces, multibyte (CJK/emoji/combining), very long
    val edge = Seq("", " ", "   ", "one", "a b", "a  b   c", "tab\tnot split",
      "日本 語 テスト", "emoji 🙂 mixé Ωmega", "a " * 500 + "end",
      "x") .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = edge.toDF("id", "text")
    val sh = df.select(
        graft.functions.VectorFunctions.word_shingle_hashes(col("text"), 3).as("fused"),
        array_sort(array_distinct(transform(
          graft.functions.VectorFunctions.word_shingles(col("text"), 3),
          s => xxhash64(s)))).as("chain"))
      .where(col("fused") =!= col("chain")).count()
    assert(sh == 0, "word_shingle_hashes edge mismatch")
    val bg = df.select(
        graft.functions.VectorFunctions.word_bigram_hashes(col("text")).as("fused"),
        transform(graft.ext.TextAnalysis.bigrams(col("text")),
                  b => xxhash64(b)).as("chain"))
      .where(col("fused") =!= col("chain")).count()
    assert(bg == 0, "word_bigram_hashes edge mismatch")
    // minhash lanes: deterministic across evaluations and length == lanes
    val mh = df.select(graft.functions.VectorFunctions.minhash_lanes(
        graft.functions.VectorFunctions.word_shingle_hashes(col("text"), 3),
        32).as("sig"))
      .where(size(col("sig")) =!= 32).count()
    assert(mh == 0, "minhash_lanes must always emit exactly 32 lanes")
  }

  test("sorted_jaccard = size(intersect)/size(union) on shingle-hash sets") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(60)
      .select(col("doc_id"),
        graft.functions.VectorFunctions.word_shingle_hashes(col("text"), 3).as("sh"))
    val a = docs.toDF("id_a", "sh_a")
    val b = docs.toDF("id_b", "sh_b")
    val mismatch = a.crossJoin(b).where(col("id_a") < col("id_b"))
      .select(
        graft.functions.VectorFunctions.sorted_jaccard(col("sh_a"), col("sh_b")).as("fused"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
         size(array_union(col("sh_a"), col("sh_b")))).as("chain"))
      .where(abs(col("fused") - col("chain")) > 1e-12)
      .count()
    assert(mismatch == 0)
    // empty ∩ empty is defined as identical (1.0), not NaN
    graft.functions.VectorFunctions.register(spark)
    val e = spark.sql(
      "SELECT sorted_jaccard(CAST(array() AS array<bigint>), " +
      "CAST(array() AS array<bigint>)) AS j").head.getDouble(0)
    assert(e == 1.0)
  }
}

package graft

import graft.ext.{Dedup, Pipeline, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-3 corpus-management operators: C4 rule filter, span-level
  * boilerplate dedup, token-budget selection, leakage-safe splits.
  */
class CorpusOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("c4Rules: each rule fails on its crafted offender, passes the good doc") {
    val good = (1 to 30).map(i => s"word$i").mkString(" ") + " the a of"
    val tooShort = "just a few words here"
    val noStop = (1 to 30).map(i => s"token$i").mkString(" ")
    val repeated = (("spam spam " * 20).trim + " the a")
    val longWord = good + " " + ("x" * 30)
    val df = Seq(
      (1L, good), (2L, tooShort), (3L, noStop), (4L, repeated), (5L, longWord)
    ).toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.c4Rules(col("text")).as("c4"))
      .select(col("doc_id"), col("c4.*"))
    val rows = df.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Boolean]("keep"))
    assert(!rows(2L).getAs[Boolean]("keep")) // n_words < 20
    assert(rows(2L).getAs[Long]("n_words") == 5)
    assert(!rows(3L).getAs[Boolean]("keep")) // stop_ratio = 0
    assert(rows(3L).getAs[Double]("stop_ratio") == 0.0)
    assert(!rows(4L).getAs[Boolean]("keep")) // rep_ratio too high
    assert(rows(4L).getAs[Double]("rep_ratio") > 0.6)
    assert(!rows(5L).getAs[Boolean]("keep")) // 30-char word
    assert(rows(5L).getAs[Long]("max_word_len") == 30)
  }

  test("gopherRules: layout/symbol rules fire on crafted offenders") {
    // 60 words with the/of/and present → passes every rule
    val good = (1 to 57).map(i => s"word$i").mkString(" ") + " the of and"
    // >90% of lines bullet-led
    val bullets = (1 to 20).map(i => s"- item$i point$i detail$i")
      .mkString("\n") + "\nplain the of and " +
      (1 to 40).map(i => s"w$i").mkString(" ")
    // >30% of lines end in ellipsis
    val trailing = (1 to 10).map(i => s"teaser$i cut off here...")
      .mkString("\n") + "\n" + good
    // symbol spam: one '#' per word
    val hashy = (1 to 57).map(i => s"#tag$i").mkString(" ") + " the of and"
    // words are digit-runs → alpha_word_ratio ≈ 0
    val numeric = (1 to 57).map(i => s"${i}00${i}").mkString(" ") + " the of and"
    val df = Seq(
      (1L, good), (2L, bullets), (3L, trailing), (4L, hashy), (5L, numeric)
    ).toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.gopherRules(col("text")).as("g"))
      .select(col("doc_id"), col("g.*"))
    val rows = df.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Boolean]("keep"))
    assert(!rows(2L).getAs[Boolean]("keep")) // bullet_ratio 20/21 > 0.9
    assert(rows(2L).getAs[Double]("bullet_ratio") > 0.9)
    assert(!rows(3L).getAs[Boolean]("keep")) // ellipsis_ratio 10/11 > 0.3
    assert(rows(3L).getAs[Double]("ellipsis_ratio") > 0.3)
    assert(!rows(4L).getAs[Boolean]("keep")) // symbol_ratio 57/60 > 0.1
    assert(rows(4L).getAs[Double]("symbol_ratio") > 0.1)
    assert(!rows(5L).getAs[Boolean]("keep")) // alpha_word_ratio 3/60 < 0.8
    assert(rows(5L).getAs[Double]("alpha_word_ratio") < 0.8)
    assert(rows(5L).getAs[Long]("stop_hits") == 3L)
  }

  test("dedupSpans cuts corpus-frequent spans, keeps order, rewrites all docs") {
    val boiler = "this site uses cookies accept to continue reading"  // 9 words → spans (8) + (1)
    val spanWords = 4
    // "this site uses cookies" + "accept to continue reading" as 4-word spans
    val docs = Seq(
      (1L, s"$boiler alpha beta gamma delta"),
      (2L, s"$boiler epsilon zeta eta theta"),
      (3L, s"$boiler iota kappa lambda mu"),
      (4L, boiler), // entirely boilerplate
      (5L, "completely unique text with no shared spans at all")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSpans(docs, "text", "doc_id",
        spanWords = spanWords, maxDocFreq = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out.size == 5, "every input doc must appear in the output")
    // the two boilerplate spans appear in 4 docs > maxDocFreq=2 → cut;
    // the 4-word unique tails survive intact
    assert(out(1L)._1 == "alpha beta gamma delta")
    assert(out(2L)._1 == "epsilon zeta eta theta")
    assert(out(3L)._1 == "iota kappa lambda mu")
    assert(out(4L) == (("", 0L)), "all-boilerplate doc survives empty")
    assert(out(5L)._1 == "completely unique text with no shared spans at all")
    assert(out(5L)._2 == 3) // 11 words → ceil(11/4) = 3 spans, all kept
  }

  test("dedupSpans keeps interior order when a middle span is cut") {
    val shared = "one two three four"
    val docs = Seq(
      (1L, s"aa bb cc dd $shared ee ff gg hh"),
      (2L, s"ii jj kk ll $shared mm nn oo pp"),
      (3L, s"qq rr ss tt $shared uu vv ww xx")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSpans(docs, "text", "doc_id",
        spanWords = 4, maxDocFreq = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "aa bb cc dd ee ff gg hh")
    assert(out(2L) == "ii jj kk ll mm nn oo pp")
  }

  test("selectToBudget keeps the per-key prefix within the token budget") {
    val df = Seq(
      ("web", 1L, 400L), ("web", 2L, 300L), ("web", 3L, 300L), ("web", 4L, 100L),
      ("code", 5L, 900L), ("code", 6L, 200L)
    ).toDF("source", "doc_id", "tok")
    val kept = Pipeline.selectToBudget(df, "source", col("tok"),
        budget = 1000L, orderCols = Seq(col("tok").desc, col("doc_id")))
      .select(col("doc_id"), col("cum_tokens"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // web: 400 (d1) + 300 (d2) + 300 (d3) = 1000 ≤ budget; d4 would exceed
    assert(kept.keySet == Set(1L, 2L, 3L, 5L))
    assert(kept(3L) == 1000L)
    assert(kept(5L) == 900L) // code: 900, then 900+200 > 1000 cuts d6
  }

  test("incrementalExactBloom: drops every true dup, rarely drops new docs") {
    val corpus = (0L until 400L).map(i => (i, s"corpus document number $i"))
      .toDF("doc_id", "text")
    val dups = (0L until 100L).map(i => (1000L + i, s"corpus document number $i"))
    val fresh = (0L until 300L).map(i => (2000L + i, s"brand new text $i"))
    val incoming = (dups ++ fresh).toDF("doc_id", "text")
    val out = Dedup.incrementalExactBloom(incoming, corpus,
        expectedItems = 1000L, fpp = 0.001)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(out.intersect((1000L until 1100L).toSet).isEmpty,
      "Bloom filters have no false negatives: every true dup must be dropped")
    val freshKept = out.count(_ >= 2000L)
    assert(freshKept >= 295, s"false-positive drops must be rare, kept $freshKept/300")
    // subset of the exact operator's survivors (bloom only ever drops MORE)
    val exact = Dedup.incrementalExact(incoming, corpus)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(out.subsetOf(exact))
  }

  test("incrementalMinhash finds batch-vs-corpus near-dups only") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val corpus = Seq((0L, base), (2L, "a completely unrelated corpus document"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (1L, base + " ok"),                        // near-dup of corpus doc 0
      (3L, "novel incoming content with fresh words"),
      (5L, base + " ok")                         // in-batch dup of 1 — NOT reported
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalMinhash(incoming, corpus)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 0L), (5L, 0L)),
      "both near-dup arrivals flag against the corpus; in-batch pairs and " +
      s"novel docs stay silent — got $out")
  }

  test("sampleExactPerKey: exact n per stratum, deterministic, salt-sensitive") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    val s1 = Pipeline.sampleExactPerKey(df, Seq("lang"), 3, "doc_id")
      .select(col("lang"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val s2 = Pipeline.sampleExactPerKey(df.repartition(7), Seq("lang"), 3, "doc_id")
      .select(col("lang"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(s1 == s2, "sample must not depend on physical partitioning")
    val perKey = s1.groupBy(_._1).view.mapValues(_.size).toMap
    val langSizes = df.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    langSizes.foreach { case (lang, sz) =>
      assert(perKey.getOrElse(lang, 0) == math.min(3L, sz),
        s"stratum $lang: want min(3, $sz)")
    }
    val salted = Pipeline.sampleExactPerKey(df, Seq("lang"), 3, "doc_id", salt = "x")
      .select(col("lang"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted != s1, "salt must draw a different sample")
  }

  test("windowFunnel: exact DP — later chain starts must not be shadowed") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // the earliest-start greedy fails here: chain A@5,B@6,C@12 fits the
    // 10s window but A@0's chain does not — depth must still be 3
    val ev = Seq(
      (1L, ts(0), "A"), (1L, ts(1), "B"), (1L, ts(5), "A"),
      (1L, ts(6), "B"), (1L, ts(12), "C"),
      (2L, ts(0), "A"), (2L, ts(1), "B"), (2L, ts(30), "C"), // C too late
      (3L, ts(0), "B"), (3L, ts(1), "C"), // no A at all → depth 0
      (4L, ts(7), "A") // depth 1
    ).toDF("user_id", "ts", "event_type")
    val out = graft.ext.Funnel.windowFunnel(ev, "user_id", "ts", "event_type",
        Seq("A", "B", "C"), withinSeconds = 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 2L, 3L -> 0L, 4L -> 1L))
  }

  test("windowFunnel matches the brute-force reference on random traces") {
    val rnd = new scala.util.Random(7)
    val types = Vector("A", "B", "C", "X")
    val rows = for (u <- 1L to 40L; _ <- 1 to 25) yield
      (u, new java.sql.Timestamp(rnd.nextInt(2000) * 1000L),
       types(rnd.nextInt(types.length)))
    val steps = Seq("A", "B", "C"); val within = 300L
    val out = graft.ext.Funnel.windowFunnel(rows.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", steps, within)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // O(n³) reference: literal existential semantics
    val byUser = rows.filter(r => steps.contains(r._3)).groupBy(_._1)
    byUser.foreach { case (u, evs) =>
      val e = evs.map(r => (r._2.getTime / 1000L, steps.indexOf(r._3))).sorted
      def chainFrom(i: Int, depth: Int, start: Long): Int =
        if (depth == steps.size) depth
        else (i until e.size).collectFirst {
          case j if e(j)._2 == depth && e(j)._1 - start <= within =>
            chainFrom(j + 1, depth + 1, start)
        }.getOrElse(depth)
      val ref = e.indices.collect {
        case i if e(i)._2 == 0 => chainFrom(i + 1, 1, e(i)._1)
      }.foldLeft(0)(math.max)
      assert(out(u) == ref.toLong, s"user $u: got ${out(u)}, want $ref")
    }
  }

  test("retentionCohorts: D1/D7 counts on a crafted activity matrix") {
    def at(day: Long, h: Int = 3) =
      new java.sql.Timestamp((day * 86400L + h * 3600L) * 1000L)
    val ev = Seq(
      (1L, at(0)), (1L, at(1)), (1L, at(7)),   // cohort 0, D1 ✓ D7 ✓
      (2L, at(0)), (2L, at(2)),                // cohort 0, neither
      (3L, at(0)), (3L, at(1)),                // cohort 0, D1 ✓
      (4L, at(5)), (4L, at(12)),               // cohort 5, D7 ✓
      (5L, at(5))                              // cohort 5, neither
    ).map { case (u, t) => (u, t, "click") }
      .toDF("user_id", "ts", "event_type")
    val out = graft.ext.Funnel.retentionCohorts(ev, "user_id", "ts")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out == Map(0L -> ((3L, 2L, 1L)), 5L -> ((2L, 0L, 1L))))
  }

  test("windowFunnelStream: cross-batch chains, k-long state, depth emissions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val ms = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = graft.ext.Funnel.windowFunnelStream(
      ms.toDF().toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type", Seq("A", "B", "C"), withinSeconds = 10L)
    val q = out.writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    try {
      ms.addData((1L, ts(0), "A"), (1L, ts(1), "B"), (2L, ts(0), "B"))
      q.processAllAvailable()
      // user 1 reaches depth 2 in one batch (one row, the latest depth);
      // user 2 has no A → no emission
      assert(spark.table("funnel_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
      // the chain completes ACROSS batches from carried DP state
      ms.addData((1L, ts(8), "C"))
      q.processAllAvailable()
      assert(spark.table("funnel_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L), (1L, 3L)))
      // no further emission when depth does not grow
      ms.addData((1L, ts(9), "C"))
      q.processAllAvailable()
      assert(spark.table("funnel_stream").count() == 2)
      // state is exactly one row per user seen — k longs each, no buffering
      val st = q.lastProgress.stateOperators
      assert(st.map(_.numRowsTotal).sum == 2)
    } finally q.stop()
  }

  test("streaming ingest golden: normalize → C4 gate → dedup, kill/recover") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // NOT epoch 0: the initial watermark is 0, and dedup-within-watermark
    // classifies epoch-0 event times as late (numRowsDroppedByWatermark)
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    val good = (1 to 25).map(i => s"word$i").mkString(" ") + " the a of it"
    val spammy = ("spam " * 40).trim // fails the repetition rule
    val ms = MemoryStream[(Long, java.sql.Timestamp, String)]
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    def start() = {
      val cleaned = ms.toDF().toDF("doc_id", "ts", "text")
        .withColumn("text",
          graft.ext.Pipeline.redactPii(graft.ext.Pipeline.normalize(col("text"))))
        .withColumn("c4", graft.ext.TextAnalysis.c4Rules(col("text")))
        .where(col("c4.keep")).drop("c4")
      graft.ext.Dedup.exactStream(cleaned, Seq("text"), "ts", "10 minutes")
        .writeStream.format("parquet").option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode("append").start()
    }
    val q1 = start()
    try {
      ms.addData((1L, ts(0), good), (2L, ts(1), spammy))
      q1.processAllAvailable()
    } finally q1.stop() // kill mid-stream
    val q2 = start() // recover: dedup state must survive the checkpoint
    try {
      // same text again (well within the watermark) + one novel doc;
      // normalize makes the uppercase variant byte-identical first
      ms.addData((3L, ts(60), good.toUpperCase), (4L, ts(61),
        (1 to 25).map(i => s"fresh$i").mkString(" ") + " the a of it"))
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = spark.read.parquet(s"$dir/out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows == Set(1L, 4L),
      s"spam gated, duplicate suppressed across restart — got $rows")
  }

  test("FileEnv: a JSONL corpus drives the same topology as parquet") {
    import graft.ast._, graft.ast.dsl._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val lines = Seq(
      """{"doc_id": 1, "text": "alpha beta alpha"}""",
      """{"doc_id": 2, "text": "beta gamma"}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/docs.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    val topo = stream(Seq("docs"), Consumed(keys = Seq("doc_id")))
      .flatMapValues(split(col("text"), " "), as = "word")
      .groupBy(col("word")).count(as = "n")
    val env = new graft.compile.FileEnv(spark, dir)
    assert(env.topicNames == Seq("docs"))
    val out = graft.compile.Compiler.compile(topo, env).df
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("alpha" -> 2L, "beta" -> 2L, "gamma" -> 1L))
  }

  test("FileEnv: an ORC corpus drives the same topology as parquet") {
    import graft.ast._, graft.ast.dsl._
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    Seq((1L, "alpha beta alpha"), (2L, "beta gamma")).toDF("doc_id", "text")
      .coalesce(1).write.orc(s"$dir/docs.orc")
    val topo = stream(Seq("docs"), Consumed(keys = Seq("doc_id")))
      .flatMapValues(split(col("text"), " "), as = "word")
      .groupBy(col("word")).count(as = "n")
    val env = new graft.compile.FileEnv(spark, dir, format = "orc")
    assert(env.topicNames == Seq("docs"))
    val out = graft.compile.Compiler.compile(topo, env).df
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("alpha" -> 2L, "beta" -> 2L, "gamma" -> 1L))
  }

  test("FileStreamEnv: file-drop ingest streams new files as they land") {
    import graft.ast._, graft.ast.dsl._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_drop").toString
    new java.io.File(s"$dir/docs").mkdirs()
    def drop(name: String, rows: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/docs/$name"),
        rows.mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val env = new graft.compile.FileStreamEnv(spark, dir,
      Map("docs" -> schema))
    val topo = stream(Seq("docs"), Consumed(keys = Seq("doc_id")))
      .flatMapValues(split(col("text"), " "), as = "word")
      .groupBy(col("word")).count(as = "n")
    drop("a.json", Seq("""{"doc_id": 1, "text": "alpha beta"}"""))
    val q = graft.compile.Compiler.compile(topo, env).df
      .writeStream.format("memory").queryName("file_drop")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      def counts = spark.table("file_drop").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts == Map("alpha" -> 1L, "beta" -> 1L))
      drop("b.json", Seq("""{"doc_id": 2, "text": "alpha gamma"}"""))
      q.processAllAvailable()
      assert(counts == Map("alpha" -> 2L, "beta" -> 1L, "gamma" -> 1L))
    } finally q.stop()
  }

  test("clusters: driver union-find and distributed propagation agree") {
    // chain 1-2-3-4, triangle 7-8-9 with an extra chord, singleton pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L), (8L, 9L),
                    (7L, 9L), (20L, 21L)).toDF("id_a", "id_b")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val driver = m(Dedup.clusters(pairs)) // small graph → union-find path
    val dist = m(Dedup.clusters(pairs, maxDriverEdges = 0L)) // force loop
    assert(driver == dist)
    assert(driver == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
                         7L -> 7L, 8L -> 7L, 9L -> 7L, 20L -> 20L, 21L -> 20L))
  }

  test("splitByCluster lands near-dup chains in one split, covers all docs") {
    val docs = (1L to 200L).map(i => i -> s"doc $i").toDF("doc_id", "text")
    // 1-2-3 is one transitive cluster; 10-11 another
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Pipeline.splitByCluster(docs, pairs, "doc_id",
        Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25))
      .select(col("doc_id"), col("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 200, "split must cover every document exactly once")
    assert(out(1L) == out(2L) && out(2L) == out(3L),
      "a transitive near-dup chain must share one split")
    assert(out(10L) == out(11L))
    // cluster members hash by the representative (min id): identical to
    // what splitByHash assigns the representative itself
    val solo = Pipeline.splitByHash(docs, "doc_id",
        Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25))
      .select(col("doc_id"), col("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(3L) == solo(1L))
    assert(out(42L) == solo(42L), "unclustered docs split as usual")
  }
}

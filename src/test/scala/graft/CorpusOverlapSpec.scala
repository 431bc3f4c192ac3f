package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Pipeline}

/** Corpus-level n-gram overlap report and curriculum staging: crafted
  * hand-computed fixtures, boundary behavior, determinism.
  */
class CorpusOverlapSpec extends SparkSpecBase {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("corpusOverlap: hand-computed 3-gram counts, containments, jaccard") {
    // A grams: {a b c, b c d, c d e, d e f} (4); B grams: {c d e, d e f,
    // e f g} (3); shared {c d e, d e f} (2)
    val a = docsDf(1L -> "a b c d e f", 2L -> "a b c d e")
    val b = docsDf(10L -> "c d e f g")
    val r = Dedup.corpusOverlap(a, b, "text", k = 3).collect()(0)
    assert(r.getAs[Long]("n_grams_a") == 4L)
    assert(r.getAs[Long]("n_grams_b") == 3L)
    assert(r.getAs[Long]("n_shared") == 2L)
    assert(r.getAs[Double]("containment_a_in_b") == 0.5)
    assert(r.getAs[Double]("containment_b_in_a") == 0.666667)
    assert(r.getAs[Double]("jaccard") == 0.4)
  }

  test("corpusOverlap: identical corpora → jaccard 1; disjoint → 0; " +
    "short-doc side → null ratios") {
    val a = docsDf(1L -> "x y z w v")
    val same = Dedup.corpusOverlap(a, a, "text", k = 3).collect()(0)
    assert(same.getAs[Double]("jaccard") == 1.0)
    assert(same.getAs[Double]("containment_a_in_b") == 1.0)
    val dis = Dedup.corpusOverlap(a, docsDf(2L -> "p q r s t"), "text", 3)
      .collect()(0)
    assert(dis.getAs[Long]("n_shared") == 0L &&
      dis.getAs[Double]("jaccard") == 0.0)
    // every B doc shorter than k → n_grams_b = 0 → b-ratios null
    val short = Dedup.corpusOverlap(a, docsDf(3L -> "p q"), "text", 3)
      .collect()(0)
    assert(short.getAs[Long]("n_grams_b") == 0L)
    assert(short.isNullAt(short.fieldIndex("containment_b_in_a")))
    assert(short.getAs[Double]("containment_a_in_b") == 0.0)
  }

  test("curriculumStages: exact quantile cut by (score, id), keys " +
    "deterministic, bounds honored") {
    val df = Seq((1L, 30), (2L, 10), (3L, 20), (4L, 40),
                 (5L, 20), (6L, 50), (7L, 5), (8L, 35))
      .toDF("doc_id", "score")
    val out = Pipeline.curriculumStages(df, "score", nStages = 4,
        idCol = "doc_id")
      .select($"doc_id", $"stage").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // rank order by (score, id): 7,2,3,5,1,8,4,6 → stages 1,1,2,2,3,3,4,4
    assert(out == Map(7L -> 1, 2L -> 1, 3L -> 2, 5L -> 2,
                      1L -> 3, 8L -> 3, 4L -> 4, 6L -> 4))
    val again = Pipeline.curriculumStages(df, "score", 4, "doc_id")
      .select($"doc_id", $"curriculum_key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val first = Pipeline.curriculumStages(df, "score", 4, "doc_id")
      .select($"doc_id", $"curriculum_key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(again == first) // same corpus + salt → identical keys
    val one = Pipeline.curriculumStages(df, "score", 1, "doc_id")
      .select($"stage").distinct().collect().map(_.getInt(0)).toSeq
    assert(one == Seq(1))
    intercept[IllegalArgumentException](
      Pipeline.curriculumStages(df.withColumn("stage", lit(1)),
        "score", 4, "doc_id"))
  }

  test("topPaths: per-user time-ordered k-step sequences, ties by the " +
    "unique tie column, incomplete tails dropped") {
    import graft.ext.Funnel
    val ev = Seq(
      (1L, 10L, 100L, "a"), (2L, 10L, 200L, "b"), (3L, 10L, 300L, "c"),
      (4L, 10L, 400L, "b"), // user 10: a>b>c, b>c>b
      (5L, 20L, 100L, "a"), (6L, 20L, 200L, "b"), (7L, 20L, 300L, "c"),
      (8L, 30L, 100L, "x"), (9L, 30L, 200L, "y")) // too short for k=3
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = Funnel.topPaths(ev, "user_id", "event_type", "ts",
        "event_id", k = 3, topN = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(out == Seq("a > b > c" -> 2L, "b > c > b" -> 1L))
    // same-ts ties resolve by event_id: swap order via tie column
    val tied = Seq((2L, 9L, 100L, "second"), (1L, 9L, 100L, "first"),
        (3L, 9L, 200L, "third"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val p = Funnel.topPaths(tied, "user_id", "event_type", "ts",
        "event_id", k = 3, topN = 5).collect()
    assert(p.map(_.getString(0)).toSeq == Seq("first > second > third"))
  }

  test("rakeKeyphrases ≡ plain-loop reference over randomized corpora") {
    import graft.ext.TextAnalysis
    val stops = Seq("the", "of")
    val vocab = Seq("the", "of", "alpha", "beta", "gamma", "delta", "eps")
    def reference(docs: Seq[(Long, String)], topK: Int) = docs.flatMap {
      case (id, text) =>
        val toks = text.split(' ').filter(_.nonEmpty).toSeq
        // islands of consecutive non-stop tokens (position-gap aware)
        val content = toks.zipWithIndex.filterNot(t => stops.contains(t._1))
        val islands = content.zipWithIndex
          .groupBy { case ((_, pos), rank) => pos - rank }
          .values.map(_.map(_._1._1)).toSeq
        val freq = islands.flatten.groupBy(identity).map { case (w, xs) =>
          w -> xs.size }
        val deg = islands.flatMap(ph => ph.map(_ -> ph.length.toLong))
          .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }
        islands.map(ph => ph.mkString(" ") ->
            ph.map(w => deg(w).toDouble / freq(w)).sum)
          .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).max }
          .toSeq
          .map { case (p, s) => p -> BigDecimal(s).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble }
          .sortBy { case (p, s) => (-s, p) }.take(topK).zipWithIndex
          .map { case ((p, s), i) => (id, (i + 1).toLong, p, s) }
    }.sortBy(t => (t._1, t._2))
    val rnd = new scala.util.Random(13)
    (1 to 3).foreach { _ =>
      val docs = (1L to 12L).map(i =>
        i -> Seq.fill(6 + rnd.nextInt(25))(
          vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val got = TextAnalysis.rakeKeyphrases(
          docs.toDF("doc_id", "text"), "text", "doc_id", stops, topK = 3)
        .orderBy($"doc_id", $"rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getDouble(3))).toSeq
      assert(got == reference(docs, 3))
    }
  }

  test("transitionMatrix: row-normalized exact ratios; rows sum to 1; " +
    "cross-user pairs never form") {
    import graft.ext.Funnel
    val ev = Seq(
      (1L, 10L, 100L, "a"), (2L, 10L, 200L, "b"), (3L, 10L, 300L, "a"),
      (4L, 10L, 400L, "c"),
      (5L, 20L, 100L, "a"), (6L, 20L, 200L, "b"))
      .toDF("event_id", "user_id", "ts", "event_type")
    // pairs: u10 a>b, b>a, a>c ; u20 a>b → from a: b 2/3, c 1/3; from b: a 1
    val out = Funnel.transitionMatrix(ev, "user_id", "event_type", "ts",
        "event_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(out == Seq(
      ("a", "b", 2L, 0.666667), ("a", "c", 1L, 0.333333),
      ("b", "a", 1L, 1.0)))
    // no pair bridges user 10's last event to user 20's first
    assert(!out.exists { case (f, t, _, _) => f == "c" })
  }

  test("pmiCollocations: hand-computed PMI; hapax pairs cut by minCount") {
    import graft.ext.TextAnalysis
    // words a:3 b:3 c:2 (N_w=8); bigrams "a b":3, "b a"/"b c"/"c c":1
    // (N_bi=6); minCount=2 keeps only "a b"
    val df = docsDf(1L -> "a b a b", 2L -> "a b c c")
    val out = TextAnalysis.pmiCollocations(df, "text", topN = 5,
        minCount = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = BigDecimal(math.log((3.0 / 6) / ((3.0 / 8) * (3.0 / 8))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq(("a b", 3L, want)))
    // minCount=1 admits the hapax pairs too
    val all = TextAnalysis.pmiCollocations(df, "text", topN = 5,
        minCount = 1).collect()
    assert(all.length == 4)
  }

  test("ngramNovelty: first-owner attribution by min id; duplicate doc " +
    "novelty 0; short doc null novelty") {
    // k=3. doc1 owns all 4 of its grams; doc2 repeats doc1 verbatim →
    // novelty 0; doc3 shares a 2-gram overlap window with doc1 but its
    // grams differ except the full window? construct: doc3 = "c d e f g"
    // shares gram "c d e"+"d e f" with doc1 → 1 novel of 3
    val df = docsDf(1L -> "a b c d e f", 2L -> "a b c d e f",
                    3L -> "c d e f g", 4L -> "x y")
    val out = Dedup.ngramNovelty(df, "text", "doc_id", k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)))).toMap
    assert(out(1L) == (4L, 4L, Some(1.0)))
    assert(out(2L) == (4L, 0L, Some(0.0))) // everything owned by doc 1
    assert(out(3L) == (3L, 1L, Some(BigDecimal(1.0 / 3).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble))) // only "e f g" novel
    assert(out(4L) == (0L, 0L, None))      // below k → null novelty
  }

  test("removeBoilerplateSegments: df counts DISTINCT docs (within-doc " +
    "repeats count once, removed everywhere); order preserved; " +
    "fully-boilerplate and empty docs return empty, not dropped") {
    import graft.ext.TextAnalysis
    val df = Seq(
      (1L, "banner alpha banner beta"), // banner twice within ONE doc
      (2L, "banner gamma"),
      (3L, "delta banner"),
      (4L, "banner"),                   // fully boilerplate
      (5L, ""))                          // no segments at all
      .toDF("doc_id", "text")
    // df(banner)=4 docs >= 3 → boilerplate; every other word df=1
    val out = TextAnalysis.removeBoilerplateSegments(df, "text", "doc_id",
        minDocs = 3, sep = " ")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("alpha beta", 2L)) // both positions cut, order kept
    assert(out(2L) == ("gamma", 1L))
    assert(out(3L) == ("delta", 1L))
    assert(out(4L) == ("", 1L))
    assert(out(5L) == ("", 0L))
    // below threshold nothing is boilerplate
    val none = TextAnalysis.removeBoilerplateSegments(df, "text", "doc_id",
        minDocs = 5, sep = " ")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(none.values.sum == 0L)
  }

  test("vocabCoverage: hand-computed OOV rates; the top-N boundary tie " +
    "breaks by word") {
    import graft.ext.TextAnalysis
    val df = Seq((1L, "en", "x x y z"), (2L, "de", "x q q"))
      .toDF("doc_id", "lang", "text")
    // counts: x3 q2 y1 z1; top-2 vocab {x,q}
    val out = TextAnalysis.vocabCoverage(df, "text", "lang", topN = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("en") == (4L, 2L, 0.5))   // x,x covered; y,z OOV
    assert(out("de") == (3L, 3L, 0.0))
    // top-3: y and z tie at count 1 → 'y' wins alphabetically
    val out3 = TextAnalysis.vocabCoverage(df, "text", "lang", topN = 3)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out3("en") == 3L && out3("de") == 3L) // y now covered, z not
  }

  test("snapshotDiff: per-id statuses incl. null-safe compare; report " +
    "zero-fills missing statuses") {
    val before = Seq((1L, "a", "en"), (2L, "b", "en"),
      (3L, null.asInstanceOf[String], "de"), (4L, "d", "en"))
      .toDF("doc_id", "text", "lang")
    val after = Seq((2L, "b", "en"), (3L, null.asInstanceOf[String], "de"),
      (4L, "d CHANGED", "en"), (9L, "new", "fr"))
      .toDF("doc_id", "text", "lang")
    val st = Pipeline.snapshotDiff(before, after, "doc_id",
        Seq("text", "lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "unchanged", // null text <=> null text
      4L -> "changed", 9L -> "added"))
    val rep = Pipeline.snapshotDiffReport(before, after, "doc_id",
        Seq("text", "lang")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(rep == Seq("added" -> 1L, "changed" -> 1L, "removed" -> 1L,
      "unchanged" -> 2L))
    // identical snapshots → every status but unchanged zero-filled
    val same = Pipeline.snapshotDiffReport(before, before, "doc_id",
        Seq("text", "lang")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(same == Seq("added" -> 0L, "changed" -> 0L, "removed" -> 0L,
      "unchanged" -> 4L))
  }

  test("corpusOverlapIndexed ≡ corpusOverlap against the same standing " +
    "corpus; empty incoming side → zero counts, null ratios") {
    val a = docsDf(1L -> "a b c d e f", 2L -> "a b c d e")
    val b = docsDf(10L -> "c d e f g", 11L -> "x y z w v")
    val idx = Dedup.gramIndex(b, "text", k = 3)
    val viaIdx = Dedup.corpusOverlapIndexed(a, idx, "text", k = 3)
      .collect()(0)
    val inline = Dedup.corpusOverlap(a, b, "text", k = 3).collect()(0)
    assert(viaIdx.toSeq == inline.toSeq)
    val empty = Dedup.corpusOverlapIndexed(
      docsDf(5L -> "p q"), idx, "text", k = 3).collect()(0)
    assert(empty.getAs[Long]("n_grams_a") == 0L &&
      empty.getAs[Long]("n_shared") == 0L)
    assert(empty.isNullAt(empty.fieldIndex("containment_a_in_b")))
  }

  test("scriptProfile: exact class counts, priority-order tie-breaking, " +
    "all-zero → none") {
    import graft.ext.TextAnalysis
    val df = Seq(
      (1L, "hello 世界 мир 42"),      // latin 5, han 2, cyr 3, digit 2
      (2L, "世界"),                    // pure han
      (3L, "ab 中文"),                 // TIE latin 2 = han 2 → arabic..? no:
                                       // priority order arabic,cyrillic,
                                       // digit,han,latin → han wins
      (4L, "!!! ~~~"))                 // no script chars at all
      .toDF("doc_id", "text")
    val p = TextAnalysis.scriptProfile($"text")
    val out = df.select($"doc_id", p.as("p")).collect()
      .map(r => r.getLong(0) -> r.getStruct(1)).toMap
    val s1 = out(1L)
    assert(s1.getAs[Long]("latin") == 5 && s1.getAs[Long]("han") == 2 &&
      s1.getAs[Long]("cyrillic") == 3 && s1.getAs[Long]("digit") == 2 &&
      s1.getAs[Long]("arabic") == 0)
    assert(s1.getAs[String]("dominant") == "latin")
    assert(out(2L).getAs[String]("dominant") == "han")
    assert(out(3L).getAs[String]("dominant") == "han") // tie → rule order
    assert(out(4L).getAs[String]("dominant") == "none")
  }

  test("rakeKeyphrases: hand-computed degree/frequency scores, repeated " +
    "phrases dedup to one row") {
    import graft.ext.TextAnalysis
    // candidates: [red apple], [green apple pie], [red]
    // red: freq 2, deg 2+1=3 → 1.5; apple: freq 2, deg 2+3=5 → 2.5;
    // green/pie: freq 1, deg 3 → 3.0
    val df = docsDf(1L -> "red apple the green apple pie the red",
                    2L -> "x y the x y")
    val out = TextAnalysis.rakeKeyphrases(df, "text", "doc_id",
        stopwords = Seq("the"), topK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getDouble(3))).toSeq.sorted
    assert(out == Seq(
      (1L, 1L, "green apple pie", 8.5), // 3 + 2.5 + 3
      (1L, 2L, "red apple", 4.0),       // 1.5 + 2.5
      (2L, 1L, "x y", 4.0)))            // repeated phrase → one row
  }

  test("interleaveBySources: reading by position rotates sources " +
    "round-robin while both are live; gaps only after exhaustion") {
    val df = ((1L to 6L).map(i => (i, "web")) ++
              (10L to 12L).map(i => (i, "wiki")))
      .toDF("doc_id", "source")
    val out = Pipeline.interleaveBySources(df, "source")
    graft.ext.OpCaches.releaseAll()
    val ordered = out.orderBy($"interleave_pos")
      .select($"source", $"interleave_pos").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // nSources=2: web gets even-ish slots (sidx 0), wiki odd (sidx 1);
    // first 6 positions alternate strictly (3 wiki rows live), then web
    // runs out the tail alone
    assert(ordered.take(6).map(_._1) ==
      Seq("web", "wiki", "web", "wiki", "web", "wiki"))
    assert(ordered.drop(6).map(_._1).forall(_ == "web"))
    // positions are distinct and parity encodes the source index
    assert(ordered.map(_._2).distinct.size == ordered.size)
    assert(ordered.forall { case (s, p) =>
      (p % 2 == 0) == (s == "web") })
    // deterministic across runs
    val again = Pipeline.interleaveBySources(df, "source")
      .select($"doc_id", $"interleave_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    graft.ext.OpCaches.releaseAll()
    val first = out.select($"doc_id", $"interleave_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(again == first)
    intercept[IllegalArgumentException](
      Pipeline.interleaveBySources(
        df.withColumn("interleave_pos", lit(0L)), "source"))
  }

  test("curriculumStages: uneven n distributes remainder to LATE stages " +
    "(floor cut) and stages partition the corpus") {
    val df = (1L to 10L).map(i => (i, i * 2)).toDF("doc_id", "score")
    val out = Pipeline.curriculumStages(df, "score", 3, "doc_id")
    graft.ext.OpCaches.releaseAll()
    val sizes = out.groupBy("stage").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // rank*3/10: ranks 0..3 → stage 1 (4 rows), 4..6 → 2 (3), 7..9 → 3 (3)
    assert(sizes == Map(1 -> 4L, 2 -> 3L, 3 -> 3L))
    assert(sizes.values.sum == 10L)
  }
}

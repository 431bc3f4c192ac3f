package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Funnel, Pipeline}

/** Round 9: spec pins for the four ADVICE-r8 fixes — containment prefix
  * tightness at exactly-at-threshold pairs, stationary-distribution
  * zero-mass guard, NULL-source interleaving, and empty-input
  * constraint reports.
  */
class Round9Spec extends SparkSpecBase {
  import spark.implicits._

  test("containmentPairs: exactly-at-threshold pair found no matter " +
    "WHICH of A's shingles the container misses (integer prefix bound)") {
    // A has exactly 5 distinct 3-word shingles (7 distinct words);
    // B_i drops ONLY shingle i, so containment(A in B_i) = 4/5 = the
    // 0.8 threshold EXACTLY. One of the five drops A's hash-smallest
    // shingle — the variant the old floor(n*(1-t))+1 float prefix
    // (length 1 instead of the tight 2 at n=5, t=0.8) silently missed.
    val w = (1 to 7).map(i => s"w$i")
    val a = w.mkString(" ")
    // drop s_i (words i, i+1, i+2): words 1..(i+1) ++ Z_i ++ words (i+1)..7
    val variants = (1 to 5).map { i =>
      (10L + i, (w.take(i + 1) ++ Seq(s"zz$i") ++ w.drop(i)).mkString(" "))
    }
    val docs = (Seq((1L, a)) ++ variants).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "text", "doc_id",
        k = 3, maxDf = Long.MaxValue, threshold = 0.8)
      .where(col("id_a") === 1L)
      .collect()
    val found = pairs.map(r => r.getAs[Long]("id_b")).toSet
    assert(found == (11L to 15L).toSet,
      s"expected all 5 at-threshold containers, got $found")
    assert(pairs.forall(_.getAs[Long]("containment_ppm") == 800000L))
    assert(pairs.forall(_.getAs[Long]("inter") == 4L))
  }

  test("stationaryDistribution: all-mass-absorbed round redistributes " +
    "uniformly instead of nulling pi (zero-mass guard)") {
    // every user transitions A -> B once; B is absorbing. Round 1 puts
    // all mass on B, round 2 forwards nothing (total mass 0 -> guard
    // fires, uniform restart), round 3 re-runs round 1. Without the
    // guard the round-2 floor division by 0 nulls pi for every state.
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:01")
    val ev = (1 to 4).flatMap { u =>
      Seq((u.toLong, "A", t0, 1L), (u.toLong, "B", t1, 2L))
    }.toDF("user_id", "event_type", "ts", "event_id")
    val pi = Funnel.stationaryDistribution(ev, "user_id", "event_type",
        "ts", "event_id", iters = 3)
      .collect().map(r => r.getString(0) ->
        Option(r.getAs[java.lang.Long]("pi_ppm"))).toMap
    assert(pi.size == 2)
    assert(pi.forall(_._2.isDefined), s"null pi_ppm leaked: $pi")
    assert(pi("A").get == 0L && pi("B").get == 2000000L, s"$pi")
  }

  test("interleaveBySources: NULL sources get their own rotation slot " +
    "(no collision with bucket 0)") {
    val rows = (0 until 4).flatMap { i =>
      Seq((s"a$i", "src_a"), (s"n$i", null: String), (s"b$i", "src_b"))
    }
    val out = Pipeline.interleaveBySources(
        rows.toDF("doc_id", "src"), "src", "doc_id")
      .select(col("doc_id"), col("src"), col("interleave_pos"))
      .collect()
    val pos = out.map(_.getAs[Long]("interleave_pos")).sorted
    // equal-sized sources -> dense permutation 0..11, no collisions
    assert(pos.toSeq == (0L until 12L),
      s"positions not a dense rotation: ${pos.toSeq}")
    // each source occupies ONE residue class mod nSources (3)
    val bySrc = out.groupBy(r => Option(r.getString(1)))
      .map { case (s, rs) =>
        s -> rs.map(_.getAs[Long]("interleave_pos") % 3).toSet }
    assert(bySrc.values.forall(_.size == 1), s"$bySrc")
    assert(bySrc.values.flatten.toSet == Set(0L, 1L, 2L), s"$bySrc")
  }

  test("interleaveBySources: supplementary-plane source names order " +
    "identically in the offset table and the global sort (UTF-8 vs " +
    "UTF-16 divergence pinned)") {
    // U+FFFC (high BMP) sorts BELOW U+1F600 in UTF-8 byte order (Spark)
    // but ABOVE it in UTF-16 code-unit order (a driver-side Scala
    // sortBy) — the exact misalignment ADVICE r8 flagged. The fix
    // collects the offset table through Spark's own orderBy, so the
    // rotation must come out dense and collision-free.
    val rows = (0 until 4).flatMap { i =>
      Seq((s"a$i", "￼src"), (s"b$i", "😀src"), (s"c$i", "zsrc"))
    }
    val out = Pipeline.interleaveBySources(
        rows.toDF("doc_id", "src"), "src", "doc_id")
      .select(col("src"), col("interleave_pos")).collect()
    val pos = out.map(_.getAs[Long]("interleave_pos")).sorted
    assert(pos.toSeq == (0L until 12L),
      s"positions not a dense rotation: ${pos.toSeq}")
    val bySrc = out.groupBy(_.getString(0))
      .map { case (s, rs) =>
        s -> rs.map(_.getAs[Long]("interleave_pos") % 3).toSet }
    assert(bySrc.values.forall(_.size == 1), s"$bySrc")
    assert(bySrc.values.flatten.toSet == Set(0L, 1L, 2L), s"$bySrc")
  }

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  private def cleaned(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[String]("clean_text"), r.getAs[Long]("n_tokens_removed")))
      .toMap

  test("dedupSubstringsKeepPassage: the Round8Spec tangled-overlap case " +
    "keeps ONE contiguous copy of the passage (per-passage keeper face)") {
    // same fixture Round8Spec pins for the default face: doc3's island
    // {0,1,2} holds its keeper window (pb pc pd)@1, so the whole island
    // — the full passage — survives in doc3; doc4's island holds no
    // keeper and drops whole. The default face empties BOTH.
    val d = docsDf(
      1L -> "pa pb pc x1 x2",
      2L -> "y1 pc pd pe",
      3L -> "pa pb pc pd pe",
      4L -> "pa pb pc pd pe")
    val out = cleaned(
      Dedup.dedupSubstringsKeepPassage(d, "text", "doc_id", minTokens = 3))
    assert(out(1L) == ("pa pb pc x1 x2", 0L))
    assert(out(2L) == ("y1 pc pd pe", 0L))
    assert(out(3L) == ("pa pb pc pd pe", 0L)) // keeper island survives whole
    assert(out(4L) == ("", 5L))               // keeper-less island drops whole
    // the contiguity guarantee the default face gives up:
    assert(out.values.exists(_._1.contains("pb pc pd")))
  }

  test("dedupSubstringsKeepPassage: verbatim duplicates (coinciding " +
    "keeper sites) are bit-identical to the default per-window face") {
    val d = docsDf(
      1L -> "s1 s2 s3 s4 u1 u2",
      2L -> "v1 s1 s2 s3 s4 v2",
      3L -> "s1 s2 s3 s4 u1 u2")
    val exact = cleaned(
      Dedup.dedupSubstringsKeepPassage(d, "text", "doc_id", minTokens = 4))
    val dflt = cleaned(
      Dedup.dedupSubstrings(d, "text", "doc_id", minTokens = 4))
    assert(exact == dflt)
    assert(exact(1L) == ("s1 s2 s3 s4 u1 u2", 0L))
    assert(exact(2L) == ("v1 v2", 4L))
    assert(exact(3L) == ("", 6L))
  }

  test("dawidSkene: confusion matrices recover what accuracy-scalar " +
    "weighting cannot — anti-annotators become negative evidence and a " +
    "consensus-hijacking annotator is dethroned") {
    import graft.ext.Labels
    // truth = item % 2. a0,a1 perfect; a2,a3 perfectly ANTI (say
    // 1-truth); a4 honest except on a hash-chosen 30% of items. Where a4
    // errs, the anti coalition + a4 outvote the honest pair, so majority
    // is wrong on exactly those items (70% accuracy) — and because the
    // consensus follows a4's errors, a4's observed agreement is 100%,
    // so weightedVote keeps the same 70% (1.0 + 0.3 + 0.3 > 0.7 + 0.7).
    // Full confusion matrices learn conf(a2, t, 1-t) ~ 1e6: the antis'
    // votes flip into evidence FOR the truth and round 2 lands 100%.
    val rows = for {
      item <- 0L until 200L
      a <- 0L until 5L
    } yield {
      val t = item % 2
      val a4wrong = (item * 31) % 10 < 3
      val label = a match {
        case 0 | 1 => t
        case 2 | 3 => 1 - t
        case _ => if (a4wrong) 1 - t else t
      }
      (item, a, label)
    }
    val ann = rows.toDF("item", "annotator", "label")
    def acc(df: org.apache.spark.sql.DataFrame): Double =
      df.select(col("item"), col("label")).collect()
        .count(r => r.getLong(1) == r.getLong(0) % 2) / 200.0
    val mvAcc = acc(Labels.majorityVote(ann))
    val wvAcc = acc(Labels.weightedVote(ann))
    val dsAcc = acc(Labels.dawidSkene(ann, iters = 2))
    assert(mvAcc == 0.7, s"majority $mvAcc")
    assert(wvAcc == 0.7, s"weightedVote $wvAcc")
    assert(dsAcc == 1.0, s"dawidSkene $dsAcc")
  }

  test("dawidSkene: unanimous perfect annotators yield the truth with " +
    "the exact full-confidence score (n_annotators x 1e6 ppm)") {
    import graft.ext.Labels
    val ann = (for { i <- 0L until 40L; a <- 0L until 3L }
      yield (i, a, i % 4)).toDF("item", "annotator", "label")
    val out = Labels.dawidSkene(ann, iters = 2).collect()
    assert(out.length == 40)
    out.foreach { r =>
      assert(r.getAs[Long]("label") == r.getAs[Long]("item") % 4)
      assert(r.getAs[Long]("score_ppm") == 3000000L, s"$r")
      // perfect annotators put zero mass on every other candidate, so
      // the routing margin is the full score
      assert(r.getAs[Long]("margin_ppm") == 3000000L, s"$r")
    }
  }

  /** Recombine the BIGINT hi/lo split back into the exact sum. */
  private def digestSum(r: org.apache.spark.sql.Row): BigInt =
    BigInt(r.getAs[Long]("sum_h_hi")) * BigInt(Pipeline.DigestSplitBase) +
      BigInt(r.getAs[Long]("sum_h_lo"))

  test("corpusDigest: invariant under partitioning/order, moved by any " +
    "row change, catches even-multiplicity duplicates XOR alone cannot") {
    val base = (1L to 100L).map(i => (i, s"lang${i % 3}", s"text body $i"))
    def dig(rows: Seq[(Long, String, String)], parts: Int = 4) = {
      val r = Pipeline.corpusDigest(
        rows.toDF("doc_id", "lang", "text").repartition(parts),
        Seq("doc_id", "lang", "text")).collect()(0)
      (r.getAs[Long]("n_rows"), r.getAs[Long]("xor_h"), digestSum(r))
    }
    val d0 = dig(base)
    // order + partitioning invariance
    assert(dig(base.reverse, 1) == d0)
    assert(dig(scala.util.Random.shuffle(base), 13) == d0)
    // one changed cell moves the digest
    assert(dig(base.updated(50, (51L, "lang0", "text body 51 CHANGED"))) != d0)
    // a dropped row moves it
    assert(dig(base.drop(1)) != d0)
    // an even-multiplicity duplicate pair cancels in XOR but not in the
    // exact sum (or the count) — the reason the digest carries all three
    val duped = base ++ Seq(base.head, base.head)
    val dd = dig(duped)
    assert(dd._2 == d0._2, "duplicate pair should cancel in XOR")
    assert(dd != d0, "sum/count must still catch the duplicate pair")
    // NULL cell digests differently from empty string
    val withNull = base.updated(0, (1L, null: String, "text body 1"))
    val withEmpty = base.updated(0, (1L, "", "text body 1"))
    assert(dig(withNull) != dig(withEmpty))
    // separator injection cannot alias distinct rows: the length-prefix
    // cell encoding is uniquely decodable, so a cell CONTAINING the
    // separator differs from the same bytes split across two cells
    val injA = Seq((1L, "ab", "c"))
    val injB = Seq((1L, "a", "bc"))
    assert(dig(injA) != dig(injB))
    // a literal ␀ cell is not the same as a NULL cell
    assert(dig(Seq((1L, "␀", "t"))) != dig(Seq((1L, null: String, "t"))))
    // empty input: identity elements, not NULLs
    val e = dig(Seq.empty)
    assert(e._1 == 0L && e._2 == 0L && e._3 == BigInt(0))
  }

  test("corpusDigestBy: per-group digests roll up exactly to the global " +
    "digest (count/sum add, xor xors), NULL keys keep their own group") {
    val rows = (1L to 60L).map(i =>
      (i, if (i % 7 == 0) null else s"g${i % 3}", s"t$i"))
    val df = rows.toDF("doc_id", "lang", "text")
    val by = Pipeline.corpusDigestBy(df, Seq("doc_id", "lang", "text"),
      "lang").collect()
    assert(by.map(r => Option(r.getString(0))).toSet ==
      Set(None, Some("g0"), Some("g1"), Some("g2")))
    val g = Pipeline.corpusDigest(df, Seq("doc_id", "lang", "text"))
      .collect()(0)
    assert(by.map(_.getAs[Long]("n_rows")).sum == g.getAs[Long]("n_rows"))
    assert(by.map(_.getAs[Long]("xor_h")).reduce(_ ^ _) ==
      g.getAs[Long]("xor_h"))
    assert(by.map(digestSum).sum == digestSum(g))
  }

  test("corpusDigest over a stream: the latest complete-mode row equals " +
    "the batch digest of everything ingested (ingest-integrity monitor)") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = Pipeline.corpusDigest(ms.toDF().toDF("id", "s"),
        Seq("id", "s"))
      .writeStream.format("memory").queryName("dig9")
      .outputMode("complete").start()
    try {
      ms.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      ms.addData((3L, "c"), (1L, "a")) // duplicate row arrives again
      q.processAllAvailable()
      val got = spark.table("dig9").collect()(0)
      val want = Pipeline.corpusDigest(
        Seq((1L, "a"), (2L, "b"), (3L, "c"), (1L, "a")).toDF("id", "s"),
        Seq("id", "s")).collect()(0)
      assert(got.getAs[Long]("n_rows") == want.getAs[Long]("n_rows"))
      assert(got.getAs[Long]("xor_h") == want.getAs[Long]("xor_h"))
      assert(digestSum(got) == digestSum(want))
    } finally q.stop()
  }

  test("digestDiff: added/removed/changed/same statuses from two " +
    "per-group digest tables, corpus never re-read") {
    val prev = Seq((1L, "a", "g1"), (2L, "b", "g1"), (3L, "c", "g2"),
      (4L, "d", "g3")).toDF("id", "s", "g")
    val next = Seq((1L, "a", "g1"), (2L, "b", "g1"), (3L, "CHANGED", "g2"),
      (5L, "e", "g4")).toDF("id", "s", "g")
    val diff = Pipeline.digestDiff(
        Pipeline.corpusDigestBy(prev, Seq("id", "s"), "g"),
        Pipeline.corpusDigestBy(next, Seq("id", "s"), "g"), "g")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getAs[Long]("n_rows_prev"),
          r.getAs[Long]("n_rows_next"))).toMap
    assert(diff == Map(
      "g1" -> ("same", 2L, 2L),
      "g2" -> ("changed", 1L, 1L),
      "g3" -> ("removed", 1L, -1L),
      "g4" -> ("added", -1L, 1L)))
  }

  test("contaminationBySuite: one corpus pass tags per-suite hits with " +
    "eval-doc and shared-gram counts; clean docs absent") {
    // suite A owns passage a1..a5 (two docs: a full copy and one
    // sharing only that passage); suite B owns b1..b5. Train doc 1
    // leaks BOTH passages, doc 2 only A's, doc 3 is clean.
    val train = docsDf(
      1L -> "x1 a1 a2 a3 a4 a5 x2 b1 b2 b3 b4 b5",
      2L -> "y1 a1 a2 a3 a4 a5 y2",
      3L -> "z1 z2 z3 z4 z5 z6 z7")
    val suiteA = docsDf(100L -> "a1 a2 a3 a4 a5",
                        101L -> "q1 a1 a2 a3 a4 a5 q2")
    val suiteB = docsDf(200L -> "b1 b2 b3 b4 b5")
    val out = Dedup.contaminationBySuite(train,
        Seq("A" -> suiteA, "B" -> suiteB), "text", "doc_id", n = 5)
      .collect()
      .map(r => (r.getAs[Long]("train_id"), r.getString(1)) ->
        (r.getAs[Long]("n_eval_docs"), r.getAs[Long]("n_shared_max"),
          r.getAs[Long]("n_shared_total"))).toMap
    // doc1 x suite A: both A docs share the 1 distinct 5-gram a1..a5
    assert(out((1L, "A")) == ((2L, 1L, 2L)), s"$out")
    assert(out((1L, "B")) == ((1L, 1L, 1L)), s"$out")
    assert(out((2L, "A")) == ((2L, 1L, 2L)), s"$out")
    assert(!out.contains((2L, "B")) && !out.keys.exists(_._1 == 3L),
      s"clean rows leaked: $out")
  }

  test("checkConstraints: empty input reports 0 violations / pass=true " +
    "(not NULL)") {
    val empty = Seq.empty[(Long, String)].toDF("id", "name")
    val rep = Pipeline.checkConstraints(empty, Seq(
        "id_nonneg" -> (col("id") >= 0),
        "name_nonnull" -> col("name").isNotNull))
      .collect()
    assert(rep.length == 2)
    rep.foreach { r =>
      assert(r.getAs[Long]("n_rows") == 0L)
      assert(!r.isNullAt(r.fieldIndex("n_violations")), s"NULL count: $r")
      assert(r.getAs[Long]("n_violations") == 0L)
      assert(r.getAs[Boolean]("pass"))
    }
  }
}

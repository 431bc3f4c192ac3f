package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 optimization locks: every rewrite this round is a plan-shape
  * change with a by-construction equivalence argument — these specs pin
  * the argument with data, on inputs built to hit the edge the argument
  * leans on (duplicate texts for min_by, hot cells for the dedupe-off
  * candidate stream, repeated words across islands for the RAKE window
  * stats).
  */
class Round14Spec extends SparkSpecBase {

  test("dedupExact batch face: min_by one-pass == keep-set semi-join") {
    val df = spark.createDataFrame(Seq(
      (5L, "aa", "x"), (3L, "aa", "y"), (9L, "aa", "z"),
      (1L, "bb", "p"), (2L, "cc", "q"), (7L, "cc", "r"),
      (11L, null.asInstanceOf[String], "n1"),
      (12L, null.asInstanceOf[String], "n2")
    )).toDF("doc_id", "text", "lang")
    import graft.ast.pipeline._
    import graft.ast.dsl._
    val node = stream(Seq("docs"), graft.ast.Consumed(keys = Seq("doc_id")))
    val dd = node.dedupExact().fn(df)
    // reference: old shape — keep-set + left semi
    val keep = graft.ext.Dedup.exact(df, "text", "doc_id")
      .select(col("keep_id").as("doc_id"))
    val ref = df.join(keep, Seq("doc_id"), "left_semi")
    assert(dd.columns.toSeq == df.columns.toSeq) // schema preserved
    assert(dd.orderBy("doc_id").collect().toSeq ==
      ref.orderBy("doc_id").collect().toSeq)
    // null text forms ONE group (both faces agree): one of 11/12 survives
    assert(dd.where(col("text").isNull).count() == 1L)
  }

  test("bucketPairs dedupe=false == .distinct() under single membership") {
    // single-membership input: each id appears in exactly one bucket;
    // one hot bucket past the cap to cover the star branch
    val rows = (1L to 30L).map(i => (i, "hot")) ++
      Seq((101L, "a"), (102L, "a"), (103L, "a"), (201L, "b"), (202L, "b"))
    val bucketed = spark.createDataFrame(rows).toDF("id", "k")
    val fast = graft.ext.Dedup.bucketPairs(bucketed, Seq("k"), cap = 10,
      dedupe = false)
    val slow = graft.ext.Dedup.bucketPairs(bucketed, Seq("k"), cap = 10,
      dedupe = true)
    val f = fast.collect().map(r => (r.getLong(0), r.getLong(1)))
    val s = slow.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(f.length == f.distinct.length, "dedupe=false emitted duplicates")
    assert(f.sorted.toSeq == s.sorted.toSeq)
    // pairs normalized a < b on both branches
    assert(f.forall { case (a, b) => a < b })
  }

  test("recordLinkage single-pass: candidate stream needs no distinct") {
    // same-shaped fixture as the ds_record_linkage gate, small: variants
    // share (lang, source) blocks with their originals
    val base = spark.createDataFrame((1L to 40L).map { i =>
      (i, s"name token$i shared", s"l${i % 2}", s"s${i % 3}", i % 7)
    }).toDF("rid", "name", "lang", "source", "grp")
    val variant = base.select((col("rid") + 1000L).as("rid"),
      concat(col("name"), lit(" zz")).as("name"),
      col("lang"), col("source"), col("grp"))
    val recs = base.union(variant)
    val out = graft.ext.Dedup.recordLinkage(recs, "rid",
      Seq("lang", "source"), Seq("name" -> 0.75), Seq("grp" -> 0.25), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == out.distinct.length,
      "single-pass linkage emitted duplicate scored pairs")
    assert(out.nonEmpty) // originals match their variants
    assert(out.forall { case (a, b, _) => a < b })
    // multi-pass with the SAME single KeyBlocking pass (exercises the
    // explicit Seq match arm) agrees exactly
    val multi = graft.ext.Dedup.recordLinkageMultiPass(recs, "rid",
      Seq(graft.ext.Dedup.KeyBlocking(Seq("lang", "source"))),
      Seq("name" -> 0.75), Seq("grp" -> 0.25), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(multi.sorted.toSeq == out.sorted.toSeq)
  }

  test("rakeKeyphrases window stats == reference join stats") {
    // repeated words ACROSS islands and docs: freq/deg must be doc-level
    val docs = spark.createDataFrame(Seq(
      (1L, "deep learning of the deep model and learning rate of note"),
      (2L, "the deep deep sea and a deep trench"),
      (3L, "single")
    )).toDF("doc_id", "text")
    val stops = Seq("the", "of", "and", "a")
    val out = graft.ext.TextAnalysis.rakeKeyphrases(docs, "text", "doc_id",
        stops, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))
    // reference: classic RAKE scoring computed independently (join shape)
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"),
        posexplode(split(lower(col("text")), " "))).toDF("doc_id", "pos", "w")
      .where(col("w") =!= "" && !col("w").isInCollection(stops))
    val islands = toks.withColumn("isl", col("pos") -
      row_number().over(Window.partitionBy("doc_id").orderBy("pos")))
    val phrases = islands.groupBy("doc_id", "isl")
      .agg(array_sort(collect_list(struct(col("pos"), col("w")))).as("pw"))
      .select(col("doc_id"), col("isl"),
        transform(col("pw"), x => x.getField("w")).as("ws"))
      .select(col("doc_id"), col("isl"),
        array_join(col("ws"), " ").as("phrase"),
        size(col("ws")).cast("long").as("len"), col("ws"))
    val words = phrases.select(col("doc_id"), col("isl"), col("phrase"),
      col("len"), explode(col("ws")).as("w"))
    val stats = words.groupBy("doc_id", "w")
      .agg(count(lit(1)).as("freq"), sum("len").as("deg"))
    val ref = words.join(stats, Seq("doc_id", "w"))
      .groupBy("doc_id", "isl", "phrase")
      .agg(sum(col("deg") / col("freq")).as("score"))
      .groupBy("doc_id", "phrase").agg(max("score").as("score"))
      .select(col("doc_id"), col("phrase"), round(col("score"), 6).as("score"))
      .withColumn("rank", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("phrase"))).cast("long"))
      .where(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("phrase"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))
    assert(out.sorted.toSeq == ref.sorted.toSeq)
  }

  test("resample segment rewrite: lead()+explode grid == r10 grid-join " +
    "(LOCF carries, interp stays linear, adjacent obs emit no gap rows)") {
    val day = 86400L
    def ts(d: Long) = new java.sql.Timestamp(d * day * 1000L)
    // key 1: uneven gaps (d0, d1 adjacent; d1→d5 gap; d5→d6 adjacent)
    // key 2: single observation; key 3: all observations adjacent
    val events = spark.createDataFrame(Seq(
      (1L, ts(0), 4.0), (1L, ts(1), 8.0), (1L, ts(5), 0.0), (1L, ts(6), 6.0),
      (2L, ts(3), 7.5),
      (3L, ts(2), 1.0), (3L, ts(3), 2.0)
    )).toDF("k", "ts", "v")
    val locf = graft.ext.TimeSeries.resampleLocf(events, "k", "ts", "v", day)
      .orderBy("key", "bucket_start").collect()
      .map(r => (r.getLong(0), r.getLong(1) / day, r.getDouble(2),
        r.getBoolean(3)))
    assert(locf.toSeq == Seq(
      (1L, 0L, 4.0, true), (1L, 1L, 8.0, true), (1L, 2L, 8.0, false),
      (1L, 3L, 8.0, false), (1L, 4L, 8.0, false), (1L, 5L, 0.0, true),
      (1L, 6L, 6.0, true),
      (2L, 3L, 7.5, true),
      (3L, 2L, 1.0, true), (3L, 3L, 2.0, true)))
    val interp = graft.ext.TimeSeries
      .resampleInterp(events, "k", "ts", "v", day)
      .orderBy("key", "bucket_start").collect()
      .map(r => (r.getLong(0), r.getLong(1) / day, r.getDouble(2),
        r.getBoolean(3)))
    assert(interp.toSeq == Seq(
      (1L, 0L, 4.0, true), (1L, 1L, 8.0, true), (1L, 2L, 6.0, false),
      (1L, 3L, 4.0, false), (1L, 4L, 2.0, false), (1L, 5L, 0.0, true),
      (1L, 6L, 6.0, true),
      (2L, 3L, 7.5, true),
      (3L, 2L, 1.0, true), (3L, 3L, 2.0, true)))
  }

  test("nlist==1 fit shortcut: assignment is cell 0 for every vector, " +
    "auto policy still trains past one cell, empty corpus still throws") {
    val vecs = spark.createDataFrame((1L to 50L).map(i =>
      (i, Seq(i.toDouble, -i.toDouble, 3.0)))).toDF("vec_id", "embedding")
    val m1 = graft.ext.Similarity.fitIvf(vecs, nlist = 1, "embedding")
    assert(m1.nlist == 1)
    val cells = graft.ext.Similarity.ivfIndex(vecs, m1, "embedding", "vec_id")
      .select("cell").distinct().collect().map(_.getInt(0)).toSeq
    assert(cells == Seq(0), "one-cell model must assign everything to 0")
    // auto policy: corpus fits one cell → shortcut; larger target → trains
    val a1 = graft.ext.Similarity.fitIvfAuto(vecs, targetCellSize = 1000,
      "embedding", minNlist = 1)
    assert(a1.nlist == 1)
    val a2 = graft.ext.Similarity.fitIvfAuto(vecs, targetCellSize = 10,
      "embedding", minNlist = 1)
    assert(a2.nlist == 5, s"50 rows / cell size 10 must train 5 cells")
    val empty = vecs.where(col("vec_id") < 0)
    intercept[IllegalArgumentException] {
      graft.ext.Similarity.fitIvf(empty, nlist = 1, "embedding")
    }
  }

  test("semanticPairs dedupe-off emits each qualifying pair exactly once") {
    val vecs = spark.createDataFrame((1L to 20L).map { i =>
      // two tight clusters → within-cluster cosines ≈ 1
      val base = if (i % 2 == 0) Array(1.0, 0.0, 0.01 * i)
                 else Array(0.0, 1.0, 0.01 * i)
      (i, base.toSeq)
    }).toDF("vec_id", "embedding")
    val model = graft.ext.Similarity.fitIvf(vecs, nlist = 2, "embedding")
    val pairs = graft.ext.Dedup.semanticPairs(vecs, model, "embedding",
        "vec_id", threshold = 0.9, cap = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == pairs.distinct.length)
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.nonEmpty)
  }
}

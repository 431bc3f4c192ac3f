package graft

import graft.ast._
import graft.ast.dsl._
import graft.ast.pipeline._
import graft.compile.{Compiler, Env, StreamEnv}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Round 13: the foreachBatch deployment recipe for the batch-only
  * pipeline stages (VERDICT r12 next #4 — prove the error-message
  * guidance executable), the two-level IVF degenerate/partition
  * properties (next #2), and specs locking the r12 ADVICE fixes
  * (semanticDedup cap threading, annTopK name-derived excludeSelf,
  * pack null-text/reserved-column guards).
  */
class Round13Spec extends SparkSpecBase {

  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  /** Batch Env over in-memory frames — what a foreachBatch body sees. */
  private def batchEnv(frames: Map[String, DataFrame]): Env = new Env {
    val spark = Round13Spec.this.spark
    def load(topic: String): DataFrame = frames(topic)
    def topicNames: Seq[String] = frames.keySet.toSeq.sorted
    def isStreaming: Boolean = false
  }

  /** Deterministic unit-ish vector: dims hash-mixed per (id, j), so
    * distinct ids are far apart; duplicates are planted by reusing an
    * id's vector under another doc id.
    */
  private def vec(id: Long): Seq[Double] =
    (0 until 16).map { j =>
      val h = java.lang.Long.rotateLeft(
        (id * 16 + j) * 0x9e3779b97f4a7c15L, 17)
      (h % 1000L).toDouble / 1000.0 + 1.5 // positive dims: stable cosine
    }

  test("foreachBatch deployment recipe (VERDICT r12 #4): semanticDedup → " +
    "annTopK → pack run per micro-batch exactly as their streaming error " +
    "messages instruct; union of per-batch outputs ≡ the batch stages " +
    "over the same slices") {
    // static ANN corpus, its own id namespace (vec_id)
    val corpus = spark.createDataset(
        (0L until 40L).map(i => (100L + i, vec(i))))
      .toDF("vec_id", "embedding")
    // the same three-stage AST value a production topology declares —
    // compiled per micro-batch against the batch frame, the
    // ":process!-style escape hatch" the stage errors point at
    def runStages(batch: DataFrame): DataFrame = {
      val env = batchEnv(Map("docs_live" -> batch))
      val ast = stream(Seq("docs_live"), Consumed(keys = Seq("doc_id")))
        // gate-mode parameters: one cell, cap off — exact all-pairs, so
        // the per-batch result is independent of partition layout and
        // the equivalence check below is deterministic
        .semanticDedup(vecCol = "embedding", idCol = "doc_id",
          threshold = 0.95, targetCellSize = Int.MaxValue, minNlist = 1,
          cap = Int.MaxValue)
        .annTopK(corpus, k = 3, nprobe = 64, idCol = "doc_id",
          corpusIdCol = "vec_id")
        .pack(budget = 64)
      val out = Compiler.compile(ast, env).df
        .select(col("doc_id"), col("tok"), col("start"),
          col("first_bin"), col("last_bin"),
          col("neighbors").getItem(0).getField("neighbor_id")
            .as("nn1"))
      out
    }
    // two micro-batch slices; batch 1 carries an exact-embedding dup
    // pair (doc 3 reuses doc 2's vector) the semantic stage must drop
    def doc(id: Long, vecOf: Long): (Long, String, Seq[Double]) =
      (id, s"alpha beta gamma delta tokens of document $id repeated " +
        s"words ${"filler " * 4}end", vec(vecOf))
    val slice1 = Seq(doc(1, 1), doc(2, 2), doc(3, 2), doc(4, 4))
    val slice2 = Seq(doc(10, 10), doc(11, 11))

    val ms = MemoryStream[(Long, String, Seq[Double])]
    val got = scala.collection.mutable.ArrayBuffer[Row]()
    val q = ms.toDF().toDF("doc_id", "text", "embedding")
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        got ++= runStages(b).collect()
        graft.ext.OpCaches.releaseAll()
        ()
      }
      .start()
    try {
      ms.addData(slice1: _*); q.processAllAvailable()
      ms.addData(slice2: _*); q.processAllAvailable()
    } finally q.stop()

    def sliceDf(s: Seq[(Long, String, Seq[Double])]): DataFrame =
      spark.createDataset(s).toDF("doc_id", "text", "embedding")
    val expected = (runStages(sliceDf(slice1)).collect() ++
      runStages(sliceDf(slice2)).collect()).toSet
    graft.ext.OpCaches.releaseAll()
    assert(got.toSet == expected,
      s"foreachBatch != batch-per-slice:\n got ${got.toSet}\n exp $expected")
    // the dup side actually dropped, and packing restarted per batch
    val ids = got.map(_.getAs[Long]("doc_id")).toSet
    assert(ids == Set(1L, 2L, 4L, 10L, 11L), s"ids: $ids")
    val starts = got.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("start")).toMap
    assert(starts(1L) == 0L && starts(10L) == 0L,
      "per-batch prefix sums must restart at each micro-batch")
  }

  test("two-level IVF: under the clamp the fit degenerates to one shard " +
    "(single-level policy through the same path); the packed-cell index " +
    "partitions the corpus") {
    import graft.ext.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val m = Similarity.fitIvfTwoLevel(emb) // defaults: clamp ≫ fixture
    assert(m.nshards == 1, s"expected degenerate shard count: ${m.nshards}")
    assert(m.subs(0).nlist == 16) // the autoNlist floor, as single-level
    val idx = Similarity.ivfIndexTwoLevel(emb, m)
    val n = emb.count()
    assert(idx.count() == n)
    assert(idx.select("vec_id").distinct().count() == n,
      "each corpus row must land in exactly one packed cell")
    // packed ids from a 1-shard model live in the low 32 bits
    assert(idx.agg(max(col("cell"))).collect()(0).getLong(0) < (1L << 32))
  }

  test("pack guards (ADVICE r12): null text packs as 0 tokens; reserved " +
    "output columns fail loud") {
    val frames = Map("docs_live" -> spark.createDataset(Seq(
        (1L, "three token text"), (2L, null.asInstanceOf[String]),
        (3L, "a b")))
      .toDF("doc_id", "text"))
    val out = Compiler.compile(
      stream(Seq("docs_live"), Consumed(keys = Seq("doc_id")))
        .pack(budget = 4),
      batchEnv(frames)).df.orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("tok")).toSeq == Seq(3L, 0L, 2L))
    assert(out.map(_.getAs[Long]("start")).toSeq == Seq(0L, 3L, 3L))
    graft.ext.OpCaches.releaseAll()
    val clash = intercept[IllegalArgumentException] {
      Compiler.compile(
        stream(Seq("docs_live"), Consumed(keys = Seq("doc_id")))
          .tokenCount(as = "tok")
          .pack(budget = 4),
        batchEnv(frames)).df
    }
    assert(clash.getMessage.contains("tok"), clash.getMessage)
  }

  test("clusters pointer jumping (r13 cap audit): a 300-diameter path " +
    "component converges on the distributed loop within maxIters = 20 " +
    "(one-hop propagation silently mislabeled it); non-convergence is " +
    "loud, and the driver/distributed paths still agree") {
    import graft.ext.Dedup
    val path = spark.range(299).select(col("id").as("id_a"),
      (col("id") + 1).as("id_b"))
    // distributed loop forced (maxDriverEdges = 0): 2^20 ≫ 299 reach
    val dist = Dedup.clusters(path, maxDriverEdges = 0L)
      .agg(countDistinct(col("cluster_id")).as("k"),
        max(col("cluster_id")).as("mx")).collect()(0)
    assert(dist.getLong(0) == 1L && dist.getLong(1) == 0L,
      s"path component split: $dist")
    // the driver union-find answers identically
    val drv = Dedup.clusters(path).agg(countDistinct(col("cluster_id")),
      max(col("cluster_id"))).collect()(0)
    assert(drv.getLong(0) == 1L && drv.getLong(1) == 0L)
    // a genuinely insufficient round budget fails LOUD (reach 2^2), not
    // silently mislabeled
    val e = intercept[IllegalArgumentException] {
      Dedup.clusters(path, maxIters = 2, maxDriverEdges = 0L).count()
    }
    assert(e.getMessage.contains("did not converge"), e.getMessage)
    graft.ext.OpCaches.releaseAll()
  }

  test("simhashPairsStream capped regime (r13 cap audit): maxPerBucket " +
    "bounds state to the most-recent window — pair recall degrades to " +
    "the window exactly as documented, connectivity survives via " +
    "chaining") {
    import graft.ext.Dedup
    val ms = MemoryStream[(Long, String)]
    val pairs = Dedup.simhashPairsStream(
      ms.toDF().toDF("doc_id", "text"), "text", "doc_id",
      maxBits = 3, maxPerBucket = 2)
    val q = pairs.writeStream.format("memory").queryName("r13_cap")
      .outputMode("append").start()
    try {
      // four identical docs, one batch: each arrival compares against at
      // most the 2 most recent bucket entries → 2n-3 = 5 of the 6 true
      // pairs (the (first, last) arrival pair falls off the window)
      ms.addData((1L, "cap window doc"), (2L, "cap window doc"),
        (3L, "cap window doc"), (4L, "cap window doc"))
      q.processAllAvailable()
      val got = spark.table("r13_cap").collect()
      assert(got.length == 5, s"expected 5 capped pairs, got ${got.length}")
      assert(got.forall(_.getAs[Int]("hamming") == 0))
      // the missed pair is recoverable transitively: one 4-member cluster
      val comp = Dedup.clusters(
        spark.table("r13_cap").select(col("id_a"), col("id_b")))
      assert(comp.select(countDistinct(col("cluster_id")))
        .collect()(0).getLong(0) == 1L)
      assert(comp.count() == 4L)
      graft.ext.OpCaches.releaseAll()
    } finally q.stop()
  }

  test("annTopK excludeSelf (ADVICE r12): distinct id-column names keep " +
    "an equal-valued corpus neighbor by default; Some(true) drops it") {
    val corpus = spark.createDataset(
        (0L until 20L).map(i => (i, vec(i))))
      .toDF("vec_id", "embedding")
    val flow = spark.createDataset(Seq((5L, vec(5)))) // same value as vec_id 5
      .toDF("doc_id", "embedding")
    def run(ex: Option[Boolean]): Set[Long] = {
      val out = Compiler.compile(
        stream(Seq("docs_live"), Consumed(keys = Seq("doc_id")))
          .annTopK(corpus, k = 3, nprobe = 64, idCol = "doc_id",
            corpusIdCol = "vec_id", excludeSelf = ex),
        batchEnv(Map("docs_live" -> flow))).df
        .select(explode(col("neighbors")).as("n"))
        .select(col("n.neighbor_id")).collect()
        .map(_.getLong(0)).toSet
      graft.ext.OpCaches.releaseAll()
      out
    }
    // default (None → names differ → keep): the cos-1.0 "neighbor" with
    // the flowing row's own id value ranks first
    assert(run(None).contains(5L))
    assert(!run(Some(true)).contains(5L))
  }
}

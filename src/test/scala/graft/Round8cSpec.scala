package graft

import org.apache.spark.sql.functions._
import graft.ext.{Pipeline, Similarity}

/** Round-8 tail additions: the filter-funnel survivorship audit and the
  * ANN recall-eval harness.
  */
class Round8cSpec extends SparkSpecBase {
  import spark.implicits._

  // ---- filterFunnel ----

  test("filterFunnel: isolated vs cumulative counts, null-fails, " +
    "unique-name guard, one-scan plan") {
    val df = Seq(
      (1L, "good long text", 10),
      (2L, null.asInstanceOf[String], 20), // null text: fails stage 1
      (3L, "x", 30),                       // short: passes 1, fails 2
      (4L, "also long enough", -1)         // fails stage 3 only
    ).toDF("id", "text", "v")
    val rows = Pipeline.filterFunnel(df, Seq(
        "nonnull" -> col("text").isNotNull,
        "long" -> (length(col("text")) > 5),
        "v_pos" -> (col("v") > 0)))
      .collect().map(r => r.getAs[String]("stage") ->
        ((r.getAs[Int]("stage_idx"), r.getAs[Long]("n_total"),
          r.getAs[Long]("pass_n"), r.getAs[Long]("survivors"),
          r.getAs[Double]("survival_rate")))).toMap
    assert(rows("nonnull") == ((1, 4L, 3L, 3L, 0.75)))
    // isolated: docs 1 and 4 are long; null length(text) counts as fail
    assert(rows("long") == ((2, 4L, 2L, 2L, 0.5)))
    // isolated v_pos passes 1,2,3; cumulative survivors only doc 1
    assert(rows("v_pos") == ((3, 4L, 3L, 1L, 0.25)))
    intercept[IllegalArgumentException] {
      Pipeline.filterFunnel(df, Seq("a" -> lit(true), "a" -> lit(false)))
    }
    intercept[IllegalArgumentException] {
      Pipeline.filterFunnel(df, Seq.empty)
    }
    // all stages ride ONE aggregate over one scan: exactly one Exchange
    val plan = Pipeline.filterFunnel(df, Seq(
        "a" -> col("v").isNotNull, "b" -> (col("v") > 0)))
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1, plan)
  }

  test("filterFunnel: cumulative column is monotone non-increasing and " +
    "bounded by every isolated pass count on real docs") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val rows = Pipeline.filterFunnel(docs, Seq(
        "nonempty" -> (length(col("text")) > 0),
        "min_len" -> (length(col("text")) >= 50),
        "lang_en" -> (col("lang") === "en")))
      .orderBy("stage_idx").collect()
    val surv = rows.map(_.getAs[Long]("survivors"))
    assert(surv.sliding(2).forall { case Array(a, b) => b <= a })
    rows.foreach { r =>
      assert(r.getAs[Long]("survivors") <= r.getAs[Long]("pass_n"))
      assert(r.getAs[Long]("pass_n") <= r.getAs[Long]("n_total"))
    }
  }

  // ---- recallReport ----

  test("recallReport: per-query hit counting, zero-recall queries kept, " +
    "truth side drives the denominator") {
    val truth = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 20L), (2L, 21L),
      (3L, 30L) // approx returns NOTHING for query 3
    ).toDF("query_id", "neighbor_id")
    val approx = Seq(
      (1L, 10L), (1L, 12L), (1L, 99L), // 2 of 3 correct + one stray
      (2L, 20L), (2L, 21L),
      (4L, 40L) // approx-only query: not in truth, must NOT appear
    ).toDF("query_id", "neighbor_id")
    val rep = Similarity.recallReport(approx, truth)
      .collect().map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("k_truth"), r.getAs[Long]("hits"),
          r.getAs[Double]("recall")))).toMap
    assert(rep.keySet == Set(1L, 2L, 3L))
    assert(rep(1L) == ((3L, 2L, 0.666667)))
    assert(rep(2L) == ((2L, 2L, 1.0)))
    assert(rep(3L) == ((1L, 0L, 0.0)))
  }

  test("recallReport: a real approximate tier (BQ Hamming shortlist) " +
    "against brute force scores recall in (0, 1] and perfect " +
    "self-recall equals 1 everywhere") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.where(col("vec_id") < 4)
    val exact = Similarity.bruteForceTopK(e, q, k = 5)
    val self = Similarity.recallReport(exact, exact).collect()
    assert(self.length == 4)
    assert(self.forall(_.getAs[Double]("recall") == 1.0))
    val approx = Similarity.bqTopK(e, q, k = 5, shortlist = 8)
    val rep = Similarity.recallReport(approx, exact).collect()
    assert(rep.length == 4)
    rep.foreach { r =>
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("hits") <= r.getAs[Long]("k_truth"))
    }
  }
}

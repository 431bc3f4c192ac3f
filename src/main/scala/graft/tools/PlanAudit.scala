package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Per-query execution-shape audit (dev tool): for each named query,
  * warm it once, then run it once more counting JOBS, STAGES, TASKS and
  * total shuffle bytes via a listener, and dump `explain("formatted")`
  * to a file. Job count is the hidden per-query cost at bench scale —
  * every eager action (persist materialization, localCheckpoint, count,
  * first) is a separate job with its own scheduling + barrier overhead.
  *
  * Usage: runMain graft.tools.PlanAudit <outDir> <query...>
  * (queries default to the 25 slowest perf rows of the r12 bench)
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "/tmp/plans"
    val names = if (args.length > 1 && args(1) == "ALL")
      (graft.SparkEntry.queries ++ graft.queries.ExtQueries.benchOnly)
        .keys.toSeq.sorted
    else if (args.length > 1) args.drop(1).toSeq else Seq(
      "ds_dawid_skene_deep", "ds_record_linkage_multi", "op_pipeline_probe",
      "text_distinct_ngrams", "op_pipeline", "ds_bradley_terry",
      "dedup_embedding", "ds_record_linkage", "text_keyphrases", "text_bm25",
      "text_sb_trigram", "join_interval", "dedup_minhash", "text_tfidf",
      "ds_bootstrap_ci_lang", "dedup_semantic", "ds_dawid_skene",
      "ds_bootstrap_ci", "dedup_incremental_near", "text_unigram_learn",
      "mm_decode_png", "mm_decode_jpeg", "q5_region_revenue",
      "text_burstiness", "agg_session_user", "dedup_simhash_probe",
      "dedup_ngram_jaccard_probe", "ev_stationary", "q1_pricing",
      "dedup_semantic_fitted", "dedup_incr_substr_bloom",
      "text_perplexity_lang", "sim_knn_join_probe", "ds_record_linkage_sat",
      "text_ccnet_buckets", "ds_coverage_gaps", "q3_revenue",
      "text_collocations", "ds_sorted_neighborhood",
      "sim_knn_join_two_level_probe", "ds_interleave")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // diagnostic toggle: SPARK_GRAFT_AQE=false quantifies AQE's
      // per-stage-job driver overhead at bench scale
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val shufW = new AtomicLong
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null)
          shufW.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val all = graft.SparkEntry.queries ++ graft.queries.ExtQueries.benchOnly
    println(f"${"query"}%-28s ${"sec"}%7s ${"jobs"}%5s ${"stages"}%7s " +
      f"${"tasks"}%6s ${"shufMB"}%7s exch")
    names.foreach { n =>
      try {
        val fn = all(n)
        fn(spark, sfDir).count() // warm (codegen, fits, index builds)
        graft.ext.OpCaches.releaseAll(); spark.catalog.clearCache()
        Thread.sleep(200) // let listener events drain
        jobs.set(0); stages.set(0); tasks.set(0); shufW.set(0)
        val df = fn(spark, sfDir)
        val t0 = System.nanoTime()
        df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let listener events drain
        val plan = df.queryExecution.executedPlan.toString
        val explained = try {
          val baos = new java.io.ByteArrayOutputStream()
          Console.withOut(new java.io.PrintStream(baos, true, "UTF-8")) {
            df.explain("formatted")
          }
          baos.toString("UTF-8")
        } catch { case e: Throwable => s"explain failed: $e" }
        val exch = "(?m)^\\s*\\+?- Exchange|^Exchange".r
          .findAllIn(plan).length
        val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
          explained.getBytes("UTF-8"))
        println(f"$n%-28s $dt%7.2f ${jobs.get}%5d ${stages.get}%7d " +
          f"${tasks.get}%6d ${shufW.get / 1e6}%7.2f $exch%4d")
        graft.ext.OpCaches.releaseAll(); spark.catalog.clearCache()
      } catch { case e: Throwable =>
        println(s"$n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

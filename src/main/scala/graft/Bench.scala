package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints ONE JSON line with
  * per-query and total wall seconds. Driver runs this per round →
  * BENCH_r{N}.json.
  *
  * Measurement protocol (round-3 verdict #1: a single-shot nanoTime per
  * query in a 97-query session recorded 3-7× phantom regressions —
  * q3_revenue recorded 6.68 s vs 1.3-1.7 s standalone): each query now
  * runs THREE times in-session, cache cleared between runs, and the
  * reported per-query number is the MEDIAN — robust to one GC pause or
  * codegen-cache miss landing inside a run. All three samples are
  * persisted under "samples" so outliers stay auditable.
  *
  * Per-query contention defense (round-9 verdict #2: the driver's
  * refresh passed the two-sided start/end sentinel at 0.816 while
  * carrying rows inflated up to 9× — uniform or mid-run load is
  * invisible to endpoint sentinels): every reported median is compared
  * to its committed idle-box floor (scripts/bench_floors_<sf>.json);
  * rows > 2× floor land in `suspect_rows`. A ~0.1 s mini-sentinel
  * (median of 3) interleaves every 25 queries; max/median > 2.5 sets
  * `mid_contended`. Validated r10: a deliberately loaded box (40
  * spinners, 2.8× total inflation) passed the endpoint sentinel at
  * 1.084 and the floors flagged 183 rows; two idle runs flagged zero.
  *
  * Reported-set split (verdict #2): the `sim_ann_*` gate queries run
  * their plans in exact-recall mode (nprobe = nlist / probeAll /
  * shortlist-all) — brute-force-equivalent BY CONSTRUCTION, so timing
  * them as headline perf numbers misrepresents the ANN design. They are
  * timed and recorded under "gate_queries" but EXCLUDED from the total;
  * the `*_probe` variants with realistic approximate parameters are the
  * perf rows.
  */
object Bench {

  /** Exact-recall gate modes of approximate operators: correctness-gate
    * plumbing, not performance-representative (each has a `_probe` twin
    * in the perf set with realistic parameters).
    */
  private val gateModeQueries =
    Set("sim_ann_ivf", "sim_ann_lsh", "sim_ann_sq", "sim_ann_pq",
        "sim_ann_ivf_indexed", "sim_ann_lsh_indexed",
        "sim_ann_sq_indexed", "sim_ann_pq_indexed", "sim_knn_join",
        // every (shard, sub-cell) probed = brute force through the
        // two-level plan; sim_knn_join_two_level_probe is the perf row
        "sim_knn_join_two_level",
        // k >= n retains the full multiset — brute-force-equivalent
        // exact mode of ev_kll_quantiles_probe
        "ev_kll_quantiles",
        // cap-off exact-recall modes of the near-dup pair kernels (the
        // r12 sf1 adjudication: gates hash-match recall-1 oracles, so
        // the prefix df cap / hot-band star cap are off — candidate
        // volume is quadratic BY CONSTRUCTION on the saturated fixture
        // vocabulary). Production faces with the documented caps are
        // the dedup_ngram_jaccard_probe / dedup_simhash_probe perf rows;
        // clusters/report/kfold/split ride the same cap-off pair kernel.
        "dedup_ngram_jaccard", "dedup_corpus", "dedup_clusters",
        "dedup_report", "ds_kfold_safe", "ds_split_safe",
        "dedup_simhash")

  private def median3(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  /** Per-query floors from the last committed idle-box artifact
    * (VERDICT r9 #2): start/end sentinels cannot see a contention spike
    * that lands mid-run — the r9 driver refresh passed the two-sided
    * gate at 0.816 while carrying rows inflated up to 9×. Any reported
    * median > 2× its committed floor (+50 ms jitter guard) lands in
    * `suspect_rows` in the JSON, so an inflated row is flagged at
    * record time instead of adjudicated a round later. Floors are
    * per-SF files (scripts/bench_floors_<sfBase>.json, flat
    * {"query":secs}); a missing file or query (new gates) simply means
    * no floor. Format is the flat subset written by
    * scripts/make_bench_floors.py — parsed with a regex, no JSON lib.
    */
  private def loadFloors(sfDir: String): Map[String, Double] = {
    val base = new java.io.File(sfDir).getName
    val path = sys.env.getOrElse("SPARK_GRAFT_BENCH_FLOORS",
      s"/root/repo/scripts/bench_floors_$base.json")
    try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      """"([A-Za-z0-9_]+)"\s*:\s*([0-9.eE+-]+)""".r
        .findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case _: Throwable => Map.empty }
  }

  /** One full measurement pass: start sentinels → all queries →
    * streaming replay → end sentinels. Bundled so a contended pass can
    * be rejected and re-run wholesale (VERDICT r8 #1).
    */
  private case class Pass(
    sentinelStart: Seq[(String, Double)],
    sentinelEnd: Seq[(String, Double)],
    sentinelRatio: Double,
    contended: Boolean,
    samples: Seq[(String, Seq[Double])],
    miniSentinels: Seq[Double],
    streamRows: Long,
    streamingSecs: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // contended passes are rejected and re-run up to this many total
    // attempts; the LAST pass is the recorded one (flagged if still
    // contended so it is never silently trusted)
    val maxAttempts =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_ATTEMPTS", "2").toInt
    // Wall budget for the whole measurement (VERDICT r13 #1): the r13
    // driver bench timed out (rc=124, no JSON) because a contended first
    // pass triggered a full re-run and one retry doubled the wall past
    // the driver's window. A retry is now taken ONLY if it can plausibly
    // finish inside the budget (elapsed + 1.15 × the last pass's wall);
    // otherwise the contended pass is recorded, flagged `contended:true`
    // + `retry_skipped_budget:true`, and the one-line JSON always prints.
    // 1500 s default: the slowest completed driver run on record (8-core
    // r13, two full passes) fit a 1931 s sbt window, so one pass plus
    // warm-up at 32 cores sits well inside this.
    val budgetS =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "1500").toDouble
    val tJvm0 = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - tJvm0) / 1e9
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Default restored to `true` (VERDICT r13 #2): r13 flipped this to
      // false (AQE's per-exchange driver re-plan is ~40 ms — real wall at
      // KB-sized bench shuffles, irrelevant at TB where its skew splitting
      // and coalescing are wanted) — but the flip was a NON-ADDITIVE
      // harness change: every historical bench row and committed floor was
      // measured with AQE on, so future rows would conflate "algorithm got
      // faster" with "planner overhead removed". The default stays `true`
      // for round-over-round comparability; SPARK_GRAFT_AQE=false remains
      // available as a diagnostics opt-out, and the one-time dual-mode
      // measurement lives in plans/r14/aqe_ab.md.
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // big-SF sweeps: split multi-row-group fixture files across tasks
    sys.env.get("SPARK_GRAFT_MAX_PARTITION_BYTES")
      .foreach(v => builder.config("spark.sql.files.maxPartitionBytes", v))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warm-up: run every query once on the smallest fixture so
    // per-query numbers measure the plan in steady state, not Janino
    // compilation and first-call classloading (the cold floor was ~1-8s per
    // wide-agg query; generated-class caching makes the sf bench reflect
    // execution). Warm-up time is excluded from the reported metric.
    val timed = SparkEntry.queries ++ graft.queries.ExtQueries.benchOnly
    timed.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => }
    }
    // Operator-internal persists self-register in OpCaches; after each
    // terminal action (outside its timer) releaseAll() hands the blocks
    // back. The leak guard: after every release, getPersistentRDDs must be
    // empty — any survivor is an operator persist that bypassed the
    // registry. ATTRIBUTED per query (VERDICT r8 #2): the first query
    // after which blocks survive is named in the JSON (`cache_leaked_by`)
    // so a leak is a one-grep fix, not a round-long hunt.
    var leakedBlocks = 0
    val leakedBy = scala.collection.mutable.LinkedHashMap[String, Int]()
    def releaseAndCheck(after: String): Unit = {
      graft.ext.OpCaches.releaseAll()
      var left = spark.sparkContext.getPersistentRDDs
      if (left.nonEmpty) {
        // grace re-check: localCheckpoint blocks are weak-referenced and
        // the ContextCleaner drops them on GC — only a block that survives
        // an explicit GC cycle is a real (strongly-referenced) leak
        System.gc()
        Thread.sleep(100)
        left = spark.sparkContext.getPersistentRDDs
      }
      if (left.nonEmpty) {
        leakedBlocks = math.max(leakedBlocks, left.size)
        if (!leakedBy.contains(after)) {
          leakedBy(after) = left.size
          System.err.println(s"[bench] CACHE LEAK after $after: " +
            s"${left.size} persisted RDD(s) survived releaseAll+GC")
          left.values.foreach { r =>
            System.err.println(s"[bench]   id=${r.id} " +
              r.toDebugString.linesIterator.take(3).mkString(" | "))
          }
        }
        // recover BOTH cache layers: clearCache drops Dataset caches but
        // never raw-RDD persists (localCheckpoint), so unpersist those
        // directly — a standing block must not contaminate later timings
        spark.catalog.clearCache()
        left.values.foreach(_.unpersist(blocking = false))
      }
    }
    // one-time corpus encodes (ANN index build) happen in warm-up, not
    // inside a probe query's first timed rep
    try graft.queries.ExtQueries.prebuildIndexes(spark, sfDir)
    catch { case _: Throwable => }
    releaseAndCheck("prebuild_indexes")
    // Contention sentinel (round-6 verdict #2, re-armed r9): the official
    // artifact drifted on UNCHANGED queries as box crowding was silently
    // absorbed into recorded numbers. Three fixed headliners PLUS a
    // scaled-down streaming replay (VERDICT r8 #4 — the replay band broke
    // with no contention evidence of its own) run at pass START and again
    // at pass END. The gate is TWO-SIDED (VERDICT r8 #1): a box that
    // starts slow and clears (ratio < 1/1.3) inflates mid-pass rows just
    // as much as one that degrades (ratio > 1.3), so the flag is
    // |ln(ratio)| > ln(1.3). A sentinel that THROWS records only
    // time-to-throw (~ms) on both ends, silently degrading the ratio to
    // noise (ADVICE r7): failures land in sentinelFailed, surface in the
    // JSON, and are EXCLUDED from the ratio (pairwise, so start/end stay
    // comparable).
    val sentinelNames =
      Seq("q1_pricing", "src_stream", "sim_topk", "streaming_probe")
    val sentinelFailed = scala.collection.mutable.LinkedHashSet[String]()
    def runSentinel(): Seq[(String, Double)] = sentinelNames.map { n =>
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val inner: Option[Double] =
          try {
            if (n == "streaming_probe") {
              // 1×-replica twin of the headline replay: same topology and
              // state path, ~1/10 the rows — cheap enough to run 3× per
              // end, and its inner ingest timer (fixture load excluded) is
              // the contention-comparable figure
              val (_, secs) =
                StreamingBench.windowedCount(spark, sfDir, replicas = 1,
                  batches = 2)
              Some(secs)
            } else { timed(n)(spark, sfDir).count(); None }
          } catch {
            case e: Throwable =>
              if (sentinelFailed.add(n))
                System.err.println(
                  s"[bench] sentinel $n FAILED: ${e.getMessage}")
              None
          }
        val secs = inner.getOrElse((System.nanoTime() - t0) / 1e9)
        graft.ext.OpCaches.releaseAll()
        secs
      }
      n -> median3(runs)
    }
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    def runPass(): Pass = {
      val sentinelStart = runSentinel()
      // A failing query must be VISIBLE, not a silently-recorded
      // time-to-failure (r5 lesson: a fixture type change broke one query
      // and streaming for a full round of bench records before anyone saw
      // an error). Failures print the cause and land in "failed" below.
      // mid-pass mini-sentinel (VERDICT r9 #2): one fixed ~0.1 s probe
      // every 25 queries — a contention spike that starts AND clears
      // between the start/end sentinels shows up as an inflated mini,
      // timestamping WHICH stretch of the alphabet to distrust
      // each mini is itself a median of 3 (a single ~0.1 s probe carries
      // ~2× scheduler noise on an idle box — measured r10; the median
      // keeps idle spread ~1.5× so the 2.5× flag threshold has margin)
      val miniSentinels = scala.collection.mutable.ArrayBuffer[Double]()
      def runMini(): Unit = {
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          try timed("src_stream")(spark, sfDir).count()
          catch { case _: Throwable => }
          graft.ext.OpCaches.releaseAll()
          (System.nanoTime() - t0) / 1e9
        }
        miniSentinels += median3(runs)
      }
      val samples: Seq[(String, Seq[Double])] =
        timed.toSeq.sortBy(_._1).zipWithIndex.map { case ((name, fn), qi) =>
          if (qi % 25 == 0) runMini()
          val runs = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            try { fn(spark, sfDir).count() } catch {
              case e: Throwable =>
                if (failed.add(name))
                  System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            }
            val secs = (System.nanoTime() - t0) / 1e9
            releaseAndCheck(name)
            secs
          }
          name -> runs
        }
      runMini()
      // streaming micro-bench: replay the events fixture through the
      // MemoryStream-backed env into the windowed-count topology (the
      // anomaly-detection shape) and time ingest → final state.
      // 10×-replayed corpus; the timer inside covers ingest only, so the
      // rows/s figure measures the engine rather than fixture loading or
      // micro-batch scheduling (VERDICT r2 #8). Streaming runs once: its
      // 990k-row replay is its own aggregate measurement, not a one-shot
      // query timing.
      val (streamRows, streamingSecs) =
        try StreamingBench.windowedCount(spark, sfDir)
        catch { case e: Throwable =>
          System.err.println(s"[bench] streaming FAILED: ${e.getMessage}")
          failed.add("streaming_windowed_count")
          (0L, -1.0)
        }
      val sentinelEnd = runSentinel()
      val sentinelRatio = {
        val ok = sentinelNames.filterNot(sentinelFailed).toSet
        val s0 = sentinelStart.collect { case (n, t) if ok(n) => t }.sum
        val s1 = sentinelEnd.collect { case (n, t) if ok(n) => t }.sum
        if (s0 > 0) s1 / s0 else -1.0
      }
      val contended = sentinelRatio > 0 &&
        math.abs(math.log(sentinelRatio)) > math.log(1.3)
      Pass(sentinelStart, sentinelEnd, sentinelRatio, contended,
        samples, miniSentinels.toSeq, streamRows, streamingSecs)
    }
    val ratios = scala.collection.mutable.ArrayBuffer[Double]()
    var passT0 = elapsedS
    var pass = runPass()
    var lastPassWall = elapsedS - passT0
    ratios += pass.sentinelRatio
    var attempts = 1
    var retrySkippedBudget = false
    while (pass.contended && attempts < maxAttempts &&
           !retrySkippedBudget) {
      if (elapsedS + 1.15 * lastPassWall > budgetS) {
        retrySkippedBudget = true
        System.err.println(
          f"[bench] pass $attempts contended (ratio " +
            f"${pass.sentinelRatio}%.2f) but retry SKIPPED: " +
            f"${elapsedS}%.0f s elapsed + ~${lastPassWall}%.0f s pass " +
            f"would exceed the $budgetS%.0f s wall budget — recording " +
            "the contended pass, flagged")
      } else {
        System.err.println(
          f"[bench] pass $attempts REJECTED: sentinel |ln(end/start)| " +
            f"ratio ${pass.sentinelRatio}%.2f outside [1/1.3, 1.3] — " +
            "re-running the full measurement pass")
        passT0 = elapsedS
        pass = runPass()
        lastPassWall = elapsedS - passT0
        ratios += pass.sentinelRatio
        attempts += 1
      }
    }
    if (pass.contended)
      System.err.println(
        f"[bench] CONTENDED after $attempts attempt(s): sentinel " +
          f"end/start ratio ${pass.sentinelRatio}%.2f — environment " +
          "unstable across the whole window; re-run solo before " +
          "recording this bench as evidence")
    val medians = pass.samples.map { case (n, xs) => n -> median3(xs) }
    val (gate, perf) = medians.partition(kv => gateModeQueries(kv._1))
    // per-query contention defense (VERDICT r9 #2): flag, never silently
    // record, any row > 2× its committed idle-box floor; plus the mid-pass
    // mini ratio — a spike that starts and clears inside the pass inflates
    // some mini well above the pass's own quiet minimum
    val floors = loadFloors(sfDir)
    val suspectRows = medians.collect {
      case (n, t) if floors.get(n).exists(f => t > 2.0 * f + 0.05) => n
    }
    if (suspectRows.nonEmpty)
      System.err.println(s"[bench] SUSPECT rows (>2× committed floor): " +
        suspectRows.mkString(", ") + " — treat as contention until " +
        "re-timed solo")
    // max vs the MEDIAN of minis (not min): one fast mini must not
    // manufacture a flag; one slow mini against a quiet majority is
    // exactly the mid-run spike the start/end sentinels cannot see
    val miniRatioMax =
      if (pass.miniSentinels.size >= 3) {
        val med = pass.miniSentinels.sorted.apply(pass.miniSentinels.size / 2)
        if (med > 0) pass.miniSentinels.max / med else -1.0
      } else -1.0
    val midContended = miniRatioMax > 2.5
    if (midContended)
      System.err.println(f"[bench] MID-PASS contention: mini-sentinel " +
        f"max/median ratio $miniRatioMax%.2f > 2.5 — some stretch of " +
        "this pass ran on a loaded box")
    val rowsPerSec =
      if (pass.streamingSecs > 0) pass.streamRows / pass.streamingSecs
      else -1.0
    val perfAll = perf :+ ("streaming_windowed_count" -> pass.streamingSecs)
    def jmap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
        .mkString("{", ",", "}")
    val samplesJson = pass.samples.map { case (k, xs) =>
      "\"" + k + "\":[" + xs.map(x => f"$x%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = perfAll.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val leakedByJson = leakedBy
      .map { case (k, v) => "\"" + k + s"""\":$v""" }.mkString("{", ",", "}")
    val ratiosJson = ratios.map(r => f"$r%.3f").mkString("[", ",", "]")
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec",""" +
      f""""queries":${jmap(perfAll)},"gate_queries":${jmap(gate)},""" +
      f""""samples":$samplesJson,"reps":$reps,"cache_leaked_blocks":$leakedBlocks,""" +
      f""""cache_leaked_by":$leakedByJson,""" +
      f""""failed":$failedJson,""" +
      f""""sentinel_start":${jmap(pass.sentinelStart)},""" +
      f""""sentinel_end":${jmap(pass.sentinelEnd)},""" +
      f""""sentinel_ratio":${pass.sentinelRatio}%.3f,""" +
      f""""contended":${pass.contended},"attempts":$attempts,""" +
      f""""attempt_ratios":$ratiosJson,""" +
      f""""budget_s":$budgetS%.0f,"retry_skipped_budget":$retrySkippedBudget,""" +
      f""""wall_s":$elapsedS%.1f,""" +
      f""""suspect_rows":${suspectRows.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      f""""mini_sentinels":${pass.miniSentinels.map(x => f"$x%.3f").mkString("[", ",", "]")},""" +
      f""""mini_ratio_max":$miniRatioMax%.2f,"mid_contended":$midContended,""" +
      f""""floors_loaded":${floors.size},""" +
      f""""sentinel_failed":${sentinelFailed.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      f""""streaming_rows":${pass.streamRows},"streaming_rows_per_sec":$rowsPerSec%.0f,"sf":"$sfDir"}"""
    // Round 1's BENCH output failed to parse: sbt's logger wrapped the
    // line in "[info] ". The forked run now passes stdout through bare
    // (build.sbt: run/outputStrategy=StdoutOutput); also persist to a
    // file so the driver can always recover the metric.
    println(line)
    // The official BENCH_r{N}.json keeps only a truncated stdout tail
    // (~41 of 186 rows survived in r7) — the full per-query JSON must
    // live in the repo so cross-round comparison doesn't depend on a
    // volatile /tmp file (VERDICT r7 #1). Default the artifact into the
    // repo root; the driver's end-of-round commit picks it up.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/BENCH_full_latest.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath), line.getBytes("UTF-8"))
    catch { case _: Throwable => }
    spark.stop()
  }
}

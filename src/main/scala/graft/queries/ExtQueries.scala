package graft.queries

import graft.ext.{Dedup, Funnel, IntervalJoin, Layout, Multimodal, Pipeline, Similarity, Sketches, TextAnalysis, TimeSeries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import ExtShared._
import org.apache.spark.sql.functions._

/** LLM-data-pipeline extension operators (BASELINE.json north-star): dedup,
  * similarity search, text analysis, multimodal plumbing. Dedup queries are
  * oracle-checked against brute-force DuckDB ground truth (exact Jaccard /
  * cosine / hamming over the portable md5-derived hash), and the ANN gate
  * queries run their plans in exact-recall mode against the brute-force
  * cosine oracle; only `agg_approx_distinct` (estimate-valued by
  * definition) remains rows-only.
  */
object ExtQueries {
  type Q = (SparkSession, String) => DataFrame

  // One file per operator family, queries + oracles co-located
  // (VERDICT r8 #7). Merged FAIL-LOUD: Map ++ would silently last-win on
  // a duplicate key and drop a gate row (the r7 lesson), so collisions
  // across files abort at class-init — the suite can't even start.
  private def merged[A](what: String,
                        maps: Seq[Map[String, A]]): Map[String, A] = {
    val dups = maps.flatMap(_.keys).groupBy(identity)
      .collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty,
      s"duplicate $what keys across Ext*Queries files: ${dups.mkString(", ")}")
    maps.reduce(_ ++ _)
  }

  val queries: Map[String, Q] = merged("query", Seq(
    ExtDedupQueries.queries, ExtSimQueries.queries, ExtTextQueries.queries,
    ExtEventQueries.queries, ExtDataQueries.queries,
    ExtStatsQueries.queries))

  val oracle: Map[String, String] = merged("oracle", Seq(
    ExtDedupQueries.oracle, ExtSimQueries.oracle, ExtTextQueries.oracle,
    ExtEventQueries.oracle, ExtDataQueries.oracle, ExtStatsQueries.oracle))

  /** Build every materialized ANN index for `d` now (idempotent) — see
    * [[ExtShared.prebuildIndexes]].
    */
  def prebuildIndexes(s: SparkSession, d: String): Unit =
    ExtShared.prebuildIndexes(s, d)


  /** Bench-only ANN variants with the real approximate parameters (multi-
    * probe / nprobe≪nlist). Timed by [[graft.Bench]] but NOT part of the
    * correctness gate — the gate's `sim_ann_*` entries run the same plans
    * in exact-recall mode (nprobe = nlist; probeAll) and hash-match the
    * brute-force oracle; these measure what the approximate path costs.
    */
  val benchOnly: Map[String, Q] = Map(
    "text_compress_ratio" -> { (s, d) =>
      // deflate-ratio quality histogram: deterministic per zlib build but
      // not engine-portable -> bench-tracked; the kernel's behavioral
      // invariants gate as text_compress_gate (certificate columns)
      docs(s, d).select(col("doc_id"),
          TextAnalysis.compressionRatio(col("text")).as("ratio"))
        .groupBy((floor(col("ratio") * 20) / 20).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    },
    // Probe queries run the PRODUCTION shape: approximate parameters over
    // the materialized parquet index — no encode stage at query time (the
    // corpus encode ran once at index build, VERDICT r4 #2).
    "sim_ann_ivf_probe" -> { (s, d) =>
      // pruned face: the cell-partitioned index scan reads only the
      // probed cells' files (PartitionFilters, spec-checked)
      val e = emb(s, d)
      Similarity.ivfTopKPruned(ivfIdx(s, d, 16),
          e.where(col("vec_id") < 5), k = 10,
          ivfModel(s, d, nlist = 16), nprobe = 3, "embedding", "vec_id")
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
    },
    "sim_ann_lsh_probe" -> { (s, d) =>
      val e = emb(s, d)
      Similarity.lshTopKIndexed(lshIdx(s, d),
          e.where(col("vec_id") < 5), k = 10)
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
    },
    "sim_ann_sq_probe" -> { (s, d) =>
      val e = emb(s, d)
      Similarity.sqTopKIndexed(sqIdx(s, d),
          e.where(col("vec_id") < 5), k = 10,
          sqModel(s, d), shortlist = 50, "embedding", "vec_id")
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
    },
    "sim_ann_bq_probe" -> { (s, d) =>
      // Hamming scan over the prebuilt 8-byte sign codes, exact re-rank
      // of a 50-candidate shortlist
      val e = emb(s, d)
      Similarity.bqTopKIndexed(bqIdx(s, d),
          e.where(col("vec_id") < 5), k = 10, shortlist = 50)
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
    },
    "sim_ann_pq_probe" -> { (s, d) =>
      val e = emb(s, d)
      Similarity.pqTopKIndexed(pqIdx(s, d),
          e.where(col("vec_id") < 5), k = 10,
          pqModel(s, d), shortlist = 50, "embedding", "vec_id")
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
    },
    "text_bm25_probe" -> { (s, d) =>
      // steady-state retrieval: prebuilt inverted index on disk, query
      // cost = bucket-pruned postings scan + rank (no tokenize stage);
      // unsorted like every other *_probe row (the gate face
      // text_bm25_indexed carries the deterministic ordering)
      TextAnalysis.bm25TopKIndexed(bm25Idx(s, d), bm25Queries, k = 10)
    },
    "sim_knn_join_two_level_probe" -> { (s, d) =>
      // production two-level shape: approximate probes (2 shards × 3
      // sub-cells) over the MATERIALIZED packed-cell index — the plan a
      // billion-vector corpus runs (per-vector assignment cost nshards +
      // subNlist distances instead of a brute scan over all cells;
      // candidate volume linear past the single-level clamp)
      Similarity.ivfKnnJoinTwoLevel(ivf2Idx(s, d), emb(s, d), k = 5,
          ivf2Model(s, d), nprobeShards = 2, nprobe = 3, salt = 2)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("cos"))
    },
    "op_pipeline_probe" -> { (s, d) =>
      // the ASSEMBLED flagship at PRODUCTION parameters (VERDICT r12 next
      // #3): the op_pipeline gate bounds its input (doc_id < 800) and
      // pins one IVF cell so the exact all-pairs oracle stays affordable
      // — this probe runs the same seven-stage chain over the ENTIRE
      // documents corpus with the production caps (corpus-sized cells
      // via fitIvfAuto, hot-cell star cap, default near-dup thresholds),
      // so its sf1 ratio measures whether the assembled pipeline scales,
      // not just its stages
      import graft.ast._
      import graft.ast.dsl._
      import graft.ast.pipeline._
      val embs = emb(s, d)
        .select(col("vec_id").as("doc_id"), col("embedding"))
      val cleaned = stream(Seq("documents"),
          Consumed(keys = Seq("doc_id")))
        .dedupExact(textCol = "text", idCol = "doc_id")
        .qualityFilter()
        .piiRedact()
      val enriched = TransformOp(cleaned, "join_embeddings",
        df => df.join(broadcast(embs), Seq("doc_id")))
      val ast = enriched
        .semanticDedup(vecCol = "embedding", idCol = "doc_id",
          threshold = 0.95)
        .pack(budget = 1024)
      graft.compile.Compiler.compile(ast,
        new graft.compile.ParquetEnv(s, d)).df
    },
    "sim_knn_join_probe" -> { (s, d) =>
      // production pair-mining shape: approximate probes over the
      // materialized cell-partitioned index, corpus-as-queries. nlist is
      // CORPUS-SIZED (Similarity.autoNlist — cells of ~128 expected
      // occupancy): the r11 sweep measured the fixed-16 variant at 19.2×
      // wall for 10× data because candidate pairs ∝ n²·nprobe/nlist;
      // with nlist ∝ n the candidate volume is linear. At the sf0.1
      // floor corpus autoNlist resolves to 16, so floors stay comparable.
      Similarity.ivfKnnJoin(ivfIdxAuto(s, d), emb(s, d), k = 5,
          ivfModelAuto(s, d), nprobe = 3, salt = 2)
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
    },
    "dedup_semantic_probe" -> { (s, d) =>
      // full corpus, corpus-sized cell count: the SemDeDup shape the gate
      // mode verifies; memoized fit-once centroids (the production shape).
      // autoNlist (≡ 16 at the sf0.1 floor corpus) — SemDeDup scales k
      // with the corpus for exactly this reason: within-cell pair volume
      // is n²/nlist, quadratic under any FIXED cell count.
      val e = emb(s, d)
      e.join(Dedup.semanticPairs(e, ivfModelAuto(s, d),
               "embedding", "vec_id", threshold = 0.95,
               cap = Dedup.maxBucketFanout)
               .select(col("id_b").as("vec_id")).distinct(),
             Seq("vec_id"), "left_anti")
        .select(col("vec_id"))
    },
    "ds_record_linkage_sat" -> { (s, d) =>
      // the SATURATED-regime sweep point (VERDICT r12 next #1): blocking
      // on `lang` alone (5 values) puts EVERY block past maxBucketFanout
      // at sf0.1 (2×5000 records / 5 langs = 2000 per block) and 10×
      // deeper at sf1 — candidates are O(b) star pairs per block, so the
      // sf1/sf0.1 wall ratio measures the star-cap saturation the
      // sub-cap gate rows (ds_record_linkage: ~100-row (lang, source)
      // blocks at sf0.1, quadratic growth regime) cannot. Same record
      // fixture and weights as the gate row.
      val dd = docs(s, d)
      def side(rid: org.apache.spark.sql.Column,
               name: org.apache.spark.sql.Column) = dd.select(rid.as("rid"),
        name.as("name"), col("lang"),
        pmod(col("doc_id"), lit(7)).as("grp"))
      // variant offset 1e12, NOT the gate rows' 1e6: this row has no
      // oracle pinning the constant, and 1e6 collides with real doc_ids
      // at a ~200x sweep (the fixed-constant class the cap audit hunts)
      val recs = side(col("doc_id"), col("text")).union(
        side(col("doc_id") + 1000000000000L,
          concat(col("text"), lit(" zzvariant"))))
      Dedup.recordLinkage(recs, "rid", blockCols = Seq("lang"),
          fuzzyFields = Seq("name" -> 0.75),
          exactFields = Seq("grp" -> 0.25), threshold = 0.8)
    },
    "dedup_incremental_bloom_probe" -> { (s, d) =>
      // the no-broadcast-set ingest path (spec-checked against the exact
      // operator; Bloom bits aren't DuckDB-mirrorable, so bench-only)
      val dd = docs(s, d)
      Dedup.incrementalExactBloom(
        dd.where(pmod(col("doc_id"), lit(2)) === 1),
        dd.where(pmod(col("doc_id"), lit(2)) === 0))
        .select(col("doc_id"))
    },
    // Production faces of the near-dup pair kernels whose GATES run
    // cap-off exact-recall mode (the r12 sf1 adjudication moved those
    // gates to the gate lane — their cost is quadratic-candidate BY
    // CONSTRUCTION so the oracle can have recall 1). These probe rows
    // carry the documented production caps: df-capped prefix postings /
    // the hot-band star cap keep candidate volume bounded per bucket.
    // The clusters/report/kfold/split gates ride the same pair kernel,
    // so one probe per kernel covers the family's production scaling.
    "dedup_ngram_jaccard_probe" -> { (s, d) =>
      val dd = docs(s, d)
      Dedup.survivors(dd,
          Dedup.ngramJaccardPairs(dd, "text", "doc_id"), "doc_id")
        .select(col("doc_id"))
    },
    "dedup_simhash_probe" -> { (s, d) =>
      val dd = docs(s, d)
      Dedup.survivors(dd, Dedup.simhashPairs(dd, "text", "doc_id"),
          "doc_id")
        .select(col("doc_id"))
    }
  )
}

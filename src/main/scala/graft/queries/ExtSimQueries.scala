package graft.queries

import graft.ext.{Dedup, Funnel, IntervalJoin, Layout, Multimodal, Pipeline, Similarity, Sketches, TextAnalysis, TimeSeries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import ExtShared._

/** Similarity & multimodal families: brute/IVF/LSH/SQ/PQ/BQ ANN (gate =
  * exact-recall mode), KNN join, hard negatives, margin mining, k-means,
  * PCA, Matryoshka, MMR; multimodal codec plumbing (mm_*).
  *
  * Gate queries with their DuckDB oracles CO-LOCATED (one file per
  * family, split from the former monolithic ExtQueries — VERDICT r8
  * #7); [[ExtQueries]] merges every family fail-loud on duplicate
  * keys. Shared fixtures/memos/SQL builders live in [[ExtShared]].
  */
private[queries] object ExtSimQueries {
  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    // ---- similarity search ----
    "sim_topk" -> { (s, d) =>
      val e = emb(s, d)
      Similarity.bruteForceTopK(e, e.where(col("vec_id") < 5), k = 10)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
                col("neighbor_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },
    "sim_margin_pairs" -> { (s, d) =>
      // bitext-style pair mining between two disjoint "corpora" (even vs
      // odd vec_ids): ratio-margin scoring (Artetxe & Schwenk 2019), top-2
      // pairs per query; the oracle recomputes the full margin algebra
      val e = emb(s, d)
      Similarity.marginPairs(
          e.where(col("vec_id") % 2 === 0 && col("vec_id") < 16),
          e.where(col("vec_id") % 2 === 1),
          kDenom = 4, pairsPerQuery = 2)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
                col("pair_id"), round(col("margin"), 6).as("margin"))
        .orderBy(col("query_id"), col("rank"))
    },
    "sim_mmr" -> { (s, d) =>
      // diverse top-8 by maximal marginal relevance over a 25-candidate
      // shortlist; the oracle unrolls the same greedy loop in SQL
      val e = emb(s, d)
      Similarity.mmrSelect(e, e.where(col("vec_id") < 5), k = 8,
          shortlist = 25, lambda = 0.7)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
                col("neighbor_id"), round(col("score"), 6).as("score"))
        .orderBy(col("query_id"), col("rank"))
    },
    // Gate mode = exact-recall parameters: IVF probing every cell and LSH
    // probing every bucket are brute force routed through the ANN plan
    // (identical join/partition shape), so both hash-match the brute-force
    // oracle. The approximate parameters stay under bench-only names below.
    "sim_ann_ivf" -> { (s, d) =>
      val e = emb(s, d)
      Similarity.ivfTopK(e, e.where(col("vec_id") < 5), k = 10,
          ivfModel(s, d, nlist = 16), nprobe = 16, "embedding", "vec_id")
        .select(col("query_id"), col("rank").cast("long").as("rank"),
                col("neighbor_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },
    "sim_ann_lsh" -> { (s, d) =>
      val e = emb(s, d)
      Similarity.lshTopK(e, e.where(col("vec_id") < 5), k = 10,
          probeAll = true)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
                col("neighbor_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },
    "sim_ann_sq" -> { (s, d) =>
      // shortlist <= 0 → exact re-rank of every candidate (gate mode)
      val e = emb(s, d)
      Similarity.sqTopK(e, e.where(col("vec_id") < 5), k = 10,
          sqModel(s, d), shortlist = 0, "embedding", "vec_id")
        .select(col("query_id"), col("rank").cast("long").as("rank"),
                col("neighbor_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },
    "sim_ann_bq" -> { (s, d) =>
      // 1-bit sign quantization, shortlist <= 0 → exact re-rank of every
      // candidate (gate mode)
      val e = emb(s, d)
      Similarity.bqTopK(e, e.where(col("vec_id") < 5), k = 10,
          shortlist = 0, "embedding", "vec_id")
        .select(col("query_id"), col("rank").cast("long").as("rank"),
                col("neighbor_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },
    "sim_ann_pq" -> { (s, d) =>
      // shortlist <= 0 → exact re-rank of every candidate (gate mode)
      val e = emb(s, d)
      Similarity.pqTopK(e, e.where(col("vec_id") < 5), k = 10,
          pqModel(s, d), shortlist = 0, "embedding", "vec_id")
        .select(col("query_id"), col("rank").cast("long").as("rank"),
                col("neighbor_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },
    // Encode-once variants: the same exact-recall gate modes, but querying
    // the MATERIALIZED parquet index (encode ran once at build; the query
    // plan contains no encode stage). Hash-matching the same brute-force
    // oracle proves indexed ≡ inline end-to-end through a disk round-trip.
    // Corpus×corpus KNN self-join (semantic pair mining): every embedding
    // queries the rest of the corpus. Gate mode nprobe = nlist ⇒ candidate-
    // complete ⇒ hash-matches the brute-force self-join oracle; salt=2
    // exercises the skew-salting path (results are salt-invariant,
    // spec-checked). Unlike the *TopK faces nothing is broadcast — the two
    // sides meet in a shuffle join on (cell, salt).
    "sim_knn_join" -> { (s, d) =>
      Similarity.knnSelfJoin(emb(s, d), k = 5,
          ivfModel(s, d, nlist = 16), nprobe = 16, salt = 2)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
                col("neighbor_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },
    "sim_knn_join_two_level" -> { (s, d) =>
      // the sharded-IVF rung past the autoNlist clamp (VERDICT r12 next
      // #2) in EXACT gate mode: the memoized fixture model's tiny
      // maxNlist engages the clamp (nshards > 1), and probing every
      // shard's every sub-cell scores each (query, corpus) pair exactly
      // once — cells partition the corpus, so output ≡ the brute-force
      // oracle regardless of the fit (the sim_ann_* exact-mode
      // convention); the probe twin runs the approximate parameters
      val e = emb(s, d)
      val m = ivf2Model(s, d)
      // query side bounded at vec_id < 4000: a NO-OP at driver scales
      // (the whole sf0.1 corpus is 2000 vectors) that keeps the exact
      // all-cells probe explosion affordable at the 10x sweep (the
      // sim_ann_* bounded-query precedent; the corpus side stays full)
      Similarity.ivfKnnJoinTwoLevel(
          Similarity.ivfIndexTwoLevel(e, m),
          e.where(col("vec_id") < 4000), k = 5, m,
          nprobeShards = m.nshards, nprobe = 4, salt = 2)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
                col("neighbor_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },
    "sim_ann_ivf_indexed" -> { (s, d) =>
      val e = emb(s, d)
      Similarity.ivfTopKIndexed(ivfIdx(s, d, 16),
          e.where(col("vec_id") < 5), k = 10,
          ivfModel(s, d, nlist = 16), nprobe = 16, "embedding", "vec_id")
        .select(col("query_id"), col("rank").cast("long").as("rank"),
                col("neighbor_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },
    "sim_ann_lsh_indexed" -> { (s, d) =>
      val e = emb(s, d)
      Similarity.lshTopKIndexed(lshIdx(s, d),
          e.where(col("vec_id") < 5), k = 10, probeAll = true)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
                col("neighbor_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },
    "sim_ann_sq_indexed" -> { (s, d) =>
      val e = emb(s, d)
      Similarity.sqTopKIndexed(sqIdx(s, d),
          e.where(col("vec_id") < 5), k = 10,
          sqModel(s, d), shortlist = 0, "embedding", "vec_id")
        .select(col("query_id"), col("rank").cast("long").as("rank"),
                col("neighbor_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },
    "sim_ann_pq_indexed" -> { (s, d) =>
      val e = emb(s, d)
      Similarity.pqTopKIndexed(pqIdx(s, d),
          e.where(col("vec_id") < 5), k = 10,
          pqModel(s, d), shortlist = 0, "embedding", "vec_id")
        .select(col("query_id"), col("rank").cast("long").as("rank"),
                col("neighbor_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },

    "sim_kmeans_train" -> { (s, d) =>
      // DISTRIBUTED k-means TRAINING (full-corpus Lloyd, 3 iterations,
      // k=4) under the exact-arithmetic contract — the DuckDB oracle
      // replays the entire fit and must land on bit-identical centroids
      val m = qkmModel(s, d)
      import s.implicits._
      m.centers.zipWithIndex.flatMap { case (c, cell) =>
        c.zipWithIndex.map { case (v, j) => (cell, j, v) } }.toSeq
        .toDF("cell", "dim", "cq")
        .orderBy(col("cell"), col("dim"))
    },
    "sim_kmeans_train_assign" -> { (s, d) =>
      // final cell assignment under the trained model (same exact Long
      // argmin the fit used)
      Similarity.kmeansAssignQ(emb(s, d), qkmModel(s, d))
        .orderBy(col("vec_id"))
    },
    "sim_hard_negatives" -> { (s, d) =>
      // contrastive hard negatives: top cosine neighbors of each query
      // minus its declared positives (vec_id+1 stands in), dense-ranked
      val e = emb(s, d)
      val pos = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"),
          (col("vec_id") + 1).as("pos_id"))
      Similarity.hardNegatives(e, pos, k = 10)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neg_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },
    "sim_matryoshka" -> { (s, d) =>
      // MRL truncate-renorm: first 8 dims, unit-normalized (narrow map)
      val m = Similarity.matryoshka(col("embedding"), dims = 8)
      emb(s, d).select(col("vec_id") +: (0 until 8).map(i =>
          round(element_at(m, i + 1), 6).as(s"m$i")): _*)
        .orderBy(col("vec_id"))
    },
    "sim_index_health" -> { (s, d) =>
      // per-cell population report over the trained model's assignment —
      // the probe-budget ops face; exact integer share/load arithmetic
      Similarity.indexHealth(
          Similarity.kmeansAssignQ(emb(s, d), qkmModel(s, d)), k = 4)
        .orderBy(col("cell"))
    },
    "sim_recall_report" -> { (s, d) =>
      // index-quality eval harness: recall@10 of the 1-bit BQ probe
      // (Hamming shortlist 12, exact cosine re-rank — a REAL approximate
      // configuration, unlike the exact-recall gate modes) against
      // brute-force ground truth. Sign bits and Hamming ranks are
      // engine-portable, so the oracle replays BOTH tiers and the recall
      // join in SQL — the one approximate ANN face that can be
      // hash-gated end-to-end rather than certified.
      val e = emb(s, d)
      val q = e.where(col("vec_id") < 5)
      Similarity.recallReport(
          Similarity.bqTopK(e, q, k = 10, shortlist = 12),
          Similarity.bruteForceTopK(e, q, k = 10))
        .orderBy(col("query_id"))
    },
    "sim_kmeans_assign" -> { (s, d) =>
      // nearest-centroid assignment with DECLARED centroids (the first 4
      // corpus vectors) — deterministic and DuckDB-mirrorable, so the
      // clustering primitive itself is oracle-checked, not only the
      // operators built on it. Ties break to the lowest cell id on both
      // engines; distances are exact doubles on both.
      val e = emb(s, d)
      val cents = e.where(col("vec_id") < 4).orderBy("vec_id")
        .select(col("embedding").cast("array<double>"))
        .collect().map(_.getSeq[Double](0).toArray)
      Similarity.assignCells(e, Similarity.IvfModel(cents))
        .select(col("vec_id"), col("cell").cast("long").as("cell"))
        .orderBy(col("vec_id"))
    },

    "sim_project" -> { (s, d) =>
      // basis projection (the dimensionality-reduction primitive): project
      // every embedding onto the first 4 corpus vectors — deterministic
      // and oracle-mirrorable (DuckDB list_dot_product); the production
      // form passes a gaussianBasis (JL random projection) instead, same
      // plan. Components rounded to absorb nothing: both engines
      // accumulate sequentially in double, but ROUND keeps the comparison
      // robust to representation.
      val e = emb(s, d)
      val basis = e.where(col("vec_id") < 4).orderBy("vec_id")
        .select(col("embedding").cast("array<double>"))
        .collect().map(_.getSeq[Double](0).toArray).toSeq
      Similarity.projectOnBasis(e, basis)
        .select(col("vec_id") +: (0 until 4).map(i =>
          round(element_at(col("projected"), i + 1), 6).as(s"p$i")): _*)
        .orderBy(col("vec_id"))
    },
    "sim_gram" -> { (s, d) =>
      // the distributed second-moment statistic itself: upper triangle of
      // Σ v·vᵀ over the embedding table (treeAggregate of one 17 KB
      // buffer per task — the PCA/covariance sufficient statistic),
      // rounded to 6 like every float-valued sim gate
      val g = Similarity.gramMatrix(emb(s, d))
      import s.implicits._
      val rows = for { i <- g.indices; j <- i until g.length } yield
        (i.toLong, j.toLong,
          BigDecimal(g(i)(j)).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
      rows.toDF("i", "j", "v").orderBy("i", "j")
    },
    "sim_pca_project" -> { (s, d) =>
      // PCA train -> project. The eigensolve is not SQL-expressible, so
      // the hashed output is a CERTIFICATE the fit must honor, each
      // column computed honestly from the model + data (never lit(true)
      // shortcuts on the per-vector lanes):
      //  - orth_ok / var_desc_ok: driver-side k x k orthonormality and
      //    eigenvalue ordering of the fitted basis (model-level, k*k*d
      //    flops — constant per corpus);
      //  - bessel_ok: per vector, ||p||^2 <= ||x - mu||^2 (projection
      //    onto an orthonormal basis cannot gain energy — fails if the
      //    "basis" isn't one). Computed via a SECOND arithmetic path
      //    (explicit centering) than pcaProject's folded-offset form;
      //  - whiten_ok: per vector, pcaProject's whitened output times
      //    sqrt(lambda_i) matches the explicitly-centered raw projection
      //    — ties the gate's actual public-API output to the model.
      // The projections' values themselves stay spec-covered (eigen
      // equation vs the oracle-checked sim_gram moments).
      val m = fittedPca(s, d)
      val eps = 1e-6
      val orthOk = {
        val q = m.components
        (0 until m.k).forall { i =>
          (i until m.k).forall { j =>
            val dot = q(i).zip(q(j)).map { case (a, b) => a * b }.sum
            math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9
          }
        }
      }
      val varDescOk = m.eigenvalues.zip(m.eigenvalues.drop(1))
        .forall { case (a, b) => a >= b - 1e-12 }
      val proj = Similarity.pcaProject(emb(s, d), m, whiten = true)
      val vd = col("embedding").cast("array<double>")
      val centered = zip_with(vd, array(m.mean.map(lit).toIndexedSeq: _*),
        (x, mu) => x - mu)
      val pRaw = (0 until m.k).map { i =>
        graft.functions.VectorFunctions.dot_product(centered,
          array(m.components(i).map(lit).toIndexedSeq: _*))
      }
      val sumSq = pRaw.map(p => p * p).reduce(_ + _)
      val cNormSq = graft.functions.VectorFunctions
        .dot_product(centered, centered)
      val whitenOk = (0 until m.k).map { i =>
        val lam = math.sqrt(math.max(m.eigenvalues(i), 1e-12))
        abs(element_at(col("projected"), i + 1) * lam - pRaw(i)) < eps
      }.reduce(_ && _)
      emb(s, d).join(proj, "vec_id")
        .select(col("vec_id"), lit(m.k).cast("int").as("k"),
          lit(orthOk).as("orth_ok"), lit(varDescOk).as("var_desc_ok"),
          (sumSq <= cNormSq * (1 + eps) + eps).as("bessel_ok"),
          whitenOk.as("whiten_ok"))
        .orderBy(col("vec_id"))
    },

    // ---- multimodal plumbing ----
    "mm_decode" -> { (s, d) =>
      Multimodal.resize(Multimodal.decode(Multimodal.asMedia(docs(s, d))), 256)
        .select(col("media_id"), col("meta.width").as("width"),
                col("meta.height").as("height"),
                col("meta.channels").as("channels"),
                col("meta.n_bytes").as("n_bytes"))
        .orderBy(col("media_id"))
    },
    // real JPEG lane: synthesize genuine JPEGs with id-derived dimensions,
    // then recover them through an actual javax.imageio decode — the
    // oracle predicts what the real header must contain
    "mm_decode_jpeg" -> { (s, d) =>
      Multimodal.imageStats(Multimodal.synthesizeImages(docs(s, d), "jpeg"))
        .select(col("media_id"), col("width"), col("height"), col("channels"))
        .orderBy(col("media_id"))
    },
    // real PNG lane, lossless: the decoded corner pixel must give back the
    // exact id-derived fill color — a byte-faithful decode round-trip
    "mm_decode_png" -> { (s, d) =>
      Multimodal.imageStats(Multimodal.synthesizeImages(docs(s, d), "png"))
        .orderBy(col("media_id"))
    },
    "mm_frames" -> { (s, d) =>
      Multimodal.sampleFrames(Multimodal.asMedia(docs(s, d)))
        .groupBy(col("media_id"))
        .agg(count(lit(1)).cast("long").as("n_frames"))
        .orderBy(col("media_id"))
    },
    "mm_features" -> { (s, d) =>
      // exact-integer projection of the feature vector: features are
      // cnt_bucket/n_bytes in float32, so round(f * n_bytes) recovers the
      // raw histogram counts exactly (counts ≤ n ≤ 2^24) — the checksum
      // Σ cnt² is integer-exact and DuckDB-oracle checkable, unlike a
      // float sq_norm whose rounding could straddle a decimal boundary.
      val media = Multimodal.asMedia(docs(s, d))
      val feats = Multimodal.extractFeatures(media)
      val nb = media.select(col("media_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"))
      feats.join(nb, Seq("media_id"))
        .select(col("media_id"), size(col("features")).cast("int").as("dim"),
          aggregate(col("features"), lit(0L), (a, x) =>
            a + pow(round(x * col("n_bytes")), 2).cast("long")).as("sum_sq"))
        .orderBy(col("media_id"))
    },
    // image near-dup end-to-end: REAL PPM decode → pHash → 16×4 banding →
    // exact bit_count(xor) verify. The synthesized corpus plants its pair
    // structure as a pure function of the id set (groups of three: base,
    // 3×3-bump near-dup, unrelated texture), so the oracle predicts the
    // exact pair rows without decoding anything; the hash itself is pinned
    // by Round5b/Round10 specs (planted max 2 bits, non-planted min 16 —
    // wide margins around the maxBits = 6 gate threshold).
    "mm_phash_pairs" -> { (s, d) =>
      val media = Multimodal.synthesizeNearDupImages(
        docs(s, d).where(col("doc_id") < 300))
      Multimodal.phashPairs(media, maxBits = 6)
        .select(col("id_a"), col("id_b"),
          (col("hamming") <= 6).as("near"))
        .orderBy(col("id_a"), col("id_b"))
    },
    "sim_retrieval_eval" -> { (s, d) =>
      // recall@10 / MRR@10 / nDCG@10 over a deterministic synthetic
      // run (hash-ordered ranking within 20 query groups) and graded
      // labels (rel 2 on doc_id%7=0, rel 1 on doc_id%5=0) — the metric
      // layer that prices the BM25/ANN/RRF retrieval faces
      val dd = docs(s, d)
      val base = dd.select(col("doc_id"),
        pmod(col("doc_id"), lit(20L)).as("q"),
        pmod(col("doc_id") * 37 + 11, lit(1000L)).as("h"))
      val run = base.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("q"))
          .orderBy(col("h"), col("doc_id"))).cast("long"))
        .select(col("q"), col("doc_id").as("doc"), col("rank"))
      val labels = dd.select(pmod(col("doc_id"), lit(20L)).as("q"),
        col("doc_id").as("doc"),
        when(pmod(col("doc_id"), lit(7L)) === 0, 2L)
          .when(pmod(col("doc_id"), lit(5L)) === 0, 1L)
          .otherwise(0L).as("rel"))
      graft.ext.EvalMetrics.retrievalMetrics(run, labels,
          "q", "doc", "rank", "rel", k = 10)
        .orderBy(col("q"))
    }
  )

  val oracle: Map[String, String] = Map(
    "sim_topk" -> simBruteSql,
    "sim_margin_pairs" ->
      """WITH l AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id % 2 = 0 AND vec_id < 16),
         r AS (SELECT vec_id AS pid, CAST(embedding AS DOUBLE[]) AS rv
           FROM embeddings WHERE vec_id % 2 = 1),
         sc AS (SELECT qid, pid, list_cosine_similarity(qv, rv) AS cos
           FROM l, r),
         fwd AS (SELECT qid, avg(cos) AS favg FROM
           (SELECT qid, cos, row_number() OVER (PARTITION BY qid
              ORDER BY cos DESC, pid) AS rn FROM sc)
           WHERE rn <= 4 GROUP BY qid),
         bwd AS (SELECT pid, avg(cos) AS bavg FROM
           (SELECT pid, cos, row_number() OVER (PARTITION BY pid
              ORDER BY cos DESC, qid) AS rn FROM sc)
           WHERE rn <= 4 GROUP BY pid),
         m AS (SELECT sc.qid, sc.pid,
             sc.cos / ((favg + bavg) / 2) AS margin
           FROM sc JOIN fwd USING (qid) JOIN bwd USING (pid)),
         rk AS (SELECT qid, pid, margin, row_number() OVER
             (PARTITION BY qid ORDER BY margin DESC, pid) AS rank FROM m)
         SELECT qid AS query_id, CAST(rank AS BIGINT) AS rank,
                pid AS pair_id, round(margin, 6) AS margin
         FROM rk WHERE rank <= 2 ORDER BY query_id, rank""",
    "sim_mmr" -> mmrSql(k = 8, shortlist = 25, lam = 0.7),
    "sim_ann_ivf" -> simBruteSql,
    "sim_ann_lsh" -> simBruteSql,
    "sim_ann_sq" -> simBruteSql,
    "sim_ann_bq" -> simBruteSql,
    "sim_ann_pq" -> simBruteSql,
    // brute-force SELF-join ground truth: gate-mode (nprobe = nlist)
    // candidate-completeness makes the salted shuffle KNN join ≡ this
    // MATERIALIZED cast: one double[] conversion per vector, not per
    // pair — at 20 k × 20 k the per-pair cast dominated the replay
    "sim_knn_join" ->
      """WITH v AS MATERIALIZED (SELECT vec_id,
               CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_cosine_similarity(q.e, c.e) AS cos
             FROM v q, v c WHERE c.vec_id <> q.vec_id),
         ranked AS (SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rank
             FROM scored)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
                round(cos, 6) AS cos
         FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""",
    // the two-level exact mode scores the identical pair universe (cells
    // partition the corpus; every cell probed) — same brute-force replay
    "sim_knn_join_two_level" ->
      """WITH v AS MATERIALIZED (SELECT vec_id,
               CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_cosine_similarity(q.e, c.e) AS cos
             FROM v q, v c
             WHERE c.vec_id <> q.vec_id AND q.vec_id < 4000),
         ranked AS (SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rank
             FROM scored)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
                round(cos, 6) AS cos
         FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""",
    "sim_ann_ivf_indexed" -> simBruteSql,
    "sim_ann_lsh_indexed" -> simBruteSql,
    "sim_ann_sq_indexed" -> simBruteSql,
    "sim_ann_pq_indexed" -> simBruteSql,
    "sim_kmeans_train" -> qkmeansSql(4, 3,
      """SELECT CAST(cell AS INT) AS cell, CAST(dims.j AS INT) AS dim,
                CAST(c[dims.j + 1] AS BIGINT) AS cq
         FROM c3 CROSS JOIN dims ORDER BY cell, dim"""),
    "sim_kmeans_train_assign" -> qkmeansSql(4, 4,
      """SELECT id AS vec_id, CAST(cell AS INT) AS cell
         FROM b4 ORDER BY vec_id"""),
    "sim_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id,
             CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 5),
         scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[]))
               AS cos
           FROM q, embeddings e WHERE e.vec_id <> q.query_id),
         short AS (SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id) AS r0
           FROM scored),
         cand AS (SELECT * FROM short WHERE r0 <= 18),
         pos AS (SELECT vec_id AS query_id, vec_id + 1 AS pos_id
                 FROM embeddings WHERE vec_id < 5),
         kept AS (SELECT c.query_id, c.neighbor_id, c.cos,
             row_number() OVER (PARTITION BY c.query_id
               ORDER BY c.cos DESC, c.neighbor_id) AS rank
           FROM cand c LEFT JOIN pos p ON p.query_id = c.query_id
             AND p.pos_id = c.neighbor_id
           WHERE p.query_id IS NULL)
         SELECT query_id, CAST(rank AS BIGINT) AS rank,
           neighbor_id AS neg_id, round(cos, 6) AS cos
         FROM kept WHERE rank <= 10 ORDER BY query_id, rank""",
    "sim_matryoshka" -> {
      val cols = (0 until 8).map(i =>
        s"round(CASE WHEN nm = 0 THEN s[${i + 1}] ELSE s[${i + 1}] / nm END, 6) AS m$i")
        .mkString(",\n           ")
      s"""WITH v AS (SELECT vec_id,
             CAST(embedding AS DOUBLE[])[1:8] AS s FROM embeddings),
         n AS (SELECT vec_id, s,
             sqrt(list_sum(list_transform(s, x -> x * x))) AS nm FROM v)
         SELECT vec_id,
           $cols
         FROM n ORDER BY vec_id"""
    },
    "sim_index_health" -> qkmeansSql(4, 4,
      """SELECT CAST(cells.cell AS INT) AS cell,
           CAST(coalesce(cnt.n, 0) AS BIGINT) AS n,
           CAST((coalesce(cnt.n, 0) * 1000000)
                // greatest(1, (SELECT count(*) FROM b4)) AS BIGINT)
             AS share_ppm,
           CAST((coalesce(cnt.n, 0) * 4 * 1000)
                // greatest(1, (SELECT count(*) FROM b4)) AS BIGINT)
             AS load_x1000
         FROM (SELECT unnest(range(4)) AS cell) cells
         LEFT JOIN (SELECT cell, CAST(count(*) AS BIGINT) AS n
                    FROM b4 GROUP BY cell) cnt ON cnt.cell = cells.cell
         ORDER BY cell"""),
    "sim_recall_report" ->
      """WITH q AS (SELECT vec_id AS query_id,
               CAST(embedding AS DOUBLE[]) AS qv
             FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id AS neighbor_id,
               CAST(embedding AS DOUBLE[]) AS cv
             FROM embeddings),
         p AS (SELECT q.query_id, c.neighbor_id, q.qv, c.cv,
               len(list_filter(range(1, len(q.qv) + 1),
                   i -> (q.qv[i] > 0) <> (c.cv[i] > 0))) AS ham
             FROM q, c WHERE c.neighbor_id <> q.query_id),
         short AS (SELECT query_id, neighbor_id, qv, cv,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY ham, neighbor_id) AS hr
             FROM p),
         approx AS (SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY list_cosine_similarity(qv, cv) DESC,
                          neighbor_id) AS r
             FROM short WHERE hr <= 12),
         truth AS (SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY list_cosine_similarity(qv, cv) DESC,
                          neighbor_id) AS r
             FROM p)
         SELECT t.query_id, CAST(count(*) AS BIGINT) AS k_truth,
           CAST(count(a.query_id) AS BIGINT) AS hits,
           CAST(round(count(a.query_id) * 1.0 / count(*), 6) AS DOUBLE)
             AS recall
         FROM (SELECT * FROM truth WHERE r <= 10) t
         LEFT JOIN (SELECT * FROM approx WHERE r <= 10) a
           ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
         GROUP BY t.query_id ORDER BY t.query_id""",
    "sim_kmeans_assign" ->
      """WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
                    FROM embeddings WHERE vec_id < 4),
              v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
                    FROM embeddings)
         SELECT v.vec_id,
                (SELECT c.cid FROM c
                 ORDER BY list_distance(v.ev, c.cv) ASC, c.cid LIMIT 1) AS cell
         FROM v ORDER BY v.vec_id""",
    "sim_project" ->
      """WITH b AS (SELECT vec_id AS bid, CAST(embedding AS DOUBLE[]) AS bv
                    FROM embeddings WHERE vec_id < 4),
              v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
                    FROM embeddings)
         SELECT v.vec_id,
                ROUND(list_dot_product(v.ev, (SELECT bv FROM b WHERE bid = 0)), 6) AS p0,
                ROUND(list_dot_product(v.ev, (SELECT bv FROM b WHERE bid = 1)), 6) AS p1,
                ROUND(list_dot_product(v.ev, (SELECT bv FROM b WHERE bid = 2)), 6) AS p2,
                ROUND(list_dot_product(v.ev, (SELECT bv FROM b WHERE bid = 3)), 6) AS p3
         FROM v ORDER BY v.vec_id""",
    "sim_gram" ->
      """WITH v AS (SELECT CAST(embedding AS DOUBLE[]) AS ev
                    FROM embeddings),
              idx AS (SELECT i.range AS i, j.range AS j
                      FROM range(64) i, range(64) j
                      WHERE j.range >= i.range)
         SELECT CAST(idx.i AS BIGINT) AS i, CAST(idx.j AS BIGINT) AS j,
                round(sum(v.ev[idx.i + 1] * v.ev[idx.j + 1]), 6) AS v
         FROM v, idx GROUP BY idx.i, idx.j ORDER BY i, j""",
    // certificate-column gates: the fit itself is not SQL-expressible
    // (eigensolve / iterative argmax), so the engine emits per-row
    // claims it computes honestly from the fit + data, and the oracle
    // asserts every claim holds (TRUE) over the replayable row set
    "sim_pca_project" ->
      """SELECT vec_id, CAST(8 AS INT) AS k, TRUE AS orth_ok,
           TRUE AS var_desc_ok, TRUE AS bessel_ok, TRUE AS whiten_ok
         FROM embeddings ORDER BY vec_id""",
    "mm_decode" ->
      """WITH m AS (SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(text)) % 512 + 1 AS INT) AS w0,
           CAST(octet_length(encode(text)) // 512 + 1 AS INT) AS h0
           FROM documents)
         SELECT media_id,
           CAST(ceil(w0 * least(1.0, 256.0 / greatest(w0, h0))) AS INT) AS width,
           CAST(ceil(h0 * least(1.0, 256.0 / greatest(w0, h0))) AS INT) AS height,
           3 AS channels, n_bytes
         FROM m ORDER BY media_id""",
    "mm_decode_jpeg" ->
      """SELECT doc_id AS media_id,
         CAST(doc_id % 30 + 2 AS INT) AS width,
         CAST(doc_id % 19 + 2 AS INT) AS height,
         CAST(3 AS INT) AS channels
         FROM documents ORDER BY media_id""",
    "mm_decode_png" ->
      """SELECT doc_id AS media_id,
         CAST(doc_id % 30 + 2 AS INT) AS width,
         CAST(doc_id % 19 + 2 AS INT) AS height,
         CAST(3 AS INT) AS channels,
         CAST((doc_id * 7) % 256 AS INT) AS r0,
         CAST((doc_id * 13) % 256 AS INT) AS g0,
         CAST((doc_id * 29) % 256 AS INT) AS b0
         FROM documents ORDER BY media_id""",
    "mm_frames" ->
      """SELECT doc_id AS media_id,
         CAST(greatest(octet_length(encode(text)) // 64, 1) AS BIGINT) AS n_frames
         FROM documents ORDER BY media_id""",
    "mm_features" ->
      """WITH m AS (SELECT doc_id AS media_id, encode(text) AS payload
           FROM documents),
         b AS (SELECT media_id, hex(payload) AS hx,
               octet_length(payload) AS n FROM m),
         by AS (SELECT media_id,
               CAST(('0x' || substr(hx, CAST(2 * unnest(range(n)) + 1 AS INT), 2))
                    AS INT) AS byte
               FROM b),
         c AS (SELECT media_id, byte // 16 AS bucket, count(*) AS cnt
               FROM by GROUP BY media_id, bucket),
         s AS (SELECT media_id, CAST(sum(cnt * cnt) AS BIGINT) AS sum_sq
               FROM c GROUP BY media_id)
         SELECT m.media_id, CAST(16 AS INT) AS dim,
                coalesce(s.sum_sq, 0) AS sum_sq
         FROM m LEFT JOIN s ON m.media_id = s.media_id
         ORDER BY m.media_id""",
    "mm_phash_pairs" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 300)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b, TRUE AS near
         FROM ids a JOIN ids b ON b.doc_id = a.doc_id + 1
         WHERE a.doc_id % 3 = 0
         ORDER BY id_a, id_b""",
    "sim_retrieval_eval" ->
      """WITH base AS (SELECT doc_id, doc_id % 20 AS q,
           (doc_id * 37 + 11) % 1000 AS h FROM documents),
         run AS (SELECT q, doc_id AS doc,
             CAST(row_number() OVER (PARTITION BY q
               ORDER BY h, doc_id) AS BIGINT) AS rank
           FROM base),
         lb AS (SELECT doc_id % 20 AS q, doc_id AS doc,
             CASE WHEN doc_id % 7 = 0 THEN 2
                  WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS rel
           FROM documents),
         lbp AS (SELECT q, doc, CAST(rel AS BIGINT) AS rel FROM lb
           WHERE rel > 0),
         ideal AS (SELECT q, CAST(sum(CAST(round(
               CAST(rel * 1000000 AS DOUBLE) / log2(i + 1))
               AS BIGINT)) AS BIGINT) AS idcg_micro
           FROM (SELECT q, rel, row_number() OVER (PARTITION BY q
               ORDER BY rel DESC, doc ASC) AS i FROM lbp)
           WHERE i <= 10 GROUP BY q),
         nrel AS (SELECT q, CAST(count(*) AS BIGINT) AS n_rel FROM lbp
           GROUP BY q),
         scored AS (SELECT r.q,
             CAST(sum(CASE WHEN coalesce(lbp.rel, 0) > 0 THEN 1
               ELSE 0 END) AS BIGINT) AS hits,
             min(CASE WHEN coalesce(lbp.rel, 0) > 0 THEN r.rank END)
               AS first_rel,
             CAST(sum(CASE WHEN coalesce(lbp.rel, 0) > 0
               THEN CAST(round(CAST(lbp.rel * 1000000 AS DOUBLE)
                 / log2(r.rank + 1)) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS dcg_micro
           FROM run r LEFT JOIN lbp ON lbp.q = r.q AND lbp.doc = r.doc
           WHERE r.rank <= 10 GROUP BY r.q)
         SELECT nrel.q, nrel.n_rel,
           coalesce(scored.hits, 0) AS hits,
           CAST(coalesce(scored.hits, 0) * 1000000 // nrel.n_rel
             AS BIGINT) AS recall_ppm,
           CAST(coalesce(1000000 // scored.first_rel, 0) AS BIGINT)
             AS rr_ppm,
           coalesce(scored.dcg_micro, 0) AS dcg_micro,
           ideal.idcg_micro,
           CAST(coalesce(scored.dcg_micro, 0) * 1000000
             // ideal.idcg_micro AS BIGINT) AS ndcg_ppm
         FROM nrel LEFT JOIN scored USING (q)
         LEFT JOIN ideal USING (q)
         ORDER BY q"""
  )
}

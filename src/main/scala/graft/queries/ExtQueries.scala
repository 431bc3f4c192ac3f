package graft.queries

import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-data-pipeline extension operators (BASELINE.json north-star): dedup,
  * similarity search, text analysis, multimodal plumbing. Queries without an
  * oracle entry use hash functions DuckDB does not share (xxhash64-based
  * signatures) or are approximate by design → driver's rows-only check.
  */
object ExtQueries {
  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, d: String) =
    s.read.parquet(s"$d/documents.parquet")
  private def emb(s: SparkSession, d: String) =
    s.read.parquet(s"$d/embeddings.parquet")

  val queries: Map[String, Q] = Map(
    // ---- deduplication ----
    "dedup_exact" -> { (s, d) =>
      Dedup.exact(docs(s, d))
        .select(col("keep_id"), col("n_copies"))
        .orderBy(col("keep_id"))
    },
    "dedup_minhash" -> { (s, d) =>
      val dd = docs(s, d)
      Dedup.survivors(dd, Dedup.minhashPairs(dd, "text", "doc_id"), "doc_id")
        .select(col("doc_id")).orderBy(col("doc_id"))
    },
    "dedup_simhash" -> { (s, d) =>
      val dd = docs(s, d)
      Dedup.survivors(dd, Dedup.simhashPairs(dd, "text", "doc_id")
          .withColumnRenamed("hamming", "jaccard"), "doc_id")
        .select(col("doc_id")).orderBy(col("doc_id"))
    },
    "dedup_ngram_jaccard" -> { (s, d) =>
      val dd = docs(s, d)
      Dedup.survivors(dd, Dedup.ngramJaccardPairs(dd, "text", "doc_id"), "doc_id")
        .select(col("doc_id")).orderBy(col("doc_id"))
    },
    "dedup_embedding" -> { (s, d) =>
      val e = emb(s, d)
      e.join(Dedup.embeddingPairs(e).select(col("id_b").as("vec_id")).distinct(),
             Seq("vec_id"), "left_anti")
        .select(col("vec_id")).orderBy(col("vec_id"))
    },

    "join_asof" -> { (s, d) =>
      // point-in-time join: each click paired with the user's most recent
      // prior (or simultaneous) purchase
      val ev = new graft.compile.ParquetEnv(s, d).load("events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      graft.ext.AsOfJoin.asOf(clicks, purchases,
          keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
          rightVals = Map("event_id" -> "purchase_id", "value" -> "purchase_value"))
        .select(col("event_id"), col("user_id"), col("purchase_id"),
                col("purchase_value"))
        .orderBy(col("event_id"))
    },

    // ---- similarity search ----
    "sim_topk" -> { (s, d) =>
      val e = emb(s, d)
      Similarity.bruteForceTopK(e, e.where(col("vec_id") < 5), k = 10)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
                col("neighbor_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },
    "sim_ann_ivf" -> { (s, d) =>
      val e = emb(s, d)
      Similarity.ivfTopK(e, e.where(col("vec_id") < 5), k = 10)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
                col("neighbor_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },
    "sim_ann_lsh" -> { (s, d) =>
      val e = emb(s, d)
      Similarity.lshTopK(e, e.where(col("vec_id") < 5), k = 10)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
                col("neighbor_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },

    // ---- text analysis ----
    "text_langid" -> { (s, d) =>
      docs(s, d)
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))
    },
    "text_quality" -> { (s, d) =>
      docs(s, d)
        .select(col("doc_id"), TextAnalysis.qualityFeatures(col("text")).as("q"))
        .select(col("doc_id"), col("q.n_tokens").as("n_tokens"),
                col("q.mean_token_len").as("mean_token_len"),
                col("q.stopword_ratio").as("stopword_ratio"),
                col("q.non_alnum_ratio").as("non_alnum_ratio"),
                col("q.quality").as("quality"))
        .orderBy(col("doc_id"))
    },
    "text_tokens" -> { (s, d) =>
      docs(s, d)
        .select(col("lang"), TextAnalysis.tokenCount(col("text")).as("n_tok"),
                TextAnalysis.subwordEstimate(col("text")).as("n_sub"))
        .groupBy(col("lang"))
        .agg(sum(col("n_tok")).cast("long").as("total_tokens"),
             sum(col("n_sub")).cast("long").as("total_subwords"))
        .orderBy(col("lang"))
    },
    "text_ngram_freq" -> { (s, d) =>
      // top character trigrams per labeled language — the n-gram profile
      // table language identifiers train on
      import org.apache.spark.sql.expressions.Window
      val grams = docs(s, d)
        .select(col("lang"),
          explode(TextAnalysis.charNgrams(col("text"), 3)).as("gram"))
        .groupBy(col("lang"), col("gram"))
        .agg(count(lit(1)).cast("long").as("n"))
      grams
        .withColumn("rk", row_number().over(
          Window.partitionBy("lang").orderBy(col("n").desc, col("gram"))))
        .where(col("rk") <= 10)
        .select(col("lang"), col("rk").cast("long").as("rk"), col("gram"), col("n"))
        .orderBy(col("lang"), col("rk"))
    },
    "text_fingerprint" -> { (s, d) =>
      docs(s, d)
        .select(col("doc_id"),
                TextAnalysis.fingerprints(col("text")).as("fp"))
        .select(col("doc_id"), size(col("fp")).cast("long").as("n_fp"),
                element_at(col("fp"), 1).as("fp_min"))
        .orderBy(col("doc_id"))
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
    "mm_frames" -> { (s, d) =>
      Multimodal.sampleFrames(Multimodal.asMedia(docs(s, d)))
        .groupBy(col("media_id"))
        .agg(count(lit(1)).cast("long").as("n_frames"))
        .orderBy(col("media_id"))
    },
    "mm_features" -> { (s, d) =>
      Multimodal.extractFeatures(Multimodal.asMedia(docs(s, d)))
        .select(col("media_id"), size(col("features")).as("dim"),
                round(aggregate(col("features").cast("array<double>"),
                  lit(0.0), (a, x) => a + x * x), 6).as("sq_norm"))
        .orderBy(col("media_id"))
    }
  )

  // ------------------------------------------------------------------ //
  private val langScoreSql: String = {
    // mirror of TextAnalysis.langId: marker-hit counts via replace-length
    // arithmetic, argmax with first-lang-wins tie-break, 'und' on zero hits
    def cnt(m: String) = {
      val esc = m.replace("'", "''")
      s"CAST((length(p) - length(replace(p, '$esc', ''))) / ${m.length} AS INT)"
    }
    val scores = TextAnalysis.langMarkers.map { case (lang, ms) =>
      s"(${ms.map(cnt).mkString(" + ")}) AS s_$lang"
    }.mkString(", ")
    val langs = TextAnalysis.langMarkers.map(_._1)
    val m = s"greatest(${langs.map("s_" + _).mkString(", ")})"
    val pick = langs.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ")
    s"""WITH p0 AS (SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents),
        sc AS (SELECT doc_id, $scores FROM p0),
        mx AS (SELECT *, $m AS m FROM sc)
        SELECT doc_id, CASE WHEN m <= 0 THEN 'und' $pick END AS lang_pred
        FROM mx ORDER BY doc_id"""
  }

  val oracle: Map[String, String] = Map(
    "join_asof" ->
      """SELECT l.event_id, l.user_id,
           r.event_id AS purchase_id, r.value AS purchase_value
         FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
               FROM events WHERE event_type = 'click') l
         ASOF LEFT JOIN
              (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
               FROM events WHERE event_type = 'purchase') r
           ON l.user_id = r.user_id AND l.ts >= r.ts
         ORDER BY l.event_id""",
    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
         FROM documents GROUP BY text ORDER BY keep_id""",
    "sim_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                    FROM embeddings WHERE vec_id < 5),
         scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                           list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS cos
                    FROM q, embeddings e WHERE e.vec_id <> q.query_id),
         ranked AS (SELECT query_id, neighbor_id, cos,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY cos DESC, neighbor_id) AS rank
                    FROM scored)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
                round(cos, 6) AS cos
         FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""",
    "text_langid" -> langScoreSql,
    "text_ngram_freq" ->
      """WITH g AS (SELECT lang,
           unnest(list_transform(range(length(text) - 2),
                                 i -> substr(text, CAST(i + 1 AS INT), 3))) AS gram
           FROM documents WHERE length(text) >= 3
           UNION ALL
           SELECT lang, text AS gram FROM documents WHERE length(text) < 3),
         c AS (SELECT lang, gram, count(*) AS n FROM g GROUP BY lang, gram),
         r AS (SELECT lang, gram, n,
                 row_number() OVER (PARTITION BY lang ORDER BY n DESC, gram) AS rk
               FROM c)
         SELECT lang, CAST(rk AS BIGINT) AS rk, gram, CAST(n AS BIGINT) AS n
         FROM r WHERE rk <= 10 ORDER BY lang, rk""",
    "text_quality" ->
      """WITH t AS (SELECT doc_id, text,
           list_filter(string_split(text, ' '), x -> x <> '') AS toks
           FROM documents),
         f AS (SELECT doc_id, text, toks,
           CAST(len(toks) AS DOUBLE) AS n,
           list_sum(list_transform(toks, x -> CAST(length(x) AS DOUBLE)))
             / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS mean_len,
           list_sum(list_transform(toks, x -> CASE WHEN lower(x) IN
             ('the','a','and','of','to','in','is','it') THEN 1.0 ELSE 0.0 END))
             / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS stop_ratio,
           CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))
             AS DOUBLE) / greatest(CAST(length(text) AS DOUBLE), 1.0) AS na_ratio
           FROM t)
         SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           round(mean_len, 4) AS mean_token_len,
           round(stop_ratio, 4) AS stopword_ratio,
           round(na_ratio, 4) AS non_alnum_ratio,
           round(CAST(CASE WHEN n < 5 THEN 0.0 ELSE
             (CASE WHEN mean_len BETWEEN 3 AND 12 THEN 1.0 ELSE 0.5 END)
             * (CASE WHEN stop_ratio BETWEEN 0.01 AND 0.5 THEN 1.0 ELSE 0.7 END)
             * (CASE WHEN na_ratio < 0.2 THEN 1.0 ELSE 0.5 END) END AS DOUBLE), 4)
             AS quality
         FROM f ORDER BY doc_id""",
    "text_tokens" ->
      """SELECT lang,
         CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT)
           AS total_tokens,
         CAST(sum(list_sum(list_transform(
           list_filter(string_split(text, ' '), x -> x <> ''),
           x -> CAST(ceil(length(x) / 4.0) AS BIGINT)))) AS BIGINT)
           AS total_subwords
         FROM documents GROUP BY lang ORDER BY lang""",
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
    "mm_frames" ->
      """SELECT doc_id AS media_id,
         CAST(greatest(octet_length(encode(text)) // 64, 1) AS BIGINT) AS n_frames
         FROM documents ORDER BY media_id"""
  )
}

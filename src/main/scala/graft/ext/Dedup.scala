package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators for LLM-data pipelines (BASELINE.json
  * north-star; the reference itself has no such ops — SURVEY §2.9 notes they
  * are built from Spark primitives).
  *
  * Scale design (100 TB): every variant is
  *   candidate generation (hash/bucket, shuffle on short keys)
  *   → verification (join only within buckets)
  *   → survivor selection (one aggregation).
  * No pairwise O(n²) work ever leaves a bucket; buckets are bounded by the
  * banding parameters. All hashing is xxhash64 (codegen'd Catalyst
  * expression), signatures are fixed-width arrays — shuffle rows stay small
  * even when documents are large, because only (id, band-hash) pairs travel.
  */
object Dedup {

  /** Exact dedup: group identical normalized text, keep the smallest id.
    * One hash-shuffle; at 100 TB, hash first (xxhash64) so the shuffle key is
    * 8 bytes, not the document: here we group by the hash and carry min(id).
    */
  def exact(docs: DataFrame, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame =
    docs
      .groupBy(xxhash64(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).cast("long").as("n_copies"))

  /** Word-shingle array (k consecutive tokens joined), the unit of Jaccard
    * similarity for minhash / n-gram dedup.
    */
  def shingles(textCol: Column, k: Int): Column = {
    val toks = filter(split(textCol, " "), t => t =!= "")
    when(size(toks) >= k,
      array_distinct(transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k))))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * minimum xxhash64 over the shingle set. Pure expressions → codegen;
    * signature is numHashes longs regardless of document size.
    */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => aggregate(shingleCol, lit(Long.MaxValue),
        (acc, s) => least(acc, xxhash64(s, seed))))

  /** MinHash + LSH near-dup candidate pairs with exact Jaccard verification.
    * bands×rowsPerBand hashes; a pair collides if any band matches
    * (s-curve threshold ≈ (1/bands)^(1/rowsPerBand)).
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    */
  def minhashPairs(docs: DataFrame, textCol: String, idCol: String,
                   k: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
                   threshold: Double = 0.7): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sig = docs.select(
      col(idCol).as("id"),
      shingles(col(textCol), k).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    // one row per (doc, band): band key = hash of that band's slice
    val banded = sig.select(
      col("id"), col("sh"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(concat_ws(",",
          transform(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand),
                    x => x.cast("string"))), lit(b))
      }: _*)))
      .withColumnRenamed("col", "band_key")
    // candidate pairs: same band key; verify exact Jaccard on shingle sets
    val l = banded.select(col("band_key"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = banded.select(col("band_key"), col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("band_key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
         size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .distinct()
      .where(col("jaccard") >= threshold)
  }

  /** Survivors after near-dup removal: every doc except the larger id of
    * each confirmed pair (union-find-free approximation standard in corpus
    * dedup: drop any doc dominated by a smaller near-identical one).
    */
  def survivors(docs: DataFrame, pairs: DataFrame, idCol: String): DataFrame =
    docs.join(pairs.select(col("id_b").as(idCol)).distinct(),
              Seq(idCol), "left_anti")

  /** 64-bit SimHash over tokens: bit b of the signature is the sign of
    * Σ_tokens (±1 by bit b of xxhash64(token)). Token hashes computed once,
    * then folded per bit — all expressions.
    */
  def simhash(textCol: Column): Column = {
    val hs = transform(filter(split(textCol, " "), t => t =!= ""),
                       t => xxhash64(t))
    (0 until 64).map { b =>
      when(
        aggregate(hs, lit(0L),
          (a, h) => a + when(shiftright(h, b).bitwiseAND(1) === 1, 1L)
                         .otherwise(-1L)) > 0,
        lit(1L << b)).otherwise(0L)
    }.reduce(_ bitwiseOR _)
  }

  /** SimHash near-dups: hamming(sig_a, sig_b) ≤ maxBits. Pigeonhole banding:
    * split the 64-bit signature into maxBits+1 chunks — any pair within
    * maxBits differing bits shares at least one identical chunk. Join only
    * within chunk buckets, verify with bit_count(xor).
    */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
                   maxBits: Int = 3): DataFrame = {
    val chunks = maxBits + 1
    val width = 64 / chunks
    val sig = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val banded = sig.select(col("id"), col("sig"),
      posexplode(array((0 until chunks).map { c =>
        shiftright(col("sig"), c * width).bitwiseAND(lit((1L << width) - 1))
      }: _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "bits")
    val l = banded.select(col("chunk"), col("bits"), col("id").as("id_a"),
                          col("sig").as("sig_a"))
    val r = banded.select(col("chunk"), col("bits"), col("id").as("id_b"),
                          col("sig").as("sig_b"))
    l.join(r, Seq("chunk", "bits"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxBits)
  }

  /** N-gram Jaccard dedup by prefix filtering: only a document's rarest
    * `prefixSize` shingles generate candidates (documents with Jaccard ≥ t
    * must share one of them), so the inverted index stays sparse. The
    * standard PPJoin-family trick — scales as Σ bucket² over rare shingles
    * only.
    */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
                        k: Int = 2, prefixSize: Int = 10,
                        threshold: Double = 0.8): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), shingles(col(textCol), k).as("sh"))
    val posting = sh.select(col("id"), explode(col("sh")).as("shingle"))
    // global document frequency → rarity rank per doc; keep the prefix
    val df_ = posting.groupBy("shingle").agg(count(lit(1)).as("df"))
    val prefix = posting.join(df_, "shingle")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy(col("df"), col("shingle"))))
      .where(col("rk") <= prefixSize)
      .select(col("shingle"), col("id"))
    val cand = prefix.as("a").join(prefix.as("b"), Seq("shingle"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .where(col("id_a") < col("id_b")).distinct()
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
         size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Embedding near-dup: random-hyperplane LSH buckets (deterministic seed),
    * cosine verification within buckets only.
    */
  def embeddingPairs(emb: DataFrame, vecCol: String = "embedding",
                     idCol: String = "vec_id", planes: Int = 12,
                     threshold: Double = 0.95): DataFrame = {
    val sigCol = Similarity.hyperplaneSignature(col(vecCol), planes, seed = 42)
    val sig = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
                         sigCol.as("bucket"))
    val l = sig.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val r = sig.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
              Similarity.cosine(col("v_a"), col("v_b")).as("cos"))
      .distinct()
      .where(col("cos") >= threshold)
  }
}

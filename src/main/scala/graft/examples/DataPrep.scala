package graft.examples

import graft.ext.{Bucketing, Dedup, Layout, Pipeline, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end LLM training-data preparation, composed from the library's
  * operators — the workflow the ext package exists for, runnable as one
  * pipeline: normalize → C4 rule gate → boilerplate-span removal →
  * near-dup removal (pair detection → clustering → canonicalize) →
  * benchmark decontamination → quality-weighted subsample → leakage-safe
  * split → per-source token budget → token-budget packing → TF-IDF
  * keyword index → partitioned + Z-ordered layout.
  * Every stage is a declarative DataFrame transform; nothing collects to
  * the driver, so the same program is the 100 TB program.
  *
  * Usage: sbt "runMain graft.examples.DataPrep [sfDir] [outDir]".
  */
object DataPrep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("dataprep").toString)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import spark.implicits._
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"raw docs: ${raw.count()}")

    // 0. ingest sanity gate: one-scan profile — a real pipeline aborts the
    //    batch here on a null spike or cardinality collapse; plus the
    //    corpus duplication diagnostic that justifies the dedup stages
    val prof = Pipeline.profile(raw, Seq("doc_id", "lang", "source", "text"))
    require(prof.where(col("col_name") === "doc_id")
      .select(col("n_nonnull") === col("n_rows") &&
              col("n_distinct") === col("n_rows")).first().getBoolean(0),
      "ingest gate: doc_id must be non-null and unique")
    val dupFrac = TextAnalysis.dupShingleStats(raw, "text", "doc_id")
      .agg(avg(col("dup_fraction"))).first().getDouble(0)
    println(f"ingest profile OK; mean cross-doc dup fraction $dupFrac%.3f")

    // 0.2 crawl-interchange round trip: a real pipeline STARTS from WET
    //     blobs; here the corpus is serialized out and re-parsed through
    //     the same lane (byte-framed records, distributed walker)
    val reparsed = graft.sources.Wet.parseBlobs(
      graft.sources.Wet.toBlobs(raw, "doc_id", "lang", "text", nBlobs = 4))
    println(s"wet interchange round-trip: ${reparsed.count()} records")

    // 0.3 when the crawl payload is raw HTML, main-content extraction is
    //     the first transform (codegen'd regex chain, narrow map) —
    //     demonstrated on a wrapped sample
    val htmlClean = raw.limit(50).select(TextAnalysis.stripHtml(
      TextAnalysis.htmlFixture(col("text"), col("doc_id"))).as("text"))
    println(s"html extraction sample: ${htmlClean.count()} docs cleaned")

    // 0.5 URL hygiene — the FIRST cut a crawl pipeline makes, before any
    //     text is even inspected: canonicalize (case/www/ports/tracking
    //     params), drop blocklisted registrable domains (broadcast anti
    //     join), keep one doc per canonical URL (longest wins; only
    //     (canon, pref, id) shuffles, never bodies). URLs here derive
    //     deterministically from the fixture.
    val withUrl = raw.withColumn("url",
      concat(lit("HTTPS://WWW."), col("source"), lit(".Example.com:443/d/"),
        col("doc_id").cast("string"), lit("?utm_source=crawl")))
    val urlKept = graft.ext.Urls.dedupByUrl(
      graft.ext.Urls.filterBlocked(withUrl, "url",
        Seq("blocked.example").toDF("domain")),
      "url", "doc_id", col("n_chars"))
    println(s"after url hygiene: ${urlKept.count()}")

    // 0.7 within-doc boilerplate collapse: repeated segments inside one
    //     document (nav menus, cookie banners) drop to their first
    //     occurrence — a codegen'd linear narrow map
    val lineDeduped = urlKept.withColumn("text",
      TextAnalysis.dedupSegments(col("text"), " "))

    // 1. normalize + PII redaction, language ID, quality features
    val normalized = lineDeduped.select(
      col("doc_id"), col("lang"), col("source"),
      Pipeline.redactPii(Pipeline.normalize(col("text"))).as("text"))
    val scored = normalized
      .withColumn("lang_pred", TextAnalysis.langId(col("text")))
      .withColumn("q", TextAnalysis.qualityFeatures(col("text")))
      .withColumn("rep", TextAnalysis.repetitionRatio(col("text")))

    // 2. gate on quality: the C4/Gopher rule battery plus the coarse
    //    features (loose bounds at this fixture's scale)
    val kept = scored
      .withColumn("c4", TextAnalysis.c4Rules(col("text"),
        minWords = 5, minStopRatio = 0.0, maxRepetition = 0.9))
      .where(col("q.n_tokens") >= 5 && col("rep") < 0.9 && col("c4.keep"))
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
              col("q.n_tokens").as("n_tokens"))
    println(s"after quality gate: ${kept.count()}")

    // 2.5 LM perplexity gate (the CCNet filter): fit the bigram LM on the
    //     quality-kept corpus (one bigram-count shuffle, model stays
    //     distributed), score every doc through the join face, drop the
    //     extreme-perplexity tail. `kept` feeds the fit, the scoring
    //     explode, AND the vocabulary count — persist it once (a real
    //     pipeline checkpoints between major stages for the same reason)
    kept.persist()
    val lm = TextAnalysis.bigramLmFit(kept, "text")
    val pplGated = kept.join(
      TextAnalysis.perplexity(kept, lm, "text", "doc_id")
        .select(col("id").as("doc_id"), col("ppl")),
      Seq("doc_id"))
      .where(col("ppl") <= 60.0)
    println(s"after perplexity gate: ${pplGated.count()}")

    // 2.55 the FULL CCNet cut for comparison: per-language equal-population
    //      head/middle/tail tiers by own-language perplexity — a real
    //      pipeline keeps head+middle and re-weights; here the tier mix is
    //      reported as a diagnostic
    val tiers = TextAnalysis.perplexityBuckets(kept,
        TextAnalysis.bigramLmFitBy(kept, "text", "lang"),
        "text", "doc_id", "lang")
      .groupBy("tier").count().collect()
      .map(r => s"${r.getString(0)}:${r.getLong(1)}").sorted.mkString(", ")
    println(s"ccnet tiers: $tiers")

    // 2.6 compression-ratio gate: severely-templated text (deflate ratio
    //     near zero) is boilerplate the span/dedup stages shouldn't even
    //     have to see — a codegen'd narrow map
    val crGated = pplGated
      .where(TextAnalysis.compressionRatio(col("text")) > 0.02)
      .drop("ppl")
    println(s"after compression-ratio gate: ${crGated.count()}")

    // 2.7 corpus diagnostics in one pass each: hot terms WITHOUT a
    //     full-vocabulary shuffle (Misra-Gries summaries)
    val hot = graft.ext.Sketches.heavyHitters(
      crGated.select(explode(org.apache.spark.sql.functions.split(col("text"), " ")).as("term"))
        .where(col("term") =!= ""), "term", k = 5, capacity = 256)
    println(s"hot terms: ${hot.collect().map(r =>
      s"${r.getString(0)}:${r.getLong(1)}").mkString(", ")}")

    // 2.75 point-frequency complement: a shuffle-free Count-Min fit
    //     answers "how hot is THIS term" for ANY term — including ones
    //     below the Misra-Gries floor — from one 128 KB sketch
    val cms = graft.ext.Sketches.countMinFit(
      crGated.select(explode(org.apache.spark.sql.functions.split(
        col("text"), " ")).as("term")).where(col("term") =!= ""), "term")
    println(s"cms['data'] ≈ ${cms.estimate("data")} of n=${cms.n}")

    // 2.8 value-distribution profiling: the n_tokens histogram (clamped
    //     fixed-range bins, one tiny shuffle) — drift shows up here before
    //     it shows up in model quality
    val histo = Pipeline.histogram(crGated
        .withColumn("nt", col("n_tokens").cast("double")), "nt",
        lo = 0.0, hi = 40.0, nBins = 8)
      .orderBy(col("bin")).collect()
      .map(r => s"${r.getInt(0)}:${r.getLong(3)}").mkString(" ")
    println(s"token-count histogram: $histo")

    // 3. corpus-frequent span removal (C4 line dedup at this corpus's
    //    granularity): boilerplate chunks shared by many docs are cut
    val kept2 = crGated
    val despanned = kept2.drop("text").join(
      Dedup.dedupSpans(kept2, "text", "doc_id", spanWords = 8, maxDocFreq = 4)
        .select(col("doc_id"), col("clean_text").as("text")),
      Seq("doc_id"))
      .where(col("text") =!= "")

    // 4. near-dup removal: exact first (cheap), then MinHash clusters,
    //    keeping the longest representative of each near-dup cluster
    val exactSurvivors = despanned.join(
      Dedup.exact(despanned, "text", "doc_id")
        .select(col("keep_id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    val pairs = Dedup.minhashPairs(exactSurvivors, "text", "doc_id")
    // 4.1 the pre-dedup audit a corpus owner signs off on: how much is
    //     duplicated and in what shapes (n_docs sums back to the corpus)
    val report = Dedup.dedupReport(exactSurvivors, pairs, "doc_id")
      .collect().map(r => s"${r.getLong(0)}x${r.getLong(1)}").mkString(" ")
    println(s"dedup report (size x clusters): $report")
    // checkpoint: everything downstream branches from here. localCheckpoint
    // (not persist) — persist caches DATA but Catalyst still re-analyzes
    // the full logical lineage per downstream reference, and a ~15-stage
    // pipeline referencing this frame many times sends DeduplicateRelations
    // into minutes of driver-side plan walking. Truncating the plan to a
    // LogicalRDD here keeps every later stage's analysis O(its own size) —
    // the same reason pageRank checkpoints its iteration frames.
    val deduped = Dedup.canonicalize(exactSurvivors, pairs, "doc_id",
      prefer = Seq(length(col("text")).desc))
      .localCheckpoint(true)
    println(s"after dedup: ${deduped.count()}")
    kept.unpersist()

    // 5. benchmark decontamination: drop docs sharing 5-gram shingles
    //    with the held-out eval slice (here: doc_id < 10 stands in)
    val eval = deduped.where(col("doc_id") < 10)
    val contaminated = Pipeline.contamination(
      deduped, eval, "text", "doc_id", k = 5, minShared = 2)
      .where(col("doc_id") >= 10) // the eval slice flags itself; keep it out
      .select("doc_id")
    val clean0 = deduped.join(contaminated, Seq("doc_id"), "left_anti")
      .where(col("doc_id") >= 10)
    println(s"after decontamination: ${clean0.count()}")

    // 5.1 the one-call exact filter over PORTABLE n-gram hashes (the
    //     GPT-3/Llama recipe; production n = 13, n = 4 at fixture
    //     scale), plus the stateless Bloom flag — the SAME operator a
    //     streaming ingest applies per micro-batch (recall exactly 1,
    //     Bloom only ever over-flags)
    val clean = Dedup.decontaminate(clean0, eval, "text", "doc_id", n = 4)
      .localCheckpoint(true) // plan barrier — see the dedup checkpoint note
    val flagged = Dedup.contaminationFlag(clean0, eval, "text", "doc_id",
        n = 4).where(col("is_contaminated")).count()
    println(s"after n-gram hash decontamination: ${clean.count()} " +
      s"(bloom pre-flagged $flagged)")

    // 5.2 decontamination-by-RETRIEVAL: shingle overlap (5.) catches
    //     verbatim leakage; BM25 retrieval over the corpus inverted
    //     statistics surfaces the paraphrased kind. Eval sets are
    //     driver-small by nature, so collecting their key terms is the
    //     honest scale shape; the retrieval itself stays distributed.
    val evalTerms = eval.select(col("doc_id"),
        explode(org.apache.spark.sql.functions.split(col("text"), " ")).as("t"))
      .where(col("t") =!= "")
      .groupBy(col("doc_id"), col("t")).count()
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("count").desc, col("t"))))
      .where(col("rk") <= 4)
      .groupBy(col("doc_id")).agg(collect_list(col("t")).as("ts"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toSeq
    //     The index face is the steady-state service shape: postings +
    //     stats build ONCE; every later eval set probes the prebuilt index
    //     with no corpus tokenization at all.
    val bmIndex = TextAnalysis.bm25Index(clean, "text", "doc_id")
    val suspects = TextAnalysis.bm25TopKIndexed(bmIndex, evalTerms, k = 3)
    println(s"retrieval decontamination: ${suspects.count()} " +
      "(eval-query, train-doc) review pairs; max BM25 " +
      f"${suspects.agg(max(col("score"))).first().getDouble(0)}%.2f")

    // 5.5 model-based quality gate: fastText-style linear inference (the
    //     weights would come from a trained model — explicit-vocab form
    //     here, the hashed form needs no vocab at all). A codegen'd pure
    //     map riding the scan: no join, no shuffle.
    val gated = clean.withColumn("clf_score",
        TextAnalysis.classifierScore(col("text"),
          Seq("data" -> 0.5, "query" -> 0.25, "slow" -> -0.5), bias = 0.125))
      .where(col("clf_score") > -0.25)
    println(s"after classifier gate: ${gated.count()}")

    // 5.6 tokenizer training on the CLEANED corpus (tokenizers trained
    //     on raw crawl learn boilerplate pieces): both real-world
    //     families — BPE merges and a unigram-LM (SentencePiece) vocab —
    //     shipped as artifacts beside the dataset
    val bpeM = TextAnalysis.learnBpe(gated, "text", numMerges = 20)
    TextAnalysis.saveBpe(spark, bpeM, s"$outDir-bpe")
    val uniV = TextAnalysis.learnUnigram(gated, "text", vocabSize = 80,
      seedSize = 400, emIters = 2)
    TextAnalysis.saveUnigram(spark, uniV, s"$outDir-unigram")
    val tokStats = gated.agg(
      sum(TextAnalysis.bpeTokenCountExact(col("text"), bpeM)),
      sum(TextAnalysis.unigramTokenCountExact(col("text"), uniV)),
      sum(TextAnalysis.bpeTokenCountExact(col("text"), Nil))).first()
    println(s"tokenizers: bpe ${tokStats.getLong(0)} vs unigram " +
      s"${tokStats.getLong(1)} vs char-baseline ${tokStats.getLong(2)} " +
      "corpus tokens")

    // 5.7 DSIR importance weights toward a target slice ('en' stands in
    //     for the quality seed corpus): hashed n-gram log-ratios in
    //     exact integer micro-nats; a selection pass feeds these into
    //     the weighted draw below (top-k or A-ES resampling)
    val dsir = Pipeline.dsirWeights(gated,
      gated.where(col("lang") === "en"), "text", "doc_id", buckets = 2048)
    val dsirRange = dsir.agg(min(col("weight_unats")),
      max(col("weight_unats"))).first()
    println(s"dsir weights [micro-nats]: ${dsirRange.getLong(0)} .. " +
      s"${dsirRange.getLong(1)}")

    // 6. quality-weighted subsample (longer docs more likely kept — stand-in
    //    for a model quality score), then leakage-safe split (near-dup
    //    cluster members share a split) + per-source token budget +
    //    token-budget packing of the train slice
    val weighted = Pipeline.sampleByWeight(gated,
      least(col("n_tokens").cast("double") / lit(20.0), lit(1.0)), "doc_id")
    println(s"after weighted subsample: ${weighted.count()}")
    val split = Pipeline.splitByCluster(weighted, pairs, "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    val budgeted = Pipeline.selectToBudget(
      split.where(col("split") === "train"), "source",
      TextAnalysis.tokenCount(col("text")), budget = 100000L,
      orderCols = Seq(col("n_tokens").desc, col("doc_id")))
    val packed = Pipeline.packSequences(
      budgeted, "doc_id",
      TextAnalysis.tokenCount(col("text")), budget = 1024)
    println(s"train sequences packed into ${
      packed.agg(max(col("last_bin"))).collect()(0).getLong(0) + 1} bins")

    // 6.9 temperature-flattened language mix of the train slice (α=0.5):
    //     head languages downsample, tail languages upsample with
    //     epoch-tagged copies — deterministic, budget-bounded output
    val mixed = Pipeline.sampleToTemperature(
      split.where(col("split") === "train"), "lang", "doc_id",
      alpha = 0.5, target = 200L)
    println(s"temperature mix: ${mixed.count()} rows, " +
      s"max epoch ${mixed.agg(max(col("epoch"))).collect()(0).getInt(0)}")

    // 6.5 context-window prep: long train docs split into overlapping
    //     character chunks (the RAG/pretraining window shape) — a narrow
    //     flatMap, so chunk volume scales with text size, not doc count
    val chunks = Pipeline.chunkByChars(
      split.where(col("split") === "train"), chunkChars = 256,
      overlapChars = 32)
    println(s"train chunks: ${chunks.count()}")

    // 7. per-doc keyword index (TF-IDF top terms) for inspection/search
    val keywords = TextAnalysis.tfidfTopTerms(split, "text", "doc_id",
      k = 3, minDf = 2)
    println(s"keyword index rows: ${keywords.count()}")

    // 7.5 embedding-side prep: random-project embeddings to 8 dims (the
    //     JL transform — k codegen'd dot products, no shuffle) and
    //     partition the corpus into semantic cells with a fit-once
    //     coarse quantizer (two jobs to train, a narrow map to assign)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    val projected = graft.ext.Similarity.projectOnBasis(
      emb, graft.ext.Similarity.gaussianBasis(k = 8, dim = dim))
    val cells = graft.ext.Similarity.assignCells(
      emb, graft.ext.Similarity.fitIvf(emb, nlist = 8))
    println(s"projected ${projected.count()} embeddings to 8 dims; " +
      s"cells: ${cells.groupBy("cell").count().count()} non-empty")

    // 7.51 when the corpus is too skewed for a sample fit, the
    //      DISTRIBUTED k-means trains on every row (exact-arithmetic
    //      Lloyd: one tiny partial-agg shuffle per iteration, replayable
    //      bit-for-bit by any engine)
    val qkm = graft.ext.Similarity.kmeansFitQ(emb, k = 8, iters = 3)
    val qCells = graft.ext.Similarity.kmeansAssignQ(emb, qkm)
    println(s"distributed k-means: ${qCells.groupBy("cell").count().count()}" +
      " non-empty cells (full-corpus fit)")

    // 7.52 learned dimensionality reduction: PCA fit from one distributed
    //      moment-statistics pass (17 KB buffer per task), whitened
    //      projection as literal-folded dot products — the
    //      preconditioner that makes SemDeDup/clustering distances
    //      behave; compare 7.5's data-free JL projection
    val pcaFull = graft.ext.Similarity.pcaFit(emb, k = dim)
    val pca = pcaFull.copy(components = pcaFull.components.take(8),
      eigenvalues = pcaFull.eigenvalues.take(8))
    val whitened = graft.ext.Similarity.pcaProject(emb, pca, whiten = true)
    println(f"pca: top-8 captures ${
      pca.eigenvalues.sum / pcaFull.eigenvalues.sum * 100}%.1f%% of " +
      s"variance; projected ${whitened.count()} vectors")

    // 7.55 diverse few-shot exemplars: MMR re-rank so the picked set is
    //      not k paraphrases of the nearest neighbor (the eval/ICL draw)
    val exemplars = graft.ext.Similarity.mmrSelect(
      emb, emb.where(col("vec_id") < 2), k = 4, shortlist = 16, lambda = 0.7)
    println(s"mmr exemplars: ${exemplars.count()} picks for 2 queries")

    // 7.6 wire-format export: the train slice Avro-encoded per record
    //     (the serde a Kafka producer would apply), written alongside the
    //     parquet layout for downstream consumers
    val avroSerde = graft.serde.Serdes.avro(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_tokens",
          org.apache.spark.sql.types.LongType))))
    split.where(col("split") === "train")
      .select(col("doc_id"),
        avroSerde.encode(struct(col("text"), col("n_tokens"))).as("value"))
      .write.mode("overwrite").parquet(s"$outDir-avro")
    println(s"avro-encoded train records at $outDir-avro")

    // 8. partitioned layout for the trainer: one directory per split,
    //    sorted by doc_id inside files — plus a Z-ordered copy clustered
    //    on (lang-bucket, length-bucket) so scans filtered on EITHER
    //    dimension prune files
    Bucketing.writePartitioned(split, outDir,
      partitionCols = Seq("split"), sortCols = Seq("doc_id"))
    Layout.writeZOrdered(
      split.withColumn("lang_b", pmod(xxhash64(col("lang")), lit(64L)))
           .withColumn("len_b", least(length(col("text")) / lit(16), lit(63L))),
      Seq(col("lang_b"), col("len_b")), bits = 6, s"$outDir-z", numFiles = 4)
    println(s"wrote ${spark.read.parquet(outDir).count()} docs to $outDir " +
      s"(+ z-ordered copy at $outDir-z)")

    spark.stop()
  }
}

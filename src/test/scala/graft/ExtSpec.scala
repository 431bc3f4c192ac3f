package graft

import graft.ext.{Dedup, Multimodal, Pipeline, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Semantic checks for the LLM-pipeline operators, mixing the driver
  * fixtures with tiny crafted frames for edge semantics.
  */
class ExtSpec extends SparkSpecBase {

  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("exact dedup groups identical texts and keeps the min id") {
    val crafted = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(crafted).collect()
      .map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies")).toMap
    assert(out == Map(1L -> 2L, 3L -> 1L))
  }

  test("minhash finds an injected near-duplicate and verifies jaccard") {
    val base = docs.limit(50)
    val dup = base.where(col("doc_id") === base.select(min("doc_id")).head.getLong(0))
      .select((col("doc_id") + 1000000).as("doc_id"),
        // near-dup: append two words to an existing doc
        concat(col("text"), lit(" extra tail")).as("text"))
    val corpus = base.select("doc_id", "text").unionByName(dup)
    val pairs = Dedup.minhashPairs(corpus, "text", "doc_id").collect()
    assert(pairs.exists(r => r.getAs[Long]("id_b") >= 1000000 &&
                             r.getAs[Double]("jaccard") > 0.8))
    val surv = Dedup.survivors(corpus,
      Dedup.minhashPairs(corpus, "text", "doc_id"), "doc_id")
    assert(surv.where(col("doc_id") >= 1000000).count() == 0) // dup dropped
  }

  test("simhash hamming-0 on identical docs, banding finds them") {
    val crafted = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words entirely here now")).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(crafted, "text", "doc_id").collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Long]("id_a") == 1L &&
           pairs.head.getAs[Long]("id_b") == 2L &&
           pairs.head.getAs[Int]("hamming") == 0)
  }

  test("ngram jaccard confirms injected duplicate above threshold") {
    val base = docs.limit(50).select("doc_id", "text")
    val dup = base.limit(1)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
    val pairs = Dedup.ngramJaccardPairs(base.unionByName(dup), "text", "doc_id")
      .collect()
    assert(pairs.exists(r => r.getAs[Long]("id_b") >= 1000000 &&
                             r.getAs[Double]("jaccard") == 1.0))
  }

  test("embedding LSH dedup finds an injected duplicate vector") {
    val base = emb.select(col("vec_id"), col("embedding"))
    val dup = base.where(col("vec_id") === 0)
      .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
    val pairs = graft.ext.Dedup.embeddingPairs(base.unionByName(dup))
      .collect()
    assert(pairs.exists(r => r.getAs[Long]("id_a") == 0L &&
                             r.getAs[Long]("id_b") == 1000000L &&
                             r.getAs[Double]("cos") > 0.999))
  }

  test("semantic (clustered) dedup finds an injected duplicate vector") {
    // identical vectors always share a k-means cell, so the within-cell
    // pair generation cannot miss exact duplicates at any nclusters
    val base = emb.select(col("vec_id"), col("embedding"))
    val dup = base.where(col("vec_id") === 7)
      .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
    val pairs = graft.ext.Dedup.semanticPairs(
      base.unionByName(dup), nclusters = 8).collect()
    assert(pairs.exists(r => r.getAs[Long]("id_a") == 7L &&
                             r.getAs[Long]("id_b") == 1000007L &&
                             r.getAs[Double]("cos") > 0.999))
    // precision is exact: every emitted pair is cosine-verified
    assert(pairs.forall(_.getAs[Double]("cos") >= 0.95))
  }

  test("brute-force topk: neighbors ranked by cosine, self excluded") {
    val res = Similarity.bruteForceTopK(emb, emb.where(col("vec_id") === 0), 5)
    val rows = res.orderBy("rank").collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[Long]("neighbor_id") != 0L))
    val sims = rows.map(_.getAs[Double]("cos"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("lsh topk returns a subset consistent with brute force scores") {
    val bf = Similarity.bruteForceTopK(emb, emb.where(col("vec_id") === 0), 10)
      .select("neighbor_id", "cos").as[(Long, Double)].collect().toMap
    val approx = Similarity.lshTopK(emb, emb.where(col("vec_id") === 0), 10)
      .select("neighbor_id", "cos").as[(Long, Double)].collect()
    // every approx hit must carry the exact cosine score
    approx.foreach { case (id, c) =>
      bf.get(id).foreach(exact => assert(math.abs(exact - c) < 1e-12))
    }
    assert(approx.nonEmpty)
  }

  test("ivf topk probes cells and carries exact cosine scores") {
    val bf = Similarity.bruteForceTopK(emb, emb.where(col("vec_id") === 0), 10)
      .select("neighbor_id", "cos").as[(Long, Double)].collect().toMap
    val ivf = Similarity.ivfTopK(emb, emb.where(col("vec_id") === 0), 10,
        nlist = 8, nprobe = 3)
      .select("neighbor_id", "cos").as[(Long, Double)].collect()
    assert(ivf.nonEmpty && ivf.length <= 10)
    ivf.foreach { case (id, c) =>
      bf.get(id).foreach(exact => assert(math.abs(exact - c) < 1e-12))
    }
  }

  test("sq topk: quantized shortlist recalls the exact top-k, scores exact") {
    val bf = Similarity.bruteForceTopK(emb, emb.where(col("vec_id") === 0), 10)
      .select("neighbor_id", "cos").as[(Long, Double)].collect().toMap
    // shortlist 50 out of the corpus: 8-bit reconstruction error is far
    // below the cosine gaps between rank 10 and rank 50, so recall is full
    val sq = Similarity.sqTopK(emb, emb.where(col("vec_id") === 0), 10,
        shortlist = 50)
      .select("neighbor_id", "cos").as[(Long, Double)].collect()
    assert(sq.length == 10)
    assert(sq.map(_._1).toSet == bf.keySet)
    sq.foreach { case (id, c) =>
      assert(math.abs(bf(id) - c) < 1e-12) // re-rank uses EXACT vectors
    }
  }

  test("pq topk: ADC shortlist recalls most of the exact top-k, scores exact") {
    val bf = Similarity.bruteForceTopK(emb, emb.where(col("vec_id") === 0), 10)
      .select("neighbor_id", "cos").as[(Long, Double)].collect().toMap
    val pq = Similarity.pqTopK(emb, emb.where(col("vec_id") === 0), 10,
        shortlist = 50)
      .select("neighbor_id", "cos").as[(Long, Double)].collect()
    assert(pq.length == 10)
    // PQ reconstruction is coarser than SQ8: require ≥ 8/10 recall at a
    // 50-candidate shortlist rather than exactness
    val recall = pq.map(_._1).count(bf.contains)
    assert(recall >= 8, s"recall $recall/10 too low")
    pq.foreach { case (id, c) =>
      bf.get(id).foreach(exact => assert(math.abs(exact - c) < 1e-12))
    }
  }

  test("language id votes on marker words") {
    val crafted = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "el gato y los perros que viven"),
      (3L, "qwzx vbnm asdf")).toDF("doc_id", "text")
    val out = crafted.select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "en", 2L -> "es", 3L -> "und"))
  }

  test("token counts: whitespace exact and subword estimate") {
    val crafted = Seq((1L, "one two three"), (2L, "extraordinarily long")).toDF("doc_id", "text")
    val out = crafted.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.subwordEstimate(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((3L, 4L))) // one=1, two=1, three=ceil(5/4)=2
    assert(out(2L) == ((2L, 5L))) // ceil(15/4)=4 + ceil(4/4)=1
  }

  test("charEntropy: 0 for one symbol, ln(k) for uniform k symbols") {
    val crafted = Seq((1L, "aaaa"), (2L, "abab"), (3L, "abcd"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(crafted, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    def r4(x: Double) = math.round(x * 1e4) / 1e4
    assert(out(1L) == ((1L, 0.0)), "single repeated char has zero entropy")
    assert(out(2L) == ((2L, r4(math.log(2)))))
    assert(out(3L) == ((4L, r4(math.log(4)))))
  }

  test("tfidf top terms: crafted scores, minDf drop, tie-break, one tf shuffle") {
    // 4 docs, N=4. "apple" df=2 → idf=ln(2); "zebra"/"quartz" df=1 → hapax,
    // dropped at minDf=2. "the" df=4 → idf=0, score 0 (ranks below).
    val crafted = Seq(
      (1L, "the apple apple zebra"),
      (2L, "the apple"),
      (3L, "the banana banana quartz"),
      (4L, "the banana")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(crafted, "text", "doc_id",
        k = 2, minDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getDouble(3)))).toMap
    val ln2 = math.round(math.log(2) * 1e4) / 1e4
    assert(out((1L, 1L)) == (("apple", 2 * math.log(2) match {
      case s => math.round(s * 1e4) / 1e4 })))
    assert(out((1L, 2L)) == (("the", 0.0))) // idf=ln(1)=0, tie-broken by term
    assert(out((2L, 1L)) == (("apple", ln2)))
    assert(out((3L, 1L)) == (("banana", 2 * math.log(2) match {
      case s => math.round(s * 1e4) / 1e4 })))
    assert(!out.values.exists(v => v._1 == "zebra" || v._1 == "quartz"),
      "hapax terms must be dropped by minDf")
    // the tf frame must feed both the df aggregation and the score join
    // from ONE computation (persisted) — the token explode appears once
    val plan = TextAnalysis.tfidfTopTerms(crafted, "text", "doc_id")
      .queryExecution.executedPlan.toString
    val cacheReads = "InMemoryTableScan".r.findAllIn(plan).length
    assert(cacheReads >= 2,
      s"df and the score join must both read the persisted tf frame " +
      s"(found $cacheReads InMemoryTableScans):\n$plan")
  }

  test("fingerprints are stable and content-sensitive") {
    // doc 3 shares no shingle with doc 1 — a one-token tail change is not
    // guaranteed to move a window minimum (winnowing samples ~1/w grams)
    val crafted = Seq((1L, "a b c d e f g h i j"), (2L, "a b c d e f g h i j"),
                      (3L, "entirely different words appear in this other document")
                     ).toDF("doc_id", "text")
    val fps = crafted.select(col("doc_id"),
      TextAnalysis.fingerprints(col("text")).as("fp")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("custom expressions match their built-in/HOF formulations") {
    // WordShingles ≡ array_distinct(transform(sequence, slice+concat_ws))
    val d = docs.limit(50)
    val hof = {
      val toks = filter(split(col("text"), " "), t => t =!= "")
      when(size(toks) >= 3,
        array_distinct(transform(sequence(lit(0), size(toks) - 3),
          i => concat_ws(" ", slice(toks, i + 1, lit(3))))))
        .otherwise(array(concat_ws(" ", toks)))
    }
    val diff = d.select(col("doc_id"),
        graft.functions.VectorFunctions.word_shingles(col("text"), 3).as("a"),
        hof.as("b"))
      .where(not(col("a") === col("b"))).count()
    assert(diff == 0)
    // CosineSimilarity ≡ aggregate/zip_with fold, bit-identical
    val e = emb.limit(50)
    val ad = col("embedding").cast("array<double>")
    val hofCos = aggregate(zip_with(ad, ad, (x, y) => x * y), lit(0.0), _ + _) /
      (sqrt(aggregate(transform(ad, x => x * x), lit(0.0), _ + _)) *
       sqrt(aggregate(transform(ad, x => x * x), lit(0.0), _ + _)))
    val cosDiff = e.select(
        graft.functions.VectorFunctions.cosine_sim(ad, ad).as("a"),
        hofCos.as("b"))
      .where(col("a") =!= col("b")).count()
    assert(cosDiff == 0)
    // OrderedPairs emits exactly n-choose-2 ordered pairs
    val pairs = Seq(Tuple1(Seq(3L, 1L, 2L))).toDF("ids")
      .select(graft.functions.VectorFunctions.ordered_pairs(array_sort(col("ids"))))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("char_ngrams ≡ transform(sequence, substr) HOF, incl. multibyte text") {
    val hof = when(length(col("text")) < 3, array(col("text")))
      .otherwise(transform(sequence(lit(1), length(col("text")) - 2),
        i => col("text").substr(i, lit(3))))
    val d = docs.limit(100).select(col("doc_id"), col("text"))
      .unionByName(Seq((9000001L, "的是了"), (9000002L, "ab"),
        (9000003L, "日本語のテキスト abc")).toDF("doc_id", "text"))
    val diff = d.select(
        graft.functions.VectorFunctions.char_ngrams(col("text"), 3).as("a"),
        hof.as("b"))
      .where(not(col("a") === col("b"))).count()
    assert(diff == 0)
  }

  test("simhash60 matches the portable md5-derived token hash") {
    // single-token text: every counter is +1/-1 by bit of h60(token), so the
    // signature IS the hash — and DuckDB computes the same value as
    // CAST('0x' || substr(md5('hello'),1,15) AS BIGINT) = 419982666956583591
    val out = Seq(Tuple1("hello")).toDF("text")
      .select(graft.functions.VectorFunctions.simhash60(col("text")).as("sig"))
      .head.getLong(0)
    assert(out == 419982666956583591L)
    // order-insensitive under token permutation (bag-of-words votes)
    val a = Seq(Tuple1("x y z w v u t s")).toDF("text")
      .select(Dedup.simhash(col("text")).as("s")).head.getLong(0)
    val b = Seq(Tuple1("s t u v w x y z")).toDF("text")
      .select(Dedup.simhash(col("text")).as("s")).head.getLong(0)
    assert(a == b)
    // empty text → empty signature
    val e = Seq(Tuple1("")).toDF("text")
      .select(Dedup.simhash(col("text")).as("s")).head.getLong(0)
    assert(e == 0L)
  }

  test("winnow_fingerprint: whole-text gram under k tokens, h60 value") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val dig = md.digest(s.getBytes("UTF-8"))
      var v = 0L
      (0 until 8).foreach(i => v = (v << 8) | (dig(i) & 0xffL))
      v >>> 4
    }
    // 3 tokens < k=5 → single gram = whole text; n=1 ≤ w → [h60(text)]
    val fp = Seq(Tuple1("a b c")).toDF("text")
      .select(TextAnalysis.fingerprints(col("text")).as("fp"))
      .head.getSeq[Long](0)
    assert(fp == Seq(h60("a b c")))
    // 6 tokens, k=5 → grams "a b c d e","b c d e f"; n=2 ≤ w=4 → [min]
    val fp2 = Seq(Tuple1("a b c d e f")).toDF("text")
      .select(TextAnalysis.fingerprints(col("text")).as("fp"))
      .head.getSeq[Long](0)
    assert(fp2 == Seq(math.min(h60("a b c d e"), h60("b c d e f"))))
  }

  test("splitByHash is deterministic, exhaustive, and near the fractions") {
    import graft.ext.Pipeline
    val split = Pipeline.splitByHash(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    assert(total == docs.count()) // every row gets exactly one label
    assert(counts("train").toDouble / total > 0.6) // near 0.8 at small n
    // deterministic: same assignment on recompute
    val again = Pipeline.splitByHash(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.select("doc_id", "split").except(
      again.select("doc_id", "split")).isEmpty)
    // salting moves rows between splits
    val salted = Pipeline.splitByHash(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = ":v2")
    assert(split.select("doc_id", "split").except(
      salted.select("doc_id", "split")).count() > 0)
  }

  test("sampleByWeight: endpoints exact, rate near weight, sweeps nest") {
    val df = (1L to 2000L).map(i => (i, (i % 10) / 10.0)).toDF("doc_id", "w")
    def kept(w: org.apache.spark.sql.Column): Set[Long] =
      Pipeline.sampleByWeight(df, w, "doc_id")
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(kept(lit(1.0)).size == 2000, "weight 1 keeps everything")
    assert(kept(lit(0.0)).isEmpty, "weight 0 keeps nothing")
    assert(kept(lit(1.5)).size == 2000 && kept(lit(-3.0)).isEmpty, "clamped")
    val k30 = kept(lit(0.3)); val k60 = kept(lit(0.6))
    assert(k30.subsetOf(k60), "monotone: raising the weight only adds rows")
    assert(math.abs(k30.size - 600) < 60 && math.abs(k60.size - 1200) < 90,
      s"rates near the weights, got ${k30.size}, ${k60.size}")
    // per-row weights: a row's survival depends on its own weight only
    val byOwn = Pipeline.sampleByWeight(df, col("w"), "doc_id")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(byOwn.forall(i => (i % 10) != 0), "w=0 rows can never survive")
    assert((1L to 2000L).filter(_ % 10 == 9).count(byOwn) > 150,
      "w=0.9 rows mostly survive")
  }

  test("capPerKey keeps the first n per key in order") {
    import graft.ext.Pipeline
    val crafted = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"))
      .toDF("id", "k")
    val capped = Pipeline.capPerKey(crafted, Seq("k"), 2, Seq(col("id")))
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(capped == Set(("a", 1L), ("a", 2L), ("b", 4L)))
  }

  test("normalize + redactPii: whitespace collapse, email and number masks") {
    import graft.ext.Pipeline
    val out = Seq(Tuple1("  Hello\t\tWORLD  mail me at Bob.Smith+x@example.com or 12345678  "))
      .toDF("text")
      .select(Pipeline.redactPii(Pipeline.normalize(col("text"))).as("n"))
      .head.getString(0)
    assert(out == "hello world mail me at <EMAIL> or <NUM>")
  }

  test("bpe pre-tokenizer counts letter/digit/punct runs with leading space") {
    val out = Seq(Tuple1("Hello world, 2024 here!")).toDF("text")
      .select(TextAnalysis.bpeTokenCount(col("text")).as("n"))
      .head.getLong(0)
    // "Hello" " world" "," " 2024" " here" "!" → 6
    assert(out == 6L)
  }

  test("contamination flags eval overlap and ignores clean docs") {
    import graft.ext.Pipeline
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),   // contains eval
      (2L, "totally unrelated words in this training document example here"),
      (3L, "prefix words then alpha beta gamma delta epsilon tail tokens")
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val out = Pipeline.contamination(corpus, eval, "text", "doc_id", k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.contains(1L) && out.contains(3L) && !out.contains(2L))
  }

  test("SQL registry exposes the native expressions") {
    graft.functions.VectorFunctions.register(spark)
    assert(spark.sql("SELECT simhash60('hello') AS h").head.getLong(0)
      == 419982666956583591L)
    assert(spark.sql("SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .head.getDouble(0) == 1.0)
    assert(spark.sql("SELECT char_ngrams('abcd', 3) AS g")
      .head.getSeq[String](0) == Seq("abc", "bcd"))
    assert(spark.sql("SELECT word_shingles('a b c d', 3) AS s")
      .head.getSeq[String](0) == Seq("a b c", "b c d"))
  }

  test("as-of join: latest prior match, tie matches, no-match is null") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 101L),
      (2L, ts("2024-01-01 09:00:00"), 200L)).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 900L), // tie with lid=100 → matches
      (1L, ts("2024-01-01 11:00:00"), 901L)).toDF("k", "ts", "rid")
    val out = graft.ext.AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts",
        Map("rid" -> "rid"))
      .collect().map(r => r.getAs[Long]("lid") ->
        Option(r.getAs[java.lang.Long]("rid"))).toMap
    assert(out == Map(100L -> Some(900L), // equal ts matches
                      101L -> Some(901L), // latest prior wins
                      200L -> None))      // no right row for key 2
  }

  test("fn-pair serde round-trips (the :serde-from / EDN-serde analog)") {
    import graft.serde.Serdes
    // custom wire codec: big-endian long bytes
    val codec = Serdes.fromFn[Long](
      deserialize = bs => java.nio.ByteBuffer.wrap(bs).getLong,
      serialize = v => java.nio.ByteBuffer.allocate(8).putLong(v).array())
    val df = Seq(1L, -42L, Long.MaxValue).toDF("v")
    val round = df.select(codec.decode(codec.encode(col("v"))).as("v"))
    assert(round.collect().map(_.getLong(0)).toSet == Set(1L, -42L, Long.MaxValue))
    // JSON serde round-trip (rich-data analog)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))
    val js = Serdes.json(schema)
    val jdf = Seq(7L).toDF("k").select(struct(col("k")).as("s"))
    val back = jdf.select(js.decode(js.encode(col("s"))).getField("k").as("k"))
    assert(back.head.getLong(0) == 7L)
  }

  test("salted aggregation equals plain aggregation") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val salted = graft.ext.Skew.saltedSum(
      li.select(col("l_returnflag"),
        round(col("l_quantity") * 100).cast("long").as("qc")),
      keys = Seq("l_returnflag"), valueCol = "qc")
    val plain = li.groupBy("l_returnflag")
      .agg(sum(round(col("l_quantity") * 100).cast("long")).as("sum_qc"))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("multimodal pipeline: decode metadata, resize bound, frame count") {
    val media = Multimodal.asMedia(docs.limit(20))
    val decoded = Multimodal.decode(media)
    val resized = Multimodal.resize(decoded, 64)
    val metas = resized.select("meta.width", "meta.height", "meta.n_bytes").collect()
    assert(metas.forall(r => r.getInt(0) <= 64 && r.getInt(1) <= 64))
    assert(metas.forall(_.getLong(2) > 0))
    val frames = Multimodal.sampleFrames(media)
    assert(frames.count() >= 20) // at least one frame per media
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.forall(_.getSeq[Float](1).length == 16))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property laws for the round-6 operators, each checked against an
  * independent in-memory reference implementation over randomized
  * inputs (the PropertySpec house pattern).
  */
class Round6PropertySpec extends SparkSpecBase {

  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(5)
    .withWorkers(1)

  private def holds(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  // ---- bandedLevenshtein ≡ textbook Levenshtein within budget ----

  private def refLev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val strGen = Gen.choose(0, 14).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))

  test("banded_levenshtein: exact within budget, clamped sentinel " +
    "beyond, for random strings and budgets") {
    import graft.functions.VectorFunctions.banded_levenshtein
    holds(Prop.forAll(strGen, strGen,
        Gen.oneOf(0, 1, 2, 5, 100, Int.MaxValue)) { (a, b, k) =>
      val got = Seq((a, b)).toDF("a", "b")
        .select(banded_levenshtein(col("a"), col("b"), lit(k)).as("d"))
        .as[Int].head()
      val exact = refLev(a, b)
      val md = math.min(k, math.max(a.length, b.length))
      if (exact <= md) got == exact else got == md + 1
    })
  }

  // ---- bucketPairs cap laws ----

  test("bucketPairs: capped pairs ⊆ full pairs; components preserved " +
    "for random bucket layouts") {
    holds(Prop.forAll(
        Gen.listOfN(40, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 60L)))) {
      rows0 =>
        val rows = rows0.distinct
        val df = rows.toDF("band_key", "id")
        val full = graft.ext.Dedup.bucketPairs(df, Seq("band_key"),
          cap = Int.MaxValue).as[(Long, Long)].collect().toSet
        val capped = graft.ext.Dedup.bucketPairs(df, Seq("band_key"),
          cap = 5).as[(Long, Long)].collect().toSet
        // star pairs are a subset of the full pair set
        val subset = capped.subsetOf(full)
        // connected components agree: union-find over both edge sets
        def comps(edges: Set[(Long, Long)]): Map[Long, Long] = {
          val parent = scala.collection.mutable.Map[Long, Long]()
          def find(x: Long): Long = {
            val p = parent.getOrElse(x, x)
            if (p == x) x else { val r = find(p); parent(x) = r; r }
          }
          edges.foreach { case (a, b) =>
            val (ra, rb) = (find(a), find(b))
            if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
          }
          val ids = edges.flatMap(e => Seq(e._1, e._2))
          ids.map(i => i -> find(i)).toMap
        }
        subset && comps(full) == comps(capped)
    })
  }

  // ---- unigram encode laws ----

  test("unigram_encode: concatenation identity and vocab-membership " +
    "for random words and vocabularies") {
    import graft.ext.TextAnalysis
    val wordGen = Gen.choose(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('x', 'y', 'z')).map(_.mkString))
    val vocabGen = Gen.listOfN(6,
      Gen.zip(Gen.choose(2, 3).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('x', 'y', 'z')).map(_.mkString)),
        Gen.choose(-5.0, -0.5)))
      .map(ps => (Seq("x" -> -4.0, "y" -> -4.0, "z" -> -4.0) ++
        ps.distinctBy(_._1).filterNot(p =>
          Set("x", "y", "z")(p._1))).toSeq)
    holds(Prop.forAll(wordGen, vocabGen) { (w, v) =>
      val pieces = Seq(w).toDF("t")
        .select(TextAnalysis.unigramEncode(col("t"), v).as("p"))
        .as[Seq[String]].head()
      val vset = v.map(_._1).toSet
      pieces.mkString == w && pieces.forall(p =>
        vset(p) || p.codePointCount(0, p.length) == 1)
    })
  }

  // ---- lengthBucketBatches laws ----

  test("lengthBucketBatches: every doc appears once; bucket matches its " +
    "token count; batch positions are dense per batch") {
    holds(Prop.forAll(Gen.listOfN(30, Gen.choose(1, 40))) { lens0 =>
      val lens = lens0.zipWithIndex
      val df = lens.map { case (n, i) =>
        (i.toLong, Seq.fill(n)("w").mkString(" ")) }.toDF("doc_id", "text")
      val out = graft.ext.Pipeline.lengthBucketBatches(df, "text",
          "doc_id", boundaries = Seq(10L, 20L), batchSize = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getLong(3), r.getLong(4)))
      graft.ext.OpCaches.releaseAll()
      val once = out.map(_._1).sorted.toSeq ==
        lens.map(_._2.toLong).sorted.toSeq
      val bucketsOk = out.forall { case (id, n, b, _, _) =>
        val expect = if (n <= 10) 0 else if (n <= 20) 1 else 2
        n == lens(id.toInt)._1.toLong && b == expect
      }
      val dense = out.groupBy(r => (r._3, r._4)).forall { case (_, g) =>
        g.map(_._5).sorted.toSeq == (0L until g.size.toLong)
      }
      once && bucketsOk && dense
    })
  }
}

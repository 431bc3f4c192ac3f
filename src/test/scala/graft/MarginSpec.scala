package graft

import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Margin-based pair mining (Artetxe & Schwenk 2019): hub demotion — the
  * property raw cosine lacks — plus exact equivalence against a plain
  * double-loop reference implementation on randomized corpora.
  */
class MarginSpec extends SparkSpecBase {
  import spark.implicits._

  private def df(rows: Seq[(Long, Array[Float])]) =
    rows.toDF("vec_id", "embedding")

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Plain-loop margin reference: top-kDenom by (cos desc, id asc) per
    * side, avg, ratio, then top-pairsPerQuery by (margin desc, id asc).
    */
  private def reference(left: Seq[(Long, Array[Float])],
                        right: Seq[(Long, Array[Float])],
                        kDenom: Int, m: Int): Seq[(Long, Int, Long, Double)] = {
    val sc = for ((qid, qv) <- left; (pid, rv) <- right)
      yield (qid, pid, cos(qv, rv))
    def topAvg(xs: Seq[(Long, Double)]): Double = {
      val top = xs.sortBy { case (id, c) => (-c, id) }.take(kDenom).map(_._2)
      top.sum / top.size
    }
    val fwd = sc.groupBy(_._1).map { case (q, xs) =>
      q -> topAvg(xs.map(x => (x._2, x._3))) }
    val bwd = sc.groupBy(_._2).map { case (p, xs) =>
      p -> topAvg(xs.map(x => (x._1, x._3))) }
    sc.map { case (q, p, c) => (q, p, c / ((fwd(q) + bwd(p)) / 2)) }
      .groupBy(_._1).toSeq.flatMap { case (q, xs) =>
        xs.sortBy { case (_, p, mg) => (-mg, p) }.take(m).zipWithIndex
          .map { case ((_, p, mg), i) => (q, i + 1, p, mg) }
      }.sortBy(t => (t._1, t._2))
  }

  test("hub demotion: the hub wins raw cosine but margin mines the true mate") {
    // q1=e1, q2=e2; hub at 45 deg to BOTH queries; per-query mates at
    // 46 deg (raw-cosine losers); two far fillers. kDenom=2.
    val s = math.sin(math.toRadians(46)).toFloat
    val c = math.cos(math.toRadians(46)).toFloat
    val left = Seq(0L -> Array(1f, 0f, 0f), 2L -> Array(0f, 1f, 0f))
    val right = Seq(
      1L -> Array(0.7071068f, 0.7071068f, 0f), // hub
      3L -> Array(c, 0f, s),                   // mate of q0
      5L -> Array(0f, c, s),                   // mate of q2
      7L -> Array(-1f, 0f, 0f), 9L -> Array(0f, -1f, 0f))
    val raw = Similarity.bruteForceTopK(df(right), df(left), k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(raw == Map(0L -> 1L, 2L -> 1L)) // raw cosine: hub wins both
    val margin = Similarity.marginPairs(df(left), df(right), kDenom = 2)
      .collect().map(r => r.getAs[Long]("query_id") ->
        r.getAs[Long]("pair_id")).toMap
    assert(margin == Map(0L -> 3L, 2L -> 5L)) // margin: true mates win
  }

  test("marginPairs ≡ plain-loop reference on randomized disjoint corpora") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val left = (0L until 6L).map(i =>
        i -> Array.fill(8)(rnd.nextFloat() - 0.5f))
      val right = (100L until 120L).map(i =>
        i -> Array.fill(8)(rnd.nextFloat() - 0.5f))
      val got = Similarity.marginPairs(df(left), df(right),
          kDenom = 3, pairsPerQuery = 2)
        .select($"query_id", $"rank", $"pair_id",
          round($"margin", 9).as("margin"))
        .orderBy($"query_id", $"rank")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSeq
      val want = reference(left, right, kDenom = 3, m = 2)
        .map { case (q, rk, p, mg) =>
          (q, rk, p, BigDecimal(mg).setScale(9,
            BigDecimal.RoundingMode.HALF_UP).toDouble) }
      assert(got == want)
    }
  }

  test("kDenom past the candidate count averages what exists; " +
    "pairsPerQuery caps output") {
    val left = Seq(0L -> Array(1f, 0f))
    val right = Seq(1L -> Array(1f, 1f), 3L -> Array(0f, 1f))
    val out = Similarity.marginPairs(df(left), df(right),
        kDenom = 10, pairsPerQuery = 1).collect()
    assert(out.length == 1)
    // fwd avg over both candidates; bwd avg over the single query
    val c1 = cos(Array(1f, 0f), Array(1f, 1f))
    val fwd = (c1 + 0.0) / 2
    assert(math.abs(out(0).getAs[Double]("margin") -
      c1 / ((fwd + c1) / 2)) < 1e-12)
  }

  test("marginScore composes with an externally-built candidate frame") {
    val rnd = new scala.util.Random(11)
    val left = (0L until 4L).map(i => i -> Array.fill(8)(rnd.nextFloat() - 0.5f))
    val right = (50L until 62L).map(i => i -> Array.fill(8)(rnd.nextFloat() - 0.5f))
    val cand = df(right).select($"vec_id".as("pair_id"), $"embedding".as("rv"))
      .crossJoin(broadcast(df(left).select($"vec_id".as("query_id"),
        $"embedding".as("qv"))))
      .select($"query_id", $"pair_id",
        Similarity.cosine($"qv", $"rv").as("cos"))
    val viaScore = Similarity.marginScore(cand, kDenom = 3, pairsPerQuery = 2)
      .orderBy($"query_id", $"rank").collect().toSeq
    val viaPairs = Similarity.marginPairs(df(left), df(right),
        kDenom = 3, pairsPerQuery = 2)
      .orderBy($"query_id", $"rank").collect().toSeq
    assert(viaScore == viaPairs)
  }
}

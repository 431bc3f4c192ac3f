package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Funnel, Pipeline}

/** Round 9: spec pins for the four ADVICE-r8 fixes — containment prefix
  * tightness at exactly-at-threshold pairs, stationary-distribution
  * zero-mass guard, NULL-source interleaving, and empty-input
  * constraint reports.
  */
class Round9Spec extends SparkSpecBase {
  import spark.implicits._

  test("containmentPairs: exactly-at-threshold pair found no matter " +
    "WHICH of A's shingles the container misses (integer prefix bound)") {
    // A has exactly 5 distinct 3-word shingles (7 distinct words);
    // B_i drops ONLY shingle i, so containment(A in B_i) = 4/5 = the
    // 0.8 threshold EXACTLY. One of the five drops A's hash-smallest
    // shingle — the variant the old floor(n*(1-t))+1 float prefix
    // (length 1 instead of the tight 2 at n=5, t=0.8) silently missed.
    val w = (1 to 7).map(i => s"w$i")
    val a = w.mkString(" ")
    // drop s_i (words i, i+1, i+2): words 1..(i+1) ++ Z_i ++ words (i+1)..7
    val variants = (1 to 5).map { i =>
      (10L + i, (w.take(i + 1) ++ Seq(s"zz$i") ++ w.drop(i)).mkString(" "))
    }
    val docs = (Seq((1L, a)) ++ variants).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "text", "doc_id",
        k = 3, maxDf = Long.MaxValue, threshold = 0.8)
      .where(col("id_a") === 1L)
      .collect()
    val found = pairs.map(r => r.getAs[Long]("id_b")).toSet
    assert(found == (11L to 15L).toSet,
      s"expected all 5 at-threshold containers, got $found")
    assert(pairs.forall(_.getAs[Long]("containment_ppm") == 800000L))
    assert(pairs.forall(_.getAs[Long]("inter") == 4L))
  }

  test("stationaryDistribution: all-mass-absorbed round redistributes " +
    "uniformly instead of nulling pi (zero-mass guard)") {
    // every user transitions A -> B once; B is absorbing. Round 1 puts
    // all mass on B, round 2 forwards nothing (total mass 0 -> guard
    // fires, uniform restart), round 3 re-runs round 1. Without the
    // guard the round-2 floor division by 0 nulls pi for every state.
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:01")
    val ev = (1 to 4).flatMap { u =>
      Seq((u.toLong, "A", t0, 1L), (u.toLong, "B", t1, 2L))
    }.toDF("user_id", "event_type", "ts", "event_id")
    val pi = Funnel.stationaryDistribution(ev, "user_id", "event_type",
        "ts", "event_id", iters = 3)
      .collect().map(r => r.getString(0) ->
        Option(r.getAs[java.lang.Long]("pi_ppm"))).toMap
    assert(pi.size == 2)
    assert(pi.forall(_._2.isDefined), s"null pi_ppm leaked: $pi")
    assert(pi("A").get == 0L && pi("B").get == 2000000L, s"$pi")
  }

  test("interleaveBySources: NULL sources get their own rotation slot " +
    "(no collision with bucket 0)") {
    val rows = (0 until 4).flatMap { i =>
      Seq((s"a$i", "src_a"), (s"n$i", null: String), (s"b$i", "src_b"))
    }
    val out = Pipeline.interleaveBySources(
        rows.toDF("doc_id", "src"), "src", "doc_id")
      .select(col("doc_id"), col("src"), col("interleave_pos"))
      .collect()
    val pos = out.map(_.getAs[Long]("interleave_pos")).sorted
    // equal-sized sources -> dense permutation 0..11, no collisions
    assert(pos.toSeq == (0L until 12L),
      s"positions not a dense rotation: ${pos.toSeq}")
    // each source occupies ONE residue class mod nSources (3)
    val bySrc = out.groupBy(r => Option(r.getString(1)))
      .map { case (s, rs) =>
        s -> rs.map(_.getAs[Long]("interleave_pos") % 3).toSet }
    assert(bySrc.values.forall(_.size == 1), s"$bySrc")
    assert(bySrc.values.flatten.toSet == Set(0L, 1L, 2L), s"$bySrc")
  }

  test("checkConstraints: empty input reports 0 violations / pass=true " +
    "(not NULL)") {
    val empty = Seq.empty[(Long, String)].toDF("id", "name")
    val rep = Pipeline.checkConstraints(empty, Seq(
        "id_nonneg" -> (col("id") >= 0),
        "name_nonnull" -> col("name").isNotNull))
      .collect()
    assert(rep.length == 2)
    rep.foreach { r =>
      assert(r.getAs[Long]("n_rows") == 0L)
      assert(!r.isNullAt(r.fieldIndex("n_violations")), s"NULL count: $r")
      assert(r.getAs[Long]("n_violations") == 0L)
      assert(r.getAs[Boolean]("pass"))
    }
  }
}

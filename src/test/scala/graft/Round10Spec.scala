package graft

import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Round 10: spec pins for the ADVICE-r9 fixes — ngramJaccardPairs'
  * integer prefix bound at exactly-at-threshold pairs (the containment
  * fix from r9, now applied to the symmetric Jaccard face too).
  */
class Round10Spec extends SparkSpecBase {
  import spark.implicits._

  test("ngramJaccardPairs: exactly-at-threshold pair found even when " +
    "its only shared shingle sits in the LAST prefix slot (integer " +
    "prefix bound)") {
    // A = 12 distinct words -> 10 shingles; B = A's first 10 words ->
    // 8 shingles, ALL shared, so J = 8/10 = the 0.8 threshold EXACTLY.
    // We need the two shingles B lacks (A's positional s9, s10) to be
    // A's two HASH-smallest: then the old float prefix
    // floor(10·(1−0.8))+1 = 2 (IEEE 1−0.8 = 0.19999…) posts only A's
    // two unique shingles and silently misses the pair, while the tight
    // integer bound n − ⌈t·n⌉ + 1 = 3 posts the smallest SHARED shingle
    // too. The fixture is found by a deterministic search over word
    // alphabets (xxhash64 is fixed, so the winning seed never moves);
    // the structural property is re-asserted, not assumed.
    val seeds = 0 until 400
    val shingleRows = seeds.flatMap { s =>
      val w = (1 to 12).map(i => s"s${s}w$i")
      (0 until 10).map(i => (s, i, s"${w(i)} ${w(i + 1)} ${w(i + 2)}"))
    }
    val hashed = shingleRows.toDF("seed", "pos", "sh")
      .select(col("seed"), col("pos"), xxhash64(col("sh")).as("h"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (s, rows) =>
        s -> rows.sortBy(_.getInt(1)).map(_.getLong(2)) }
    val seed = seeds.find { s =>
      val hs = hashed(s)
      hs.distinct.length == 10 &&
        hs.sorted.take(2).toSet == Set(hs(8), hs(9))
    }.getOrElse(fail("no fixture seed found in 400 — hash fn changed?"))
    // structural self-check: B misses exactly A's two hash-smallest
    val hs = hashed(seed)
    assert(hs.sorted.take(2).toSet == Set(hs(8), hs(9)))

    val w = (1 to 12).map(i => s"s${seed}w$i")
    val docs = Seq(
      (1L, w.mkString(" ")),          // A: shingles s0..s9
      (2L, w.take(10).mkString(" "))  // B: shingles s0..s7 (all shared)
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        k = 3, maxDf = Long.MaxValue, threshold = 0.8)
      .collect()
    assert(pairs.length == 1,
      s"expected the at-threshold pair, got ${pairs.toSeq}")
    assert(pairs(0).getAs[Double]("jaccard") == 0.8)
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}

/** Explicit runtime-filter join: prune the fact side with a Bloom filter
  * of the (small, usually pre-filtered) dim side's keys BEFORE the join's
  * shuffle. The join result is identical — Bloom filters have no false
  * negatives, and the join itself drops the false positives — but every
  * fact row whose key the dim can't match is dropped at the SCAN, not
  * after riding a 100 TB shuffle to a reducer that discards it. At a 1%
  * dim match rate that is a ~99% cut in fact-side shuffle volume, the
  * difference between a join that fits the fabric and one that doesn't.
  *
  * This is the semi-join reduction classic (Bernstein & Chiu 1981) in its
  * Bloom form — what Spark's own `runtime.bloomFilter` optimization
  * (OFF by default, creation-side-threshold-gated) does opportunistically,
  * here as a deliberate operator the pipeline author controls.
  */
object RuntimeFilter {

  /** Bloom membership probe column for `key`, type-driven: integral keys
    * probe the long-hash lanes directly; strings probe the UTF-8 byte
    * form. Codegen'd expressions (graftfn.BloomFunctions) — the probe
    * stays inside the scan's whole-stage codegen span; a UDF here would
    * box every key. Other key types (decimal, struct) are rejected rather
    * than silently coerced — a cast that nulls is a correctness bug, not
    * a fallback.
    */
  private def probeCol(df: DataFrame, key: String,
                       bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    df.schema(key).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        org.apache.spark.sql.graftfn.BloomFunctions
          .bloom_might_contain_long(col(key).cast("long"), bloom)
      case StringType =>
        org.apache.spark.sql.graftfn.BloomFunctions
          .bloom_might_contain_string(col(key), bloom)
      case other =>
        throw new IllegalArgumentException(
          s"bloomPrunedJoin supports integral and string keys; '$key' is $other")
    }

  private def buildBloom(dim: DataFrame, dimKey: String, fpp: Double,
                         expectedKeys: Long) = {
    val keyed = dim.select(col(dimKey).as("__k")).where(col("__k").isNotNull)
    val sized =
      if (expectedKeys > 0) expectedKeys
      else math.max(1L, keyed.distinct().count())
    (keyed.stat.bloomFilter(col("__k"), sized, fpp), sized)
  }

  /** `fact ⋈ dim` with the fact side Bloom-pruned first. Only join types
    * where dropping never-matching fact rows is semantics-preserving are
    * accepted: `inner`, `left_semi`, and `right_outer` (fact-side
    * non-matches leave the result in all three; an outer/anti fact side
    * must keep them).
    *
    * Cost contract: the dim side must be collect-a-Bloom small (it is the
    * broadcast side of the eventual join anyway); building the filter
    * scans the dim once, and when `expectedKeys` is not supplied a
    * key-count pass sizes it first — pass the expectation when you know
    * it (table stats, a previous run) to keep the dim single-scan.
    *
    * `fpp` trades filter size against wasted shuffle: at 0.01, ~1% of
    * non-matching fact rows still ride the shuffle and die in the join.
    */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame,
                      factKey: String, dimKey: String,
                      joinType: String = "inner",
                      fpp: Double = 0.01,
                      expectedKeys: Long = -1L): DataFrame = {
    val allowed = Set("inner", "left_semi", "right_outer")
    require(allowed(joinType.toLowerCase.replace("leftsemi", "left_semi")),
      s"bloomPrunedJoin preserves semantics only for ${allowed.mkString("/")}" +
        s" joins; got '$joinType'")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1); got $fpp")
    val (bloom, _) = buildBloom(dim, dimKey, fpp, expectedKeys)
    val pruned = fact.where(col(factKey).isNotNull &&
      probeCol(fact, factKey, bloom))
    pruned.join(dim, pruned(factKey) === dim(dimKey), joinType)
  }

  /** Measured prune factor for a would-be [[bloomPrunedJoin]]: (fact rows,
    * fact rows surviving the Bloom, dim keys) — the planning probe that
    * tells you whether the runtime filter pays for itself before you wire
    * it into a 100 TB pipeline (a kept/total ratio near 1.0 means the
    * filter is pure overhead).
    */
  def bloomPruneStats(fact: DataFrame, dim: DataFrame,
                      factKey: String, dimKey: String,
                      fpp: Double = 0.01): (Long, Long, Long) = {
    val (bloom, nKeys) = buildBloom(dim, dimKey, fpp, -1L)
    val total = fact.count()
    val kept = fact.where(col(factKey).isNotNull &&
      probeCol(fact, factKey, bloom)).count()
    (total, kept, nKeys)
  }
}

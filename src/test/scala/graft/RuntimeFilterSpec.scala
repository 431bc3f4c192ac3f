package graft

import org.apache.spark.sql.functions._
import graft.ext.RuntimeFilter

/** Bloom-pruned join: result ≡ plain join for every accepted join type,
  * the prune measurably fires on a selective dim, string keys probe the
  * string lanes, and unsupported types/joins are rejected loudly.
  */
class RuntimeFilterSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
  private lazy val sup = spark.read.parquet(s"$sfDir/supplier.parquet")
    .where($"s_nationkey" === 3)

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("inner / left_semi / right_outer results ≡ the plain join") {
    Seq("inner", "left_semi", "right_outer").foreach { jt =>
      val got = RuntimeFilter.bloomPrunedJoin(li, sup,
        "l_suppkey", "s_suppkey", joinType = jt)
      val want = li.join(sup, li("l_suppkey") === sup("s_suppkey"), jt)
      assert(canon(got) == canon(want), s"joinType=$jt")
      assert(got.count() > 0, s"joinType=$jt produced no rows")
    }
  }

  test("the prune fires: a 1-key dim keeps ~1/|suppliers| of the fact") {
    val oneSup = spark.read.parquet(s"$sfDir/supplier.parquet").limit(1)
    val (total, kept, nKeys) =
      RuntimeFilter.bloomPruneStats(li, oneSup, "l_suppkey", "s_suppkey")
    assert(nKeys == 1)
    val exact = li.join(oneSup, li("l_suppkey") === oneSup("s_suppkey"),
      "left_semi").count()
    // no false negatives; false positives bounded well below the fact size
    assert(kept >= exact)
    assert(kept < total / 2, s"kept=$kept of total=$total — prune inert")
  }

  test("string keys probe the string lanes (no silent numeric coercion)") {
    val fact = Seq(("a", 1), ("b", 2), ("c", 3), ("d", 4)).toDF("k", "v")
    val dim = Seq(("b", 10), ("d", 20)).toDF("dk", "w")
    val got = RuntimeFilter.bloomPrunedJoin(fact, dim, "k", "dk")
      .select($"k", $"v", $"w").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    assert(got == Seq(("b", 2, 10), ("d", 4, 20)))
  }

  test("the probe is codegen'd: mightContain calls appear in generated code") {
    // assert on the scan-side filter alone (the join plan is AQE-wrapped
    // and reports no codegen subtrees until executed)
    import org.apache.spark.sql.graftfn.BloomFunctions._
    val bloom = sup.stat.bloomFilter($"s_suppkey", 100, 0.01)
    val prunedScan = li.where(
      bloom_might_contain_long($"l_suppkey".cast("long"), bloom))
    val gen = org.apache.spark.sql.execution.debug
      .codegenString(prunedScan.queryExecution.executedPlan)
    assert(gen.contains("mightContainLong"),
      "long probe missing from generated code — fell out of codegen")
    // string probe over a parquet-backed column (a local relation would
    // be constant-folded away before any codegen happens)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sBloom = docs.limit(50).stat.bloomFilter($"lang", 50, 0.01)
    val sScan = docs.where(bloom_might_contain_string($"lang", sBloom))
    val sGen = org.apache.spark.sql.execution.debug
      .codegenString(sScan.queryExecution.executedPlan)
    assert(sGen.contains("mightContainBinary"),
      "string probe missing from generated code — fell out of codegen")
    // and both probes agree with membership on real data
    assert(sScan.count() > 0)
    assert(prunedScan.count() > 0)
  }

  test("semantics-breaking join types and bad inputs are rejected") {
    intercept[IllegalArgumentException](
      RuntimeFilter.bloomPrunedJoin(li, sup, "l_suppkey", "s_suppkey",
        joinType = "left_outer"))
    intercept[IllegalArgumentException](
      RuntimeFilter.bloomPrunedJoin(li, sup, "l_suppkey", "s_suppkey",
        fpp = 1.5))
    // double keys: rejected, not coerced
    val dFact = Seq((1.5, 1)).toDF("k", "v")
    intercept[IllegalArgumentException](
      RuntimeFilter.bloomPrunedJoin(dFact, sup, "k", "s_suppkey"))
  }
}

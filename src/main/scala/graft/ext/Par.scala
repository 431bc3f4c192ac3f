package graft.ext

import org.apache.spark.sql.DataFrame

/** Targeted parallelism repair for WORK-AMPLIFYING kernels (optimization
  * guide §2.5, "input skew → repartition immediately after the read").
  *
  * The bench fixtures are single-row-group parquet, so a scan plans as
  * ONE task at any core count. For most operators that is fine — the
  * r13 A/B measured a blanket repartition-after-read as a 10-40% LOSS
  * (the exchange + sort-before-repartition cost more than the scan-stage
  * compute it parallelized). But an operator that AMPLIFIES per-row work
  * after the scan — a ×B replicate explode followed by a per-row md5, an
  * image decode, a per-doc n-gram expansion — concentrates seconds of
  * CPU in that one task while 31 cores idle.
  *
  * [[fanOut]] inserts a round-robin repartition to the session's default
  * parallelism when (and only when) the input plans with fewer than half
  * that many partitions, moving only the SMALL pre-amplification rows.
  * Scale-adaptive by construction: a production input already planning
  * with ≥ cores/2 partitions passes through untouched, so no exchange is
  * paid at scale. Row-level semantics are unchanged (pure reshuffle;
  * retry-deterministic via Spark's sort-before-repartition, SPARK-23207)
  * — callers remain oracle-identical, re-verified at all three SFs.
  */
private[graft] object Par {
  /** Apply only where the per-row work DOWNSTREAM of this frame dwarfs
    * one small exchange of the frame itself; measure, don't assume.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }
}

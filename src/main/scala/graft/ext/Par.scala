package graft.ext

import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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
  *
  * r14 (ADVICE r13): the partition count is derived from the ANALYZED
  * plan, never from `df.rdd`. Under AQE, `Dataset.rdd` materializes every
  * upstream shuffle stage of an AdaptiveSparkPlanExec in a throwaway
  * QueryExecution — a fanOut probe on an exchange-bearing frame would run
  * those stages eagerly at operator-CONSTRUCTION time and the real action
  * would re-run them. The plan walk below is driver-only metadata: file
  * sizes for scans, a field read for LogicalRDD, and "leave it alone" for
  * anything that already passed a shuffle (post-exchange parallelism is
  * the planner's business — spark.sql.shuffle.partitions, or AQE's
  * runtime right-sizing, which fanOut must not fight).
  */
private[graft] object Par {

  /** Estimated partition count of `df`'s scan stage from the analyzed
    * logical plan — None when the frame is rooted in a shuffle or an
    * unrecognized source (in both cases fanOut leaves the frame alone).
    * Narrow operators are enumerated positively; every other node is
    * treated as "planner's problem" so the conservative answer is no-op.
    */
  private def plannedScanPartitions(df: DataFrame): Option[Int] = {
    val maxSplit = JavaUtils.byteStringAsBytes(
      df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
      .max(1L)
    def walk(p: LogicalPlan): Option[Int] = p match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          Some(math.max(1L,
            (fs.location.sizeInBytes + maxSplit - 1) / maxSplit)
            .min(Int.MaxValue).toInt)
        case _ => None
      }
      case r: LogicalRDD => Some(r.rdd.getNumPartitions)
      case _: LocalRelation => Some(1)
      case _: OneRowRelation => Some(1)
      case u: Union => // narrow concat: partitions add up
        val kids = u.children.map(walk)
        if (kids.forall(_.isDefined)) Some(kids.flatten.sum) else None
      // narrow, partition-preserving single-child nodes
      case n @ (_: Project | _: Filter | _: Generate | _: SubqueryAlias |
                _: Expand | _: TypedFilter | _: SerializeFromObject |
                _: DeserializeToObject | _: MapElements |
                _: MapPartitions | _: LocalLimit) =>
        walk(n.children.head)
      case _ => None // joins, aggregates, sorts, windows, limits, v2/streams
    }
    walk(df.queryExecution.analyzed)
  }

  /** Apply only where the per-row work DOWNSTREAM of this frame dwarfs
    * one small exchange of the frame itself; measure, don't assume.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    plannedScanPartitions(df) match {
      case Some(n) if n * 2 < target => df.repartition(target)
      case _ => df
    }
  }
}

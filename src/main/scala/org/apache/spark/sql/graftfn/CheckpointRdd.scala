package org.apache.spark.sql.graftfn

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle hook for `localCheckpoint(true)` results: an eager local
  * checkpoint persists its physical RDD behind a [[LogicalRDD]] leaf —
  * a block `Dataset.unpersist`/`catalog.clearCache` never reaches (both
  * walk the CacheManager, which only tracks `persist()`ed plans). The
  * iterative fitters (Bradley-Terry, PageRank) checkpoint per round as
  * their lineage barrier; without explicit release the final round's
  * block outlives the query until the ContextCleaner happens to GC it —
  * the `cache_leaked_blocks` drift VERDICT r8 #2 traced. Lives in this
  * package for `private[sql]` access to the LogicalRDD node.
  */
object CheckpointRdd {

  /** The persisted RDD behind an (eager) localCheckpoint result, if the
    * frame is one.
    */
  def of(df: DataFrame): Option[RDD[_]] = df.queryExecution.logical match {
    case lr: LogicalRDD => Some(lr.rdd)
    case _ => None
  }
}

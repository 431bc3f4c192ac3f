package graft.ext

import org.apache.spark.sql.DataFrame

/** Lifecycle registry for operator-internal persisted frames.
  *
  * Several operators persist an intermediate that the returned plan
  * references two or three times (minhash / n-gram shingle sets, tf-idf
  * term frequencies, packSequences' range-partitioned base). The operator
  * cannot unpersist it before returning — the returned plan is lazy and
  * still references the cached lineage, so an eager unpersist would defeat
  * the reuse — and silently pinning MEMORY_AND_DISK blocks for the life of
  * the session is a leak. Ownership therefore transfers to the caller:
  * every such persist self-registers here, and after the terminal action
  * on an operator's result the caller calls [[releaseAll]] (idempotent,
  * non-blocking unpersist of everything registered since the last call).
  *
  * `graft.Verify` and `graft.Bench` release between queries, and Bench
  * asserts `sparkContext.getPersistentRDDs` is empty after each release —
  * the regression guard that keeps a full gate run cache-neutral.
  */
object OpCaches {
  private val reg = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val rddReg =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]()

  /** Register an operator-internal persisted frame; returns it unchanged. */
  private[graft] def register(df: DataFrame): DataFrame = { reg.add(df); df }

  /** Register an (eager) `localCheckpoint(true)` result; returns it
    * unchanged. Checkpoint blocks live OUTSIDE the CacheManager — neither
    * `Dataset.unpersist` nor `catalog.clearCache` reaches them, and the
    * ContextCleaner only reclaims them on a lucky GC — so the iterative
    * fitters' per-round barriers must hand their raw RDDs to the registry
    * for [[releaseAll]] (the `cache_leaked_blocks` root cause, VERDICT
    * r8 #2: Bradley-Terry's final-round block outlived every bench query).
    *
    * Caveat sharpening the usual contract: a released checkpoint block is
    * NOT recomputable (LocalCheckpointRDD has no lineage), so re-running
    * a released frame throws instead of silently recomputing. Call
    * [[releaseAll]] only after the terminal action, and rebuild the query
    * for another run — exactly what Verify/Bench already do per rep.
    */
  private[graft] def registerCheckpoint(df: DataFrame): DataFrame = {
    org.apache.spark.sql.graftfn.CheckpointRdd.of(df).foreach(rddReg.add)
    df
  }

  /** Unpersist every registered frame (non-blocking) and clear the
    * registry. Safe to call at any time: frames whose results were already
    * computed into the caller's action are simply dropped from the cache.
    */
  def releaseAll(): Unit = {
    var df = reg.poll()
    while (df != null) { df.unpersist(blocking = false); df = reg.poll() }
    var r = rddReg.poll()
    while (r != null) { r.unpersist(blocking = false); r = rddReg.poll() }
  }
}

package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** One-pass frequency sketches. The motivating 100 TB problem: "what are
  * the hot keys / hot terms / hot domains" over a corpus too large to
  * groupBy — a full key aggregation shuffles every distinct key, while a
  * Misra-Gries summary ships at most `capacity` rows PER PARTITION,
  * regardless of how many distinct keys the data holds.
  */
object Sketches {

  /** Per-partition Misra-Gries summary state: the classic streaming
    * heavy-hitters algorithm (Misra & Gries 1982, the space-saving
    * family). Estimates undercount: for a partition of n rows,
    * `c_true − n/(capacity+1) ≤ est ≤ c_true`.
    */
  private[ext] def misraGries(it: Iterator[Any],
                              capacity: Int): Iterator[(Any, Long)] = {
    val m = new java.util.HashMap[Any, Long](capacity * 2)
    while (it.hasNext) {
      val key = it.next()
      if (key != null) {
        val cur = m.get(key)
        if (cur != 0L || m.containsKey(key)) m.put(key, cur + 1L)
        else if (m.size < capacity) m.put(key, 1L)
        else {
          // decrement-all: every tracked count drops by one; zeros evict.
          // O(capacity) amortized over >= capacity arrivals.
          val del = new java.util.ArrayList[Any](4)
          val e = m.entrySet().iterator()
          while (e.hasNext) {
            val kv = e.next()
            if (kv.getValue == 1L) del.add(kv.getKey)
            else kv.setValue(kv.getValue - 1L)
          }
          del.forEach(k => m.remove(k))
        }
      }
    }
    import scala.jdk.CollectionConverters._
    m.asScala.iterator.map { case (k, v) => (k, v) }.toArray.iterator
  }

  /** Approximate top-k heavy hitters over `keyCol`, ONE pass and no
    * full-key shuffle: each partition reduces to a `capacity`-entry
    * Misra-Gries summary; summaries merge by summing per key (≤
    * capacity × partitions tiny rows cross the wire); the merged
    * estimates keep the additive bound
    * `c_true − N/(capacity+1) ≤ est ≤ c_true`, so any key with frequency
    * above N/(capacity+1) is guaranteed present. With
    * `capacity ≥ distinct(key)` no partition ever decrements and the
    * estimates are EXACT — the gate-query mode.
    *
    * Returns (key, est) — top `k` by estimate desc, key asc. Null keys
    * are not tracked (no frequency semantics). Key column keeps its
    * input type.
    *
    * 100 TB shape: a narrow single-column scan; the only exchange
    * carries per-partition summaries (capacity rows each); the final
    * ranking is a TakeOrderedAndProject over ≤ capacity × partitions
    * rows. Compare `df.groupBy(key).count()`: one shuffle row per INPUT
    * distinct key — unboundedly wider.
    */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int,
                   capacity: Int = 1024): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(capacity >= k, s"capacity $capacity must be >= k $k")
    val keyField = df.schema(keyCol)
    val outSchema = StructType(Seq(keyField.copy(name = "key"),
      StructField("est", LongType, nullable = false)))
    val partials = df.select(col(keyCol).as("key"))
      .mapPartitions { rows =>
        misraGries(rows.map(_.get(0)), capacity)
          .map { case (key, c) => Row(key, c) }
      }(Encoders.row(outSchema))
    partials.groupBy(col("key"))
      .agg(sum(col("est")).as("est"))
      .orderBy(col("est").desc, col("key"))
      .limit(k)
  }
}

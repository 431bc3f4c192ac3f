package graft.state

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Scale-safe secondary sort for the batch state kernels: hash-repartition on
  * the key columns, sort each partition by (keys, order), then fold each
  * key's rows as an ordered streaming iterator. Unlike
  * `groupByKey(...).flatMapGroups` + per-key `toArray.sortBy`, a hot key's
  * whole history never materializes in one task's heap — the ordering work
  * happens in Spark's spillable external sorter, and the fold only holds its
  * own accumulator. (Round 1 carried the per-key array sort; a celebrity key
  * at 100× data would have OOMed its task.)
  */
object SecondarySort {

  /** Orderable under Spark's sort (maps are not; arrays/structs are if their
    * elements are) — used to pick deterministic tiebreak columns.
    */
  def orderable(dt: DataType): Boolean = dt match {
    case _: MapType => false
    case s: StructType => s.fields.forall(f => orderable(f.dataType))
    case a: ArrayType => orderable(a.elementType)
    case _ => true
  }

  /** Deterministic tiebreak: every non-key, non-order column with an
    * orderable type, in schema order — the batch analog of Kafka's
    * per-partition offset order (records with equal event time would
    * otherwise fold in arbitrary shuffle order).
    */
  def tiebreakCols(df: DataFrame, keyNames: Seq[String],
                   orderNames: Seq[String]): Seq[Column] =
    df.schema.fields.toSeq
      .filterNot(f => keyNames.contains(f.name) || orderNames.contains(f.name))
      .filter(f => orderable(f.dataType))
      .map(f => col(f.name))

  /** Fold each key group of `df` in (orderCols ++ tiebreak) order. `fold`
    * receives the key row and an ordered iterator over the group's rows; its
    * result iterator must be fully consumed before the next group starts
    * (both kernel call sites do, via flatten). Key columns must have
    * by-value equality (primitives/strings/timestamps — true for every DSL
    * key type).
    */
  def foldSortedGroups(df: DataFrame, keyNames: Seq[String],
                       orderCols: Seq[Column])(
      foldGroup: (Row, Iterator[Row]) => Iterator[Row])(
      implicit enc: Encoder[Row]): Dataset[Row] = {
    val keyIdx = keyNames.map(df.schema.fieldIndex).toArray
    val sorted = df.repartition(keyNames.map(col): _*)
      .sortWithinPartitions(keyNames.map(col) ++ orderCols: _*)
    sorted.mapPartitions { rows =>
      val it = rows.buffered
      new Iterator[Iterator[Row]] {
        def hasNext: Boolean = it.hasNext
        def next(): Iterator[Row] = {
          val k: Seq[Any] = keyIdx.toSeq.map(it.head.get)
          val group = new Iterator[Row] {
            def hasNext: Boolean =
              it.hasNext && keyIdx.toSeq.map(it.head.get) == k
            def next(): Row = it.next()
          }
          foldGroup(Row.fromSeq(k), group)
        }
      }.flatten
    }
  }
}

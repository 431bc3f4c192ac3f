package graft.state

import graft.compile.KFrame
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** KTable (changelog) kernels for streaming mode — SURVEY §7.5 risk #1:
  * Spark update-mode aggregates cannot feed further stateful operators, so
  * KTable semantics run as flatMapGroupsWithState kernels that emit upsert
  * rows in Append mode (chainable). Tombstones (null-valued records, SURVEY
  * §2.10) delete state and emit a null-value row downstream.
  */
object TableKernels {

  /** Latest-value-per-key over a keyed record stream — the `:table` source
    * semantics (`eval.clj:72`): each input batch updates per-key state with
    * the record of highest `orderCol` (the Kafka-offset analog); changed
    * keys re-emit their full row.
    */
  def latestPerKey(f: KFrame, orderCol: String): DataFrame = {
    val keyNames = f.keys
    val schema = f.df.schema
    val keySchema = StructType(keyNames.map(schema(_)))
    val ordIdx = schema.fieldIndex(orderCol)
    val kEnc = Encoders.row(keySchema)
    val oEnc = Encoders.row(schema)
    val toKey = (row: Row) => Row.fromSeq(keyNames.map(row.getAs[Any]))
    def ord(r: Row): Comparable[Any] =
      r.get(ordIdx).asInstanceOf[Comparable[Any]]
    // Append mode: emissions are upsert *events* on the changelog — and
    // only Append-mode FMGWS operators may chain (table → table-join → ...).
    f.df.groupByKey(toKey)(kEnc)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Row, it: Iterator[Row], state: GroupState[Row]) =>
          val best = (state.getOption.iterator ++ it)
            .reduce((a, b) => if (ord(a).compareTo(ord(b)) >= 0) a else b)
          val changed = !state.getOption.contains(best)
          state.update(best)
          if (changed) Iterator.single(best) else Iterator.empty
      }(oEnc, oEnc)
      .toDF()
  }

  /** KTable ⋈ KTable on primary key (SURVEY §2.4, the hardest mapping):
    * union the two changelogs tagged by side, hold latest-left/latest-right
    * per key in state, emit the joined row whenever either side updates.
    * Emission honors inner/left/full-outer null semantics.
    */
  def tableTableJoin(lf: KFrame, rf: KFrame, how: String): DataFrame = {
    require(lf.keys.size == rf.keys.size, "join key arity mismatch")
    val spark = lf.df.sparkSession
    val keyNames = lf.keys
    val keySchema = StructType(keyNames.map(lf.df.schema(_)))
    val lVals = lf.valueCols
    val lStruct = StructType(lVals.map(lf.df.schema(_)))
    val rKeyed0 = rf.keys.zip(keyNames).foldLeft(rf.df) {
      case (d, (rk, lk)) => if (rk == lk) d else d.withColumnRenamed(rk, lk)
    }
    // right value columns clashing with left (or keys) get a _r suffix —
    // same disambiguation as the batch join path
    val taken = (keyNames ++ lVals).toSet
    val rVals0 = rf.valueCols
    val rKeyed = rVals0.foldLeft(rKeyed0)((d, c) =>
      if (taken.contains(c)) d.withColumnRenamed(c, s"${c}_r") else d)
    val rVals = rVals0.map(c => if (taken.contains(c)) s"${c}_r" else c)
    val rStruct = StructType(rVals.map(rKeyed.schema(_)))

    val lTagged = lf.df.select(
      keyNames.map(lf.df.col) :+ lit(0).as("__side") :+
      struct(lVals.map(lf.df.col): _*).as("__l") :+
      lit(null).cast(rStruct).as("__r"): _*)
    val rTagged = rKeyed.select(
      keyNames.map(rKeyed.col) :+ lit(1).as("__side") :+
      lit(null).cast(lStruct).as("__l") :+
      struct(rVals.map(rKeyed.col): _*).as("__r"): _*)
    val unioned = lTagged.unionByName(rTagged)

    val outSchema = StructType(keySchema ++ lStruct ++ rStruct)
    val kEnc = Encoders.row(keySchema)
    val oEnc = Encoders.row(outSchema)
    // state = (latestLeft, latestRight) as an explicit struct row: UnsafeRow
    // state (smaller + faster than an opaque kryo blob) whose schema is
    // visible in the checkpoint — long-lived checkpoints survive code
    // changes that a serialized-class format would break on
    val stateSchema = StructType(Seq(
      org.apache.spark.sql.types.StructField("l", lStruct),
      org.apache.spark.sql.types.StructField("r", rStruct)))
    val sEnc = Encoders.row(stateSchema)
    val nKeys = keyNames.size
    val toKey = (row: Row) => Row.fromSeq((0 until nKeys).map(row.get))

    val emit = (k: Row, l: Option[Row], r: Option[Row]) => {
      val lSeq = l.map(_.toSeq).getOrElse(Seq.fill(lStruct.size)(null))
      val rSeq = r.map(_.toSeq).getOrElse(Seq.fill(rStruct.size)(null))
      Row.fromSeq(k.toSeq ++ lSeq ++ rSeq)
    }
    val joined = unioned.groupByKey(toKey)(kEnc)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: Row, it: Iterator[Row], state: GroupState[Row]) =>
          val st = state.getOption.orNull
          var l = if (st == null) null else st.getAs[Row](0)
          var r = if (st == null) null else st.getAs[Row](1)
          var changed = false
          it.foreach { row =>
            if (row.getInt(nKeys) == 0) { l = row.getStruct(nKeys + 1); changed = true }
            else { r = row.getStruct(nKeys + 2); changed = true }
          }
          state.update(Row(l, r))
          val ok = how match {
            case "inner" => l != null && r != null
            case "left" => l != null
            case _ => l != null || r != null
          }
          if (changed && ok)
            Iterator.single(emit(k, Option(l), Option(r)))
          else Iterator.empty
      }(sEnc, oEnc)
    joined.toDF(outSchema.fieldNames: _*)
  }

  /** KStream ⋈ KTable enrichment in streaming mode: Kafka's point-in-time
    * lookup of the table's CURRENT value per stream record. A plain equi-join
    * against the table changelog would match every historical upsert of the
    * key (round 1's latent bug, fixed here): instead, union both sides
    * tagged, hold the latest table value per key in state, and emit one
    * enriched row per stream record. Within a micro-batch, table updates
    * apply before stream rows (documented divergence: Kafka interleaves by
    * timestamp; Spark batches give no intra-batch order). A table record
    * whose value columns are all null is a tombstone → deletes state.
    * `how` ∈ inner | left (Kafka defines no outer stream-table join).
    */
  def streamTableJoin(sf: KFrame, rf: KFrame, how: String): DataFrame = {
    require(how == "inner" || how == "left",
      s"stream-table join supports inner|left, got $how")
    require(sf.keys.size == rf.keys.size, "join key arity mismatch")
    val keyNames = sf.keys
    val keySchema = StructType(keyNames.map(sf.df.schema(_)))
    // stream payload = event time + value columns (keys travel separately)
    val sVals = sf.eventTime.toSeq ++ sf.valueCols
    val sStruct = StructType(sVals.map(sf.df.schema(_)))
    val rKeyed0 = rf.keys.zip(keyNames).foldLeft(rf.df) {
      case (d, (rk, lk)) => if (rk == lk) d else d.withColumnRenamed(rk, lk)
    }
    val taken = (keyNames ++ sVals).toSet
    val rVals0 = rf.valueCols
    val rKeyed = rVals0.foldLeft(rKeyed0)((d, c) =>
      if (taken.contains(c)) d.withColumnRenamed(c, s"${c}_r") else d)
    val rVals = rVals0.map(c => if (taken.contains(c)) s"${c}_r" else c)
    val rStruct = StructType(rVals.map(rKeyed.schema(_)))

    val sTagged = sf.df.select(
      keyNames.map(sf.df.col) :+ lit(0).as("__side") :+
      struct(sVals.map(sf.df.col): _*).as("__s") :+
      lit(null).cast(rStruct).as("__r"): _*)
    val rTagged = rKeyed.select(
      keyNames.map(rKeyed.col) :+ lit(1).as("__side") :+
      lit(null).cast(sStruct).as("__s") :+
      struct(rVals.map(rKeyed.col): _*).as("__r"): _*)
    val unioned = sTagged.unionByName(rTagged)

    val outSchema = StructType(keySchema ++ sStruct ++ rStruct)
    val kEnc = Encoders.row(keySchema)
    val oEnc = Encoders.row(outSchema)
    val sEnc = Encoders.row(rStruct) // state: latest table value, struct row
    val nKeys = keyNames.size
    val toKey = (row: Row) => Row.fromSeq((0 until nKeys).map(row.get))

    val joined = unioned.groupByKey(toKey)(kEnc)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: Row, it: Iterator[Row], state: GroupState[Row]) =>
          var table = state.getOption.orNull
          val streamRows = scala.collection.mutable.ArrayBuffer.empty[Row]
          it.foreach { row =>
            if (row.getInt(nKeys) == 1) {
              val v = row.getStruct(nKeys + 2)
              // tombstone = all value columns null → delete
              table = if (v == null || v.toSeq.forall(_ == null)) null else v
            } else streamRows += row.getStruct(nKeys + 1)
          }
          if (table != null) state.update(table) else state.remove()
          val t = table
          streamRows.iterator.collect {
            case s if t != null || how == "left" =>
              Row.fromSeq(k.toSeq ++ s.toSeq ++
                (if (t != null) t.toSeq else Seq.fill(rStruct.size)(null)))
          }
      }(sEnc, oEnc)
    joined.toDF(outSchema.fieldNames: _*)
  }
}

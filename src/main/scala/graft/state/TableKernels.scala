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
  *
  * State lifecycle: KTable keys legitimately live forever (Kafka's
  * compacted topics), so the default is NoTimeout — but Kafka also lets a
  * store declare `retention.ms`, and `:withRetention` plumbs through here
  * as an OPTIONAL watermark + event-time timeout: a key idle past the
  * retention is evicted (its state removed; a later record re-creates it
  * as new). Same pattern as the session kernel's retention.
  */
object TableKernels {

  /** Event-time cell → epoch millis, tolerant of TIMESTAMP and
    * TIMESTAMP_NTZ external types (the fixtures carry both).
    */
  private def tsMillis(v: Any): Long = v match {
    case t: java.sql.Timestamp => t.getTime
    case d: java.time.LocalDateTime =>
      d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    case i: java.time.Instant => i.toEpochMilli
    case _ => Long.MinValue
  }

  /** Latest-value-per-key over a keyed record stream — the `:table` source
    * semantics (`eval.clj:72`): each input batch updates per-key state with
    * the record of highest `orderCol` (the Kafka-offset analog); changed
    * keys re-emit their full row. With `retention`, keys idle past the
    * interval are evicted via event-time timeout (needs the frame's
    * eventTime column).
    */
  def latestPerKey(f: KFrame, orderCol: String,
                   retention: Option[String] = None): DataFrame = {
    val keyNames = f.keys
    val schema = f.df.schema
    val keySchema = StructType(keyNames.map(schema(_)))
    val ordIdx = schema.fieldIndex(orderCol)
    val kEnc = Encoders.row(keySchema)
    val oEnc = Encoders.row(schema)
    val toKey = (row: Row) => Row.fromSeq(keyNames.map(row.getAs[Any]))
    def ord(r: Row): Comparable[Any] =
      r.get(ordIdx).asInstanceOf[Comparable[Any]]
    val withRet = retention.isDefined && f.df.isStreaming
    require(retention.isEmpty || f.eventTime.isDefined,
      ":withRetention on a table needs an event-time column (Consumed.eventTime)")
    val retMs = retention.map(graft.Intervals.toMillis).getOrElse(0L)
    val tsIdx = f.eventTime.map(schema.fieldIndex).getOrElse(-1)
    val input = if (withRet)
      f.df.withWatermark(f.eventTime.get, retention.get) else f.df
    val timeout =
      if (withRet) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    // Append mode: emissions are upsert *events* on the changelog — and
    // only Append-mode FMGWS operators may chain (table → table-join → ...).
    input.groupByKey(toKey)(kEnc)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (_: Row, it: Iterator[Row], state: GroupState[Row]) =>
          if (state.hasTimedOut) { // key idle past retention → evict
            state.remove()
            Iterator.empty
          } else {
            val rows = it.toArray
            val best = (state.getOption.iterator ++ rows.iterator)
              .reduce((a, b) => if (ord(a).compareTo(ord(b)) >= 0) a else b)
            val changed = !state.getOption.contains(best)
            state.update(best)
            if (withRet) {
              val maxTs = rows.iterator.map(r => tsMillis(r.get(tsIdx)))
                .foldLeft(Long.MinValue)(math.max)
              state.setTimeoutTimestamp(math.max(
                maxTs + retMs, state.getCurrentWatermarkMs() + 1L))
            }
            if (changed) Iterator.single(best) else Iterator.empty
          }
      }(oEnc, oEnc)
      .toDF()
  }

  /** KTable ⋈ KTable on primary key (SURVEY §2.4, the hardest mapping):
    * union the two changelogs tagged by side, hold latest-left/latest-right
    * per key in state, emit the joined row whenever either side updates.
    * Emission honors inner/left/full-outer null semantics. With
    * `retention`, a key with no update from EITHER side for the interval
    * is evicted (both sides' watermarks feed the eviction clock; a later
    * update re-creates the key as if first seen).
    */
  def tableTableJoin(lf: KFrame, rf: KFrame, how: String,
                     retention: Option[String] = None): DataFrame = {
    require(lf.keys.size == rf.keys.size, "join key arity mismatch")
    val spark = lf.df.sparkSession
    val keyNames = lf.keys
    val keySchema = StructType(keyNames.map(lf.df.schema(_)))
    val lVals = lf.valueCols
    val lStruct = StructType(lVals.map(lf.df.schema(_)))
    val withRet = retention.isDefined && lf.df.isStreaming
    require(retention.isEmpty ||
        (lf.eventTime.isDefined && rf.eventTime.isDefined),
      ":withRetention on a table-table join needs event time on both sides")
    val retMs = retention.map(graft.Intervals.toMillis).getOrElse(0L)
    val lDf = if (withRet)
      lf.df.withWatermark(lf.eventTime.get, retention.get) else lf.df
    val rDf0 = if (withRet)
      rf.df.withWatermark(rf.eventTime.get, retention.get) else rf.df
    val rKeyed0 = rf.keys.zip(keyNames).foldLeft(rDf0) {
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

    // __ts carries each side's RAW event-time attribute (an alias keeps the
    // watermark metadata; any expression over it would strip it and
    // EventTimeTimeout analysis rejects the plan). Null when no retention.
    val lTs = if (withRet) lDf.col(lf.eventTime.get).as("__ts")
              else lit(null).cast("timestamp").as("__ts")
    // the right event-time column's post-rename name: key columns were
    // renamed to the LEFT key names (not suffixed), value columns clashing
    // with taken got `_r` — mirror the renames actually applied above
    val rKeyRename = rf.keys.zip(keyNames).toMap
    val rTsName = rf.eventTime.map(t => rKeyRename.getOrElse(t,
      if (taken.contains(t)) s"${t}_r" else t))
    val rTs = if (withRet) rKeyed.col(rTsName.get).as("__ts")
              else lit(null).cast("timestamp").as("__ts")
    val lTagged = lDf.select(
      keyNames.map(lDf.col) :+ lit(0).as("__side") :+
      struct(lVals.map(lDf.col): _*).as("__l") :+
      lit(null).cast(rStruct).as("__r") :+ lTs: _*)
    val rTagged = rKeyed.select(
      keyNames.map(rKeyed.col) :+ lit(1).as("__side") :+
      lit(null).cast(lStruct).as("__l") :+
      struct(rVals.map(rKeyed.col): _*).as("__r") :+ rTs: _*)
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
    val tsIdx = nKeys + 3

    val emit = (k: Row, l: Option[Row], r: Option[Row]) => {
      val lSeq = l.map(_.toSeq).getOrElse(Seq.fill(lStruct.size)(null))
      val rSeq = r.map(_.toSeq).getOrElse(Seq.fill(rStruct.size)(null))
      Row.fromSeq(k.toSeq ++ lSeq ++ rSeq)
    }
    val timeout =
      if (withRet) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    val joined = unioned.groupByKey(toKey)(kEnc)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (k: Row, it: Iterator[Row], state: GroupState[Row]) =>
          if (state.hasTimedOut) { // key idle past retention → evict
            state.remove()
            Iterator.empty
          } else {
            val st = state.getOption.orNull
            var l = if (st == null) null else st.getAs[Row](0)
            var r = if (st == null) null else st.getAs[Row](1)
            var changed = false
            var maxTs = Long.MinValue
            it.foreach { row =>
              if (withRet) maxTs = math.max(maxTs, tsMillis(row.get(tsIdx)))
              if (row.getInt(nKeys) == 0) { l = row.getStruct(nKeys + 1); changed = true }
              else { r = row.getStruct(nKeys + 2); changed = true }
            }
            state.update(Row(l, r))
            if (withRet)
              state.setTimeoutTimestamp(math.max(
                maxTs + retMs, state.getCurrentWatermarkMs() + 1L))
            val ok = how match {
              case "inner" => l != null && r != null
              case "left" => l != null
              case _ => l != null || r != null
            }
            if (changed && ok)
              Iterator.single(emit(k, Option(l), Option(r)))
            else Iterator.empty
          }
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
    * With `retention`, a table key receiving no update or stream probe for
    * the interval is evicted — later stream rows see it as absent (null
    * enrichment on left joins, dropped on inner) until the table re-upserts.
    */
  def streamTableJoin(sf: KFrame, rf: KFrame, how: String,
                      retention: Option[String] = None): DataFrame = {
    require(how == "inner" || how == "left",
      s"stream-table join supports inner|left, got $how")
    require(sf.keys.size == rf.keys.size, "join key arity mismatch")
    val keyNames = sf.keys
    val keySchema = StructType(keyNames.map(sf.df.schema(_)))
    val withRet = retention.isDefined && sf.df.isStreaming
    require(retention.isEmpty ||
        (sf.eventTime.isDefined && rf.eventTime.isDefined),
      ":withRetention on a stream-table join needs event time on both sides")
    val retMs = retention.map(graft.Intervals.toMillis).getOrElse(0L)
    val sDf = if (withRet)
      sf.df.withWatermark(sf.eventTime.get, retention.get) else sf.df
    val rDf0 = if (withRet)
      rf.df.withWatermark(rf.eventTime.get, retention.get) else rf.df
    // stream payload = event time + value columns (keys travel separately)
    val sVals = sf.eventTime.toSeq ++ sf.valueCols
    val sStruct = StructType(sVals.map(sf.df.schema(_)))
    val rKeyed0 = rf.keys.zip(keyNames).foldLeft(rDf0) {
      case (d, (rk, lk)) => if (rk == lk) d else d.withColumnRenamed(rk, lk)
    }
    val taken = (keyNames ++ sVals).toSet
    val rVals0 = rf.valueCols
    val rKeyed = rVals0.foldLeft(rKeyed0)((d, c) =>
      if (taken.contains(c)) d.withColumnRenamed(c, s"${c}_r") else d)
    val rVals = rVals0.map(c => if (taken.contains(c)) s"${c}_r" else c)
    val rStruct = StructType(rVals.map(rKeyed.schema(_)))

    // raw event-time attributes (see tableTableJoin for why no expression)
    val sTs = if (withRet) sDf.col(sf.eventTime.get).as("__ts")
              else lit(null).cast("timestamp").as("__ts")
    // same post-rename derivation as tableTableJoin: keys → left names,
    // clashing values → `_r`
    val rKeyRename = rf.keys.zip(keyNames).toMap
    val rTsName = rf.eventTime.map(t => rKeyRename.getOrElse(t,
      if (taken.contains(t)) s"${t}_r" else t))
    val rTs = if (withRet) rKeyed.col(rTsName.get).as("__ts")
              else lit(null).cast("timestamp").as("__ts")
    val sTagged = sDf.select(
      keyNames.map(sDf.col) :+ lit(0).as("__side") :+
      struct(sVals.map(sDf.col): _*).as("__s") :+
      lit(null).cast(rStruct).as("__r") :+ sTs: _*)
    val rTagged = rKeyed.select(
      keyNames.map(rKeyed.col) :+ lit(1).as("__side") :+
      lit(null).cast(sStruct).as("__s") :+
      struct(rVals.map(rKeyed.col): _*).as("__r") :+ rTs: _*)
    val unioned = sTagged.unionByName(rTagged)

    val outSchema = StructType(keySchema ++ sStruct ++ rStruct)
    val kEnc = Encoders.row(keySchema)
    val oEnc = Encoders.row(outSchema)
    val sEnc = Encoders.row(rStruct) // state: latest table value, struct row
    val nKeys = keyNames.size
    val toKey = (row: Row) => Row.fromSeq((0 until nKeys).map(row.get))
    val tsIdx = nKeys + 3
    val timeout =
      if (withRet) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout

    val joined = unioned.groupByKey(toKey)(kEnc)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (k: Row, it: Iterator[Row], state: GroupState[Row]) =>
          if (state.hasTimedOut) { // table key idle past retention → evict
            state.remove()
            Iterator.empty
          } else {
            var table = state.getOption.orNull
            var maxTs = Long.MinValue
            val streamRows = scala.collection.mutable.ArrayBuffer.empty[Row]
            it.foreach { row =>
              if (withRet) maxTs = math.max(maxTs, tsMillis(row.get(tsIdx)))
              if (row.getInt(nKeys) == 1) {
                val v = row.getStruct(nKeys + 2)
                // tombstone = all value columns null → delete
                table = if (v == null || v.toSeq.forall(_ == null)) null else v
              } else streamRows += row.getStruct(nKeys + 1)
            }
            if (table != null) state.update(table) else state.remove()
            if (withRet && table != null)
              state.setTimeoutTimestamp(math.max(
                maxTs + retMs, state.getCurrentWatermarkMs() + 1L))
            val t = table
            streamRows.iterator.collect {
              case s if t != null || how == "left" =>
                Row.fromSeq(k.toSeq ++ s.toSeq ++
                  (if (t != null) t.toSeq else Seq.fill(rStruct.size)(null)))
            }
          }
      }(sEnc, oEnc)
    joined.toDF(outSchema.fieldNames: _*)
  }
}

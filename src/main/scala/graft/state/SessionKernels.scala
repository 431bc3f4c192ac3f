package graft.state

import graft.ast.SessionAggregateOp
import graft.compile.{Env, KFrame}
import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{StructField, StructType, TimestampType}

/** Session windows over arbitrary user aggregation functions — SURVEY §7.5
  * risk #4: Spark's `session_window` only composes with declarative
  * aggregates, but the reference's session path is init/aggregator/MERGER
  * lambdas over opaque state (`eval.clj:265-278`, session stores
  * `eval.clj:220,224`). This kernel owns the gap logic so the user's merger
  * runs when a late/bridging record fuses two sessions — the exact case the
  * `:merger` SAM interface exists for.
  *
  * Batch: per key, event-time order, gap split, fold. Streaming:
  * flatMapGroupsWithState holding open sessions; each batch assigns records
  * to sessions, merges overlapping ones with the user merger, and emits
  * updated session snapshots (Append events on the session changelog —
  * chainable like the other kernels).
  */
object SessionKernels extends Serializable {

  /** Timestamp ↔ microseconds (java.sql.Timestamp.getTime is millis only —
    * the fixtures carry microsecond components).
    */
  private[state] def toMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Event-time cell → microseconds, tolerant of TIMESTAMP and
    * TIMESTAMP_NTZ external types (parquet `isAdjustedToUTC=false` columns
    * read as NTZ → `LocalDateTime` rows; the session timezone is UTC, so
    * the NTZ wall-clock IS the instant — same convention as the DuckDB
    * oracle's naive timestamps). The read happens on the row VALUE, never
    * the plan, so watermark metadata on the column survives.
    */
  private[graft] def toMicrosAny(v: Any): Long = v match {
    case t: java.sql.Timestamp => toMicros(t)
    case d: java.time.LocalDateTime =>
      val i = d.toInstant(java.time.ZoneOffset.UTC)
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case i: java.time.Instant =>
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case other => throw new IllegalArgumentException(
      s"session event time must be a timestamp value, got " +
        s"${if (other == null) "null" else other.getClass.getName}")
  }
  private[state] def fromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private def parseGapMs(gap: String): Long = {
    val Array(n, unit) = gap.trim.split("\\s+")
    val base = unit.toLowerCase.stripSuffix("s") match {
      case "millisecond" => 1L
      case "second" => 1000L
      case "minute" => 60000L
      case "hour" => 3600000L
      case "day" => 86400000L
      case u => throw new IllegalArgumentException(s"unsupported gap unit $u")
    }
    n.toLong * base
  }

  def run[B](op: SessionAggregateOp[B], env: Env): KFrame = {
    val f = UserAggregates.groupedOf(op.grouped, env)
    val ts = f.eventTime.getOrElse(
      throw new IllegalArgumentException("session aggregate needs event time"))
    val gapUs = parseGapMs(op.gap) * 1000L
    val keyNames = f.keys
    val keySchema = StructType(keyNames.map(f.df.schema(_)))
    val outSchema = StructType(
      keySchema ++
      Seq(StructField("session_start", TimestampType),
          StructField("session_end", TimestampType)) ++
      op.outSchema)
    val kEnc = Encoders.row(keySchema)
    val oEnc = Encoders.row(outSchema)
    val tsIdx = f.df.schema.fieldIndex(ts)
    val toKey = (row: Row) => Row.fromSeq(keyNames.map(row.getAs[Any]))
    val (init, step, merge, finish) =
      (op.initializer, op.aggregator, op.merger, op.finisher)

    def emitRow(k: Row, s: Session): Row = Row.fromSeq(
      k.toSeq ++ Seq(fromMicros(s.start), fromMicros(s.end)) ++
      finish(s.buf.asInstanceOf[B]).toSeq)

    /** Insert one record into the open-session list, merging via the user
      * merger when it bridges sessions. Sessions kept sorted by start.
      */
    def insert(sessions: List[Session], t: Long, row: Row): List[Session] = {
      val nb = step(init(), row)
      val fresh = Session(t, t + gapUs, nb)
      // strict overlap: a record exactly `gap` after a session's last event
      // opens a NEW session (session end is exclusive — same boundary rule
      // as Spark's session_window and the agg_session oracle)
      val (overlap, rest) = sessions.partition(s =>
        s.start < fresh.end && fresh.start < s.end)
      val merged = overlap.foldLeft(fresh)((a, s) => Session(
        math.min(a.start, s.start), math.max(a.end, s.end),
        merge(s.buf.asInstanceOf[B], a.buf.asInstanceOf[B])))
      (merged :: rest).sortBy(_.start)
    }

    val out =
      if (!env.isStreaming) {
        // Secondary sort: per-key rows arrive in (event time, tiebreak)
        // order and fold streamingly — state is the open-session list
        // (bounded by session count), never the key's row history.
        import org.apache.spark.sql.functions.col
        val orderCols =
          col(ts) +: SecondarySort.tiebreakCols(f.df, keyNames, Seq(ts))
        SecondarySort.foldSortedGroups(f.df, keyNames, orderCols) {
          (k: Row, rows: Iterator[Row]) =>
            val sessions = rows.foldLeft(List.empty[Session]) { (acc, r) =>
              insert(acc, toMicrosAny(r.get(tsIdx)), r)
            }
            sessions.iterator.map(s => emitRow(k, s))
        }(oEnc)
      } else {
        // State = array<struct<start,end,buf>> — an explicit struct row
        // (UnsafeRow in the store, schema visible in the checkpoint); only
        // the opaque user accumulator is a binary payload (see OpaqueState).
        //
        // `:withRetention` maps to watermark + eviction: a session whose
        // end ≤ watermark can never be extended (no event older than the
        // watermark arrives), so it leaves state; once every session of a
        // key closes, an event-time timeout removes the key entirely.
        // Without retention the reference's default session store also
        // retains forever by configuration — but state here would grow with
        // key count, so declare retention for unbounded-key streams.
        val sessStruct = StructType(Seq(
          StructField("start", org.apache.spark.sql.types.LongType, nullable = false),
          StructField("end", org.apache.spark.sql.types.LongType, nullable = false),
          StructField("buf", org.apache.spark.sql.types.BinaryType, nullable = false)))
        val stateSchema = StructType(Seq(StructField("sessions",
          org.apache.spark.sql.types.ArrayType(sessStruct, containsNull = false),
          nullable = false)))
        val sEnc = Encoders.row(stateSchema)
        def encode(ss: List[Session]): Row =
          Row(ss.map(s => Row(s.start, s.end, OpaqueState.ser(s.buf))))
        def decode(r: Row): List[Session] = r.getSeq[Row](0).iterator
          .map(s => Session(s.getLong(0), s.getLong(1),
            OpaqueState.deser(s.getAs[Array[Byte]](2))))
          .toList
        val withRetention = op.retention.isDefined
        val input = op.retention match {
          case Some(ret) => f.df.withWatermark(ts, ret)
          case None => f.df
        }
        val timeout =
          if (withRetention) GroupStateTimeout.EventTimeTimeout
          else GroupStateTimeout.NoTimeout
        input.groupByKey(toKey)(kEnc).flatMapGroupsWithState(
          OutputMode.Append, timeout) {
          (k: Row, it: Iterator[Row], state: GroupState[Row]) =>
            var sessions = state.getOption.map(decode).getOrElse(Nil)
            val before = sessions.toSet
            it.foreach { r =>
              sessions = insert(sessions,
                toMicrosAny(r.get(tsIdx)), r)
            }
            // snapshot emissions BEFORE eviction: a session updated in this
            // batch emits its latest state even if it closes immediately
            val emitted = sessions.iterator.filterNot(before)
              .map(s => emitRow(k, s)).toList
            if (withRetention) {
              val wmUs = state.getCurrentWatermarkMs() * 1000L
              val open = sessions.filter(_.end > wmUs)
              if (open.isEmpty) state.remove()
              else {
                state.update(encode(open))
                // fire once the watermark passes the last open session's end
                val maxEndMs = open.map(s => (s.end + 999L) / 1000L).max
                state.setTimeoutTimestamp(
                  math.max(maxEndMs, state.getCurrentWatermarkMs() + 1L))
              }
            } else state.update(encode(sessions))
            emitted.iterator
        }(sEnc, oEnc)
      }
    KFrame(out.toDF(), keyNames, None, isTable = true)
  }

  /** One open session: [start, end) with end = lastEventTime + gap. */
  final case class Session(start: Long, end: Long, buf: Any)
      extends Serializable
}

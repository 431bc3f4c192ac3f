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
              insert(acc, toMicros(r.getAs[java.sql.Timestamp](tsIdx)), r)
            }
            sessions.iterator.map(s => emitRow(k, s))
        }(oEnc)
      } else
        f.df.groupByKey(toKey)(kEnc).flatMapGroupsWithState(
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (k: Row, it: Iterator[Row], state: GroupState[SessionList]) =>
            var sessions = state.getOption.map(_.sessions).getOrElse(Nil)
            val before = sessions.toSet
            it.foreach { r =>
              sessions = insert(sessions,
                toMicros(r.getAs[java.sql.Timestamp](tsIdx)), r)
            }
            state.update(SessionList(sessions))
            sessions.iterator.filterNot(before).map(s => emitRow(k, s))
        }(Encoders.javaSerialization[SessionList], oEnc)
    KFrame(out.toDF(), keyNames, None, isTable = true)
  }

  /** One open session: [start, end) with end = lastEventTime + gap. */
  final case class Session(start: Long, end: Long, buf: Any)
      extends Serializable
  final case class SessionList(sessions: List[Session]) extends Serializable
}

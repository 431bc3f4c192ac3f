package graft.state

import graft.ast._
import graft.compile.{Compiler, Env, KFrame}
import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed per-key state kernels — the reference's arbitrary-lambda
  * aggregation surface (`:reduce` `eval.clj:163-165,280-283`; `:aggregate`
  * with initializer/aggregator/merger `eval.clj:157-159,265-278`). The
  * declarative fast path (Column aggregates → codegen) is `AggOp`; these
  * kernels exist for genuinely opaque user functions, matching SURVEY §7.5
  * item 5: expression DSL when possible, black-box closures only when not.
  *
  * Batch: groupByKey + [map|flatMap]Groups (shuffle on the key, same as any
  * agg). Streaming: flatMapGroupsWithState in Update mode — the running
  * per-key emission cadence Kafka Streams has (micro-batch granularity,
  * SURVEY §2.3 note).
  */
object UserAggregates {

  private def keyAndValues(f: KFrame): (Seq[String], Seq[String]) =
    (f.keys, f.valueCols)

  private[graft] def groupedOf(grouped: KNode, env: Env): KFrame = grouped match {
    case GroupByOp(up, keys, _) => Compiler.compile(SelectKeyOp(up, keys), env)
    case GroupByKeyOp(up, _) => Compiler.compile(up, env)
    case other => Compiler.compile(other, env)
  }

  def reduce(r: ReduceOp, env: Env): KFrame = {
    val f = groupedOf(r.grouped, env)
    val (keyNames, valNames) = keyAndValues(f)
    val keySchema = StructType(keyNames.map(f.df.schema(_)))
    val valSchema = StructType(valNames.map(f.df.schema(_)))
    val outSchema = StructType(keySchema ++ valSchema)
    val kEnc = Encoders.row(keySchema)
    val oEnc = Encoders.row(outSchema)
    val reducer = r.reducer
    val toKey = (row: Row) => Row.fromSeq(keyNames.map(row.getAs[Any]))
    val toVal = (row: Row) => Row.fromSeq(valNames.map(row.getAs[Any]))
    val grouped = f.df.groupByKey(toKey)(kEnc)
    val out =
      if (!env.isStreaming)
        grouped.mapGroups { (k: Row, it: Iterator[Row]) =>
          val v = it.map(toVal).reduce(reducer)
          Row.fromSeq(k.toSeq ++ v.toSeq)
        }(oEnc)
      else
        grouped.flatMapGroupsWithState(
          OutputMode.Update, GroupStateTimeout.NoTimeout) {
          (k: Row, it: Iterator[Row], state: GroupState[Row]) =>
            val incoming = it.map(toVal)
            val v = (state.getOption.iterator ++ incoming).reduce(reducer)
            state.update(v)
            Iterator.single(Row.fromSeq(k.toSeq ++ v.toSeq))
        }(Encoders.row(valSchema), oEnc)
    KFrame(out.toDF(), keyNames, None, isTable = true)
  }

  def aggregate[B](a: AggregateOp[B], env: Env): KFrame = {
    val f = groupedOf(a.grouped, env)
    val keyNames = f.keys
    val keySchema = StructType(keyNames.map(f.df.schema(_)))
    val outSchema = StructType(keySchema ++ a.outSchema)
    val kEnc = Encoders.row(keySchema)
    val oEnc = Encoders.row(outSchema)
    val (init, step, finish) = (a.initializer, a.aggregator, a.finisher)
    val toKey = (row: Row) => Row.fromSeq(keyNames.map(row.getAs[Any]))
    val grouped = f.df.groupByKey(toKey)(kEnc)
    val out =
      if (!env.isStreaming)
        grouped.mapGroups { (k: Row, it: Iterator[Row]) =>
          val b = it.foldLeft(init())(step)
          Row.fromSeq(k.toSeq ++ finish(b).toSeq)
        }(oEnc)
      else {
        // Streaming: state holds B via java serialization (opaque user type).
        val sEnc = Encoders.javaSerialization[SerB]
        grouped.flatMapGroupsWithState(
          OutputMode.Update, GroupStateTimeout.NoTimeout) {
          (k: Row, it: Iterator[Row], state: GroupState[SerB]) =>
            val b0 = state.getOption.map(_.b.asInstanceOf[B]).getOrElse(init())
            val b = it.foldLeft(b0)(step)
            state.update(SerB(b))
            Iterator.single(Row.fromSeq(k.toSeq ++ finish(b).toSeq))
        }(sEnc, oEnc)
      }
    KFrame(out.toDF(), keyNames, None, isTable = true)
  }

  /** Serializable box for opaque user aggregation state. */
  final case class SerB(b: Any) extends Serializable
}

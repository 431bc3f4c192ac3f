// Hosted under org.apache.spark.sql for the same private[sql] plumbing
// access as VectorExpressions.
package org.apache.spark.sql.graftfn

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom membership probe over a long column — the scan-side
  * half of every broadcast-Bloom pattern (runtime-filter joins,
  * incremental Bloom dedup): the filter rides into generated code as one
  * reference object, so the probe stays inside whole-stage codegen where
  * a Scala UDF would box the key and break the codegen span. No false
  * negatives by construction; `true` may be a false positive — callers
  * must treat it as "candidate", never "member".
  */
case class BloomMightContainLong(child: Expression, filter: BloomFilter)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  override def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** String twin of [[BloomMightContainLong]], probing via the UTF-8 bytes
  * directly (`mightContainBinary` — `BloomFilter.putString` inserts the
  * UTF-8 byte form, so this is equivalent to `mightContainString` without
  * the per-row String decode).
  */
case class BloomMightContainString(child: Expression, filter: BloomFilter)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_string"

  override def nullSafeEval(input: Any): Any =
    filter.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomFunctions {
  /** Column face of [[BloomMightContainLong]]. */
  def bloom_might_contain_long(key: Column, filter: BloomFilter): Column =
    ExpressionUtils.column(
      BloomMightContainLong(ExpressionUtils.expression(key), filter))

  /** Column face of [[BloomMightContainString]]. */
  def bloom_might_contain_string(key: Column, filter: BloomFilter): Column =
    ExpressionUtils.column(
      BloomMightContainString(ExpressionUtils.expression(key), filter))
}

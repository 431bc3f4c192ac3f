// Hosted under org.apache.spark.sql for the same reason as
// VectorExpressions: access to ExpressionUtils for Column wrapping. See
// that file's header. Public face: graft.serde.Serdes.avro.
package org.apache.spark.sql.graftfn

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro binary serde as native Catalyst expressions — the production wire
  * format the reference's serde registry would reach through Kafka's Avro
  * serdes (`eval.clj:211-214` reflects onto `Serdes` statics). The
  * spark-avro module is not vendored in this environment, but Avro CORE
  * ships on Spark's classpath, so the encode/decode pair is implemented
  * directly against the Avro generic API, mirroring the module's
  * CatalystDataToAvro/AvroDataToCatalyst shape (public pattern).
  *
  * Type surface (what a record serde needs): boolean, int, long, float,
  * double, string, binary, timestamp (micros-as-long), arrays, nested
  * structs; nullable fields map to `union(null, T)`. Schemas travel as
  * Avro JSON (`Schema` objects parse lazily per executor).
  */
object AvroSchemas {

  /** StructType → Avro record schema (JSON form). Deterministic field
    * order (the struct's), names preserved — DataType.sql differences
    * like char/varchar are out of scope for the serde surface.
    */
  def toAvroJson(schema: StructType, recordName: String = "record"): String =
    toAvro(schema, recordName).toString

  private[graftfn] def toAvro(schema: StructType, recordName: String): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val base = fieldSchema(f.dataType, s"${recordName}_${f.name}")
      val s =
        if (f.nullable)
          Schema.createUnion(java.util.Arrays.asList(
            Schema.create(Schema.Type.NULL), base))
        else base
      val default: AnyRef = if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null
      fields.add(new Schema.Field(f.name, s, null, default))
    }
    Schema.createRecord(recordName, null, "graft.serde", false, fields)
  }

  private def fieldSchema(dt: DataType, nestedName: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    // timestamp-micros as a plain long lane (logical-type annotations are
    // readable by any Avro consumer; the decode side restores micros)
    case TimestampType | TimestampNTZType => Schema.create(Schema.Type.LONG)
    case DateType => Schema.create(Schema.Type.INT)
    case ArrayType(et, containsNull) =>
      val e = fieldSchema(et, s"${nestedName}_item")
      Schema.createArray(
        if (containsNull)
          Schema.createUnion(java.util.Arrays.asList(
            Schema.create(Schema.Type.NULL), e))
        else e)
    case st: StructType => toAvro(st, nestedName)
    case other => throw new IllegalArgumentException(
      s"avro serde: unsupported Spark type $other")
  }
}

/** struct column → Avro binary. The declared schema is an input type
  * contract: Catalyst implicit-casts a compatible struct (e.g. int fields
  * where the schema says long) before encode, so wire types always match
  * the Avro schema.
  */
case class AvroEncode(child: Expression, sparkSchema: StructType)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(sparkSchema)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "avro_encode"

  private val avroJson = AvroSchemas.toAvroJson(sparkSchema)
  @transient private lazy val avroSchema = new Schema.Parser().parse(avroJson)
  @transient private lazy val writer =
    new GenericDatumWriter[GenericRecord](avroSchema)
  @transient private lazy val out = new ByteArrayOutputStream(256)
  @transient private var encoder: BinaryEncoder = _

  override def nullSafeEval(input: Any): Any = {
    val rec = AvroConvert.toAvro(
      input.asInstanceOf[InternalRow], sparkSchema, avroSchema)
      .asInstanceOf[GenericRecord]
    out.reset()
    encoder = EncoderFactory.get().binaryEncoder(out, encoder)
    writer.write(rec, encoder)
    encoder.flush()
    out.toByteArray
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Avro binary → struct column (schema declared, as in from_avro). */
case class AvroDecode(child: Expression, sparkSchema: StructType)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = sparkSchema
  override def prettyName: String = "avro_decode"

  private val avroJson = AvroSchemas.toAvroJson(sparkSchema)
  @transient private lazy val avroSchema = new Schema.Parser().parse(avroJson)
  @transient private lazy val reader =
    new GenericDatumReader[GenericRecord](avroSchema)
  @transient private var decoder: BinaryDecoder = _

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    decoder = DecoderFactory.get().binaryDecoder(bytes, decoder)
    val rec = reader.read(null, decoder)
    AvroConvert.toCatalyst(rec, sparkSchema)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Value conversions Catalyst ↔ Avro generic. */
private[graftfn] object AvroConvert {

  /** InternalRow (+ Spark schema) → GenericRecord against `avro`. */
  def toAvro(value: Any, dt: DataType, avro: Schema): Any = {
    if (value == null) return null
    val target = nonNull(avro)
    dt match {
      case st: StructType =>
        val row = value.asInstanceOf[InternalRow]
        val rec = new GenericData.Record(target)
        st.fields.zipWithIndex.foreach { case (f, i) =>
          val v = if (row.isNullAt(i)) null else row.get(i, f.dataType)
          rec.put(i, toAvro(v, f.dataType, target.getFields.get(i).schema()))
        }
        rec
      case ArrayType(et, _) =>
        val arr = value.asInstanceOf[ArrayData]
        val n = arr.numElements()
        val lst = new java.util.ArrayList[Any](n)
        var i = 0
        while (i < n) {
          lst.add(if (arr.isNullAt(i)) null
            else toAvro(arr.get(i, et), et, target.getElementType))
          i += 1
        }
        lst
      case StringType => value.toString // UTF8String → java String
      case BinaryType => java.nio.ByteBuffer.wrap(value.asInstanceOf[Array[Byte]])
      case ShortType => value.asInstanceOf[Short].toInt
      case ByteType => value.asInstanceOf[Byte].toInt
      case TimestampType | TimestampNTZType => value // already micros long
      case DateType => value // already days int
      case _ => value // int/long/float/double/boolean pass through
    }
  }

  /** Avro generic value → Catalyst internal value for `dt`. */
  def toCatalyst(value: Any, dt: DataType): Any = {
    if (value == null) return null
    dt match {
      case st: StructType =>
        val rec = value.asInstanceOf[GenericRecord]
        InternalRow.fromSeq(st.fields.zipWithIndex.map { case (f, i) =>
          toCatalyst(rec.get(i), f.dataType)
        }.toIndexedSeq)
      case ArrayType(et, _) =>
        val lst = value.asInstanceOf[java.util.List[Any]]
        val out = new Array[Any](lst.size())
        var i = 0
        while (i < out.length) { out(i) = toCatalyst(lst.get(i), et); i += 1 }
        new GenericArrayData(out)
      case StringType => UTF8String.fromString(value.toString)
      case BinaryType =>
        val bb = value.asInstanceOf[java.nio.ByteBuffer]
        val bytes = new Array[Byte](bb.remaining())
        bb.duplicate().get(bytes)
        bytes
      case ShortType => value.asInstanceOf[Int].toShort
      case ByteType => value.asInstanceOf[Int].toByte
      case _ => value
    }
  }

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION) {
      import scala.jdk.CollectionConverters._
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    } else s
}

/** Column-API face. */
object AvroFunctions {
  /** Encode a struct column to Avro binary with a schema derived from the
    * struct's Spark type.
    */
  def to_avro(c: Column, schema: StructType): Column =
    ExpressionUtils.column(AvroEncode(ExpressionUtils.expression(c), schema))

  /** Decode an Avro-binary column into a struct with the declared schema. */
  def from_avro(c: Column, schema: StructType): Column =
    ExpressionUtils.column(AvroDecode(ExpressionUtils.expression(c), schema))
}

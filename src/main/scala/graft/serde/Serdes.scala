package graft.serde

import graft.ast.SerdeSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Serde surface (reference: `src/cddr/ksml/eval.clj:211-214` reflects onto
  * `Serdes` statics; custom fn-pair serdes `eval.clj:290-308`). Kafka records
  * reach Spark as `key: binary, value: binary`; a serde here is the pair of
  * Column transforms between that wire form and the typed view. All built-ins
  * are pure expressions (whole-stage codegen); the fn-pair path wraps user
  * Scala closures as UDFs — the `:serde-from` analog (`eval_test.clj:78-82`).
  */
object Serdes {

  /** `[:serde '(String)]` — UTF-8 bytes ↔ string. */
  val string: SerdeSpec = SerdeSpec("string",
    decode = c => c.cast("string"),
    encode = c => c.cast("binary"))

  /** `[:serde '(Long)]` — textual long on the wire (Spark cast path). */
  val long: SerdeSpec = SerdeSpec("long",
    decode = c => c.cast("string").cast("long"),
    encode = c => c.cast("string").cast("binary"))

  /** `[:serde '(Integer)]`. */
  val int: SerdeSpec = SerdeSpec("int",
    decode = c => c.cast("string").cast("int"),
    encode = c => c.cast("string").cast("binary"))

  /** `[:serde '(Double)]`. */
  val double: SerdeSpec = SerdeSpec("double",
    decode = c => c.cast("string").cast("double"),
    encode = c => c.cast("string").cast("binary"))

  /** `[:serde '(ByteArray)]` — identity. */
  val byteArray: SerdeSpec = SerdeSpec("bytes", identity, identity)

  /** JSON serde with declared schema — the rich-data analog of the
    * reference's (commented-out) EDN serde (`eval_test.clj:281-288`).
    */
  def json(schema: StructType): SerdeSpec = SerdeSpec("json",
    decode = c => from_json(c.cast("string"), schema),
    encode = c => to_json(c).cast("binary"))

  def cast(dt: DataType): SerdeSpec = SerdeSpec(s"cast-$dt",
    decode = c => c.cast(dt),
    encode = c => c.cast("binary"))

  /** Avro binary serde with declared schema — the production wire format
    * (`from_avro`/`to_avro` shape). The spark-avro MODULE is not vendored
    * here, but Avro core ships with Spark, so this rides the native
    * expressions in org.apache.spark.sql.graftfn.AvroExpressions
    * (CatalystDataToAvro/AvroDataToCatalyst pattern). Nullable fields map
    * to union(null, T); supported lanes: boolean, int, long, float,
    * double, string, binary, timestamp, date, arrays, nested structs.
    */
  def avro(schema: StructType): SerdeSpec = SerdeSpec("avro",
    decode = c => org.apache.spark.sql.graftfn.AvroFunctions.from_avro(c, schema),
    encode = c => org.apache.spark.sql.graftfn.AvroFunctions.to_avro(c, schema))

  /** `[:serde-from [:serializer f] [:deserializer f]]` — arbitrary user
    * codec as a UDF pair (`eval.clj:290-308`). Non-codegen; prefer the
    * expression serdes above on hot paths (SURVEY §7.5 item 5).
    */
  def fromFn[T: scala.reflect.runtime.universe.TypeTag](
      deserialize: Array[Byte] => T,
      serialize: T => Array[Byte]): SerdeSpec = {
    val de = udf(deserialize)
    val ser = udf(serialize)
    SerdeSpec("fn", c => de(c), c => ser(c))
  }
}

package graft.streaming

import graft.ast.{Consumed, SerdeSpec}
import graft.compile.Env
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kafka-backed streaming environment: each topic resolves to a
  * `readStream.format("kafka")` DataFrame with the record envelope the
  * reference's data model implies (SURVEY §1.1 KeyValue row: key, value,
  * topic, partition, offset, timestamp) and serdes applied as decode
  * expressions (`Consumed.with...`, eval.clj:176-180).
  *
  * Not exercised by the driver fixtures (no broker — and no
  * spark-sql-kafka connector jar — in this container; the connector ships
  * with production Spark distros). The construction path is the production
  * entry: the same topology compiles against [[graft.compile.ParquetEnv]]
  * for batch backfill and against this env for live streams.
  */
final class KafkaEnv(
    val spark: SparkSession,
    bootstrapServers: String,
    consumedByTopic: Map[String, Consumed] = Map.empty
) extends Env {

  def load(topic: String): DataFrame = {
    val consumed = consumedByTopic.getOrElse(topic, Consumed())
    val reader = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("startingOffsets",
        consumed.startingOffsets.getOrElse("latest")) // `:offset-reset`
    val raw =
      (if (topic.startsWith("pattern:"))
         reader.option("subscribePattern", topic.stripPrefix("pattern:"))
       else reader.option("subscribe", topic)).load()
    decodeEnvelope(raw, consumed)
  }

  /** Apply key/value serdes over the binary envelope; `timestamp` is the
    * record event time (the default Kafka timestamp-extractor behavior),
    * with invalid-timestamp policies from `Consumed.timestampPolicy`.
    */
  private def decodeEnvelope(raw: DataFrame, c: Consumed): DataFrame = {
    val key = c.keySerde.getOrElse(graft.serde.Serdes.byteArray).decode(col("key"))
    val value = c.valueSerde.getOrElse(graft.serde.Serdes.byteArray).decode(col("value"))
    raw.select(
      key.as("key"), value.as("value"),
      col("topic"), col("partition"), col("offset"),
      col("timestamp").as("ts"))
  }

  def topicNames: Seq[String] = consumedByTopic.keys.toSeq.sorted
  def isStreaming: Boolean = true
}

object KafkaTopics {
  /** Sink-side serde: encode a column for the Kafka `value` slot (`:to!`). */
  def encodeFor(serde: SerdeSpec, df: DataFrame, valueCol: String): DataFrame =
    df.withColumn("value", serde.encode(col(valueCol)))
}

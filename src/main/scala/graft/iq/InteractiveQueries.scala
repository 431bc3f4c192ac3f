package graft.iq

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col

/** Interactive queries over materialized state — the analog of
  * `src/cddr/ksml/ring.clj`: the reference routes an HTTP point-lookup to
  * whichever Kafka Streams instance owns the key's state shard
  * (`ring.clj:20-53`). In Spark, state materialized through a memory sink
  * (or any table sink) is queryable on the driver with plain SQL, so the
  * shard-routing layer collapses; we keep the reference's handler shape
  * (findHost / remote / local) as a façade for multi-driver deployments.
  *
  * Note: `ring.clj:15-18`'s `remote?` returns true when the owner equals
  * self (inverted name); we implement the intended semantics — route to the
  * owner, serve locally when the owner is self (SURVEY §3 entry point 3).
  */
object InteractiveQueries {

  /** All rows of a materialized store (memory-sink query name or temp view). */
  def store(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Point lookup by key — the `ReadOnlyKeyValueStore.get` analog. */
  def lookup(spark: SparkSession, name: String, keyCol: String,
             key: Any): Array[Row] =
    store(spark, name).where(col(keyCol) === key).collect()

  final case class HostInfo(host: String, port: Int)

  /** `ring.clj:40-53` handler parity: route a key's query to the shard
    * owner; serve locally when this instance owns it.
    */
  def handler[A](
      findHost: String => HostInfo,
      remote: (HostInfo, String) => A,
      local: String => A,
      self: HostInfo
  ): String => A = { key =>
    val owner = findHost(key)
    if (owner == self) local(key) else remote(owner, key)
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation: two-phase salted combine for hot keys. AQE's
  * skew-join handling covers joins; for aggregations whose key distribution
  * is pathological (one user with 10^9 events), the classic fix is an extra
  * deterministic salt level so the hot key's rows spread over `salts`
  * reducers, then a cheap final combine per key. Works for any decomposable
  * aggregate (sum/count/min/max — pass the partial and final forms).
  */
object Skew {

  /** Salted sum: Σ valueCol per key, immune to key skew. The salt derives
    * from row content (xxhash64), not rand() — deterministic replays.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                salts: Int = 16): DataFrame = {
    val salt = pmod(xxhash64(df.columns.map(col): _*), lit(salts)).as("__salt")
    df.select(col("*"), salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Salted count per key. */
  def saltedCount(df: DataFrame, keys: Seq[String], salts: Int = 16): DataFrame = {
    val salt = pmod(xxhash64(df.columns.map(col): _*), lit(salts)).as("__salt")
    df.select(col("*"), salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).cast("long").as("n"))
  }

  /** Salted inner equi-join for a skewed `big` side against a `small`
    * side that is too large to broadcast: `big` rows take a deterministic
    * content-derived salt in [0, salts); `small` replicates ×`salts` (one
    * copy per salt value) so every (key, salt) shard of the big side finds
    * its match locally. The shuffle then partitions on (keys, salt) — a
    * hot key's rows spread over `salts` reducers instead of one straggler
    * task. Result ≡ `big.join(small, keys)` exactly; only the partition
    * assignment changes.
    *
    * This is the manual form of what AQE's skew-join split does at
    * runtime; it exists for when the skew is known ahead of time (power-law
    * user/domain keys), for deterministic plans under replay, and for
    * engines/stages where AQE cannot rewrite (e.g. a streaming join).
    * Replication cost: `salts` copies of the SMALL side only — pick the
    * smallest `salts` that melts the straggler.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int = 16): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val salt = pmod(xxhash64(big.columns.map(big.col): _*), lit(salts))
    val bigS = big.withColumn("__salt", salt.cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, keys :+ "__salt").drop("__salt")
  }
}

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

  /** Salt in [0, salts). Default: row-position (`monotonically_increasing_id`
    * cycles within each input partition), so even bit-identical duplicate
    * rows — the classic hot-key shape, e.g. replayed events — spread over
    * all shards. A content-derived salt (xxhash64 of the whole row) maps
    * identical rows to ONE salt, keeping the straggler exactly when it
    * matters, and errors on unhashable types (MapType); request it with
    * `contentSalt = true` only when the salt assignment itself must be
    * bit-reproducible across replays (the aggregate/join RESULT is
    * salt-invariant either way).
    *
    * Trade of the positional default: `monotonically_increasing_id` is a
    * nondeterministic expression, so the map stage that computes the salt
    * is INDETERMINATE — on a shuffle fetch failure Spark must roll the
    * whole indeterminate stage back and recompute it (and aborts the job
    * if a ResultStage already consumed partial output) rather than retry
    * just the lost partitions. Pipelines where retry cost dominates (very
    * long map stages, flaky shuffle fabric) should prefer
    * `contentSalt = true`: deterministic, partition-local retries, at the
    * cost of bit-identical duplicate rows sharing one salt.
    */
  private def saltOf(df: DataFrame, salts: Int, contentSalt: Boolean): Column =
    if (contentSalt)
      pmod(xxhash64(df.columns.map(df.col): _*), lit(salts)).cast("int")
    else pmod(monotonically_increasing_id(), lit(salts)).cast("int")

  /** Salted sum: Σ valueCol per key, immune to key skew. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                salts: Int = 16, contentSalt: Boolean = false): DataFrame = {
    val salt = saltOf(df, salts, contentSalt).as("__salt")
    df.select(col("*"), salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Salted count per key. */
  def saltedCount(df: DataFrame, keys: Seq[String], salts: Int = 16,
                  contentSalt: Boolean = false): DataFrame = {
    val salt = saltOf(df, salts, contentSalt).as("__salt")
    df.select(col("*"), salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).cast("long").as("n"))
  }

  /** Salted inner equi-join for a skewed `big` side against a `small`
    * side that is too large to broadcast: `big` rows take a row-position
    * salt in [0, salts) (see [[saltOf]]); `small` replicates ×`salts` (one
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
                 salts: Int = 16, contentSalt: Boolean = false): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val bigS = big.withColumn("__salt", saltOf(big, salts, contentSalt))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, keys :+ "__salt").drop("__salt")
  }
}

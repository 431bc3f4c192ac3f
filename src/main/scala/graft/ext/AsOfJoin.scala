package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row of the same key with
  * `rightTs <= leftTs` — the point-in-time lookup every feature/training
  * pipeline needs (label leakage guard). Not in the reference (its joins are
  * key-equality only, SURVEY §2.4); Spark lacks it natively.
  *
  * The full pandas-merge_asof / kdb-aj surface: `direction` picks the
  * match side ("backward" = latest right at-or-before, the default;
  * "forward" = earliest right at-or-after — the next-event lookup), and
  * `tolerance` bounds the match distance (a stale feature row must NOT
  * match — out-of-tolerance left rows keep NULL matches, like
  * merge_asof). Ties (`leftTs == rightTs`) match in both directions,
  * the DuckDB/kdb convention.
  *
  * Implementation follows the custom-operator preference ladder at its first
  * rung — composition of built-ins: tag and union both sides, one
  * shuffle+sort per key, carry the most recent right row forward with
  * `last(_, ignoreNulls)` over the event-time order (time-reversed for
  * "forward"), keep left rows. Cost is
  * a single exchange on the key (same as any keyed join) regardless of how
  * asymmetric the sides are — no range-explosion, no per-row probes; skew on
  * the key is AQE's to handle like any other shuffle — EXCEPT inside the
  * window function, which gets one partition per key: a celebrity key
  * serializes its whole history in one task. For that case, pre-bucket by
  * (key, time-range) — run this join per coarse time bucket with the
  * right side's latest row per (key, bucket) unioned into the next bucket
  * as a seed row — before falling back to this single-window form.
  */
object AsOfJoin {

  /** @param left      probe side (each row gets the as-of match)
    * @param right     reference side (rows valid from their timestamp on)
    * @param keys      equi-join key column names (present in both sides)
    * @param leftTs    left event-time column
    * @param rightTs   right event-time column
    * @param rightVals right columns to carry (renamed as given)
    * @param direction "backward" (latest right ≤ leftTs, default),
    *                  "forward" (earliest right ≥ leftTs), or "nearest"
    *                  (whichever of the two is closer; equal distance —
    *                  including an exact-ts tie — prefers backward, the
    *                  merge_asof convention)
    * @param tolerance max |leftTs − matchedTs| as a Column of the ts
    *                  difference's type — an INTERVAL literal for
    *                  timestamp columns (`expr("INTERVAL '3' DAY")`), a
    *                  number for numeric ts. A match farther away nulls
    *                  out (no older/newer row can be closer, so "null
    *                  the out-of-range match" ≡ "no match within
    *                  tolerance").
    * Ties (`leftTs == rightTs`) match, like DuckDB/kdb as-of semantics.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           rightVals: Map[String, String],
           direction: String = "backward",
           tolerance: Option[Column] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got '$direction'")
    // All right values travel as ONE packed struct carried by a single
    // last(ignoreNulls) — the matched row's values stay atomic, so a right
    // column that is legitimately NULL is not backfilled from an older row
    // (it would be, with per-column last()), matching ASOF oracle semantics.
    // The pack's first field is the matched row's own timestamp (the
    // tolerance operand); equal-(key, ts) rows have equal __mts, so the
    // deterministic-winner tie-break below is unchanged by it.
    val rTagged = right.select(
      keys.map(col) ++
      Seq(col(rightTs).as("__ts"), lit(0).as("__isLeft")) ++
      left.columns.filterNot(c => keys.contains(c))
        .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
      struct(col(rightTs).as("__mts") +:
          rightVals.map { case (src, dst) => col(src).as(dst) }.toSeq: _*)
        .as("__rpack"): _*)
    val packType = rTagged.schema("__rpack").dataType
    val lTagged = left.select(
      keys.map(col) ++
      Seq(col(leftTs).as("__ts"), lit(1).as("__isLeft")) ++
      left.columns.filterNot(c => keys.contains(c)).map(col) :+
      lit(null).cast(packType).as("__rpack"): _*)
    // right sorts before left at equal (key, ts) → ties match the left row
    // in BOTH directions; __rpack as the final key makes the winner among
    // equal-ts right rows deterministic (struct order = lexicographic by
    // field). "forward" reverses only the time axis: traversal then visits
    // rows with ts ≥ current first, so the carried pack is the earliest
    // at-or-after right row. "nearest" computes both carries — two window
    // sorts over the SAME key partitioning, still ONE exchange — and picks
    // the closer match per row.
    def w(tsOrder: Column) = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("__isLeft").asc, col("__rpack").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val back = last(col("__rpack"), ignoreNulls = true).over(w(col("__ts").asc))
    val fwd = last(col("__rpack"), ignoreNulls = true).over(w(col("__ts").desc))
    val carry = direction match {
      case "backward" => back
      case "forward" => fwd
      case _ =>
        val bc = back
        val fc = fwd
        when(fc.isNull, bc).when(bc.isNull, fc)
          .when(col("__ts") - bc.getField("__mts") <=
                fc.getField("__mts") - col("__ts"), bc) // tie → backward
          .otherwise(fc)
    }
    val matched = lTagged.unionByName(rTagged)
      .withColumn("__c", carry)
      .where(col("__isLeft") === 1)
    val bounded = tolerance match {
      case None => matched
      case Some(tol) =>
        val dist = direction match {
          case "backward" => col("__ts") - col("__c.__mts")
          case "forward" => col("__c.__mts") - col("__ts")
          case _ => greatest(col("__ts") - col("__c.__mts"),
            col("__c.__mts") - col("__ts")) // |distance|
        }
        matched.withColumn("__c",
          when(dist <= tol, col("__c"))) // out of tolerance → NULL match
    }
    bounded.select(
      keys.map(col) ++
      Seq(col("__ts").as(leftTs)) ++
      left.columns.filterNot(c => keys.contains(c) || c == leftTs).map(col) ++
      rightVals.values.toSeq.map(n => col(s"__c.$n").as(n)): _*)
  }
}

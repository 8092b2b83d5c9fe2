package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join — for each left row, the single right row
  * with the greatest timestamp <= the left row's timestamp, per key. The
  * feature-attribution primitive of a training-data pipeline (label each
  * event with the latest prior state/price/model-version).
  *
  * Spark lacks a native ASOF join; the naive formulations are a per-row
  * correlated subquery (driver-killing) or an inequality theta-join
  * (O(n×m) per key). This is the scalable shape: UNION both sides tagged,
  * one hash-shuffle + sort per key on (ts, side) over the COMBINED
  * stream, then a running `last(payload, ignoreNulls)` carry-forward —
  * each right row's payload STRUCT flows to all later left rows until
  * superseded (one struct, so the attached columns always come from the
  * same right row). The main scan is a single exchange + sort + linear
  * pass; the right-side tie-break dedup adds its own smaller (key, ts)
  * exchange first. AQE-skew-splittable like any windowed shuffle.
  *
  * NULL semantics match the equality/inequality join they replace: right
  * rows with a null key or null timestamp can never satisfy
  * `l.key = r.key AND l.ts >= r.ts` and are dropped up front (a window
  * partition would otherwise group NULL keys together and match them).
  * Left rows always survive; null-key/null-ts left rows surface with
  * null payloads.
  *
  * Right rows sort BEFORE left rows at equal timestamps, so a right row
  * exactly at the left's timestamp matches (`<=` semantics, like DuckDB's
  * native ASOF JOIN — which is this operator's oracle).
  */
object AsOf {

  /** Left as-of join. `valueCols` are the right-side columns to attach
    * (null when no right row is at-or-before the left row). Right-side
    * duplicates on (key, ts) resolve to the row with the greatest
    * `rightTieBreak` — BOTH engines need an explicit tie rule for the
    * result to be deterministic. `valueCols` must not collide with left
    * column names. */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               valueCols: Seq[String], rightTieBreak: String): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must name at least one right-side column")
    require(valueCols.forall(!left.columns.contains(_)),
      s"valueCols ${valueCols.mkString(",")} must not collide with left columns")

    // 1. drop right rows that no equality/inequality predicate could ever
    // match (null key or null ts), then keep one survivor per (key, ts):
    // greatest tie-break wins
    val wTie = Window.partitionBy(col(key), col(ts)).orderBy(col(rightTieBreak).desc)
    val rightDedup = right
      .filter(col(key).isNotNull && col(ts).isNotNull)
      .withColumn("_rn", row_number().over(wTie)).filter(col("_rn") === 1).drop("_rn")

    // 2. tag and union; payloads travel as ONE struct per side so attached
    // columns can never mix rows
    val lRowType = StructType(left.schema.fields)
    val rPayType = StructType(valueCols.map(c => right.schema(c)).toArray)
    val rTagged = rightDedup.select(col(key), col(ts).as("_ts"), lit(0).as("_side"),
      lit(null).cast(lRowType).as("_lrow"),
      struct(valueCols.map(col): _*).as("_rpay"))
    val lTagged = left.select(col(key), col(ts).as("_ts"), lit(1).as("_side"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("_lrow"),
      lit(null).cast(rPayType).as("_rpay"))

    // 3. carry the latest right payload forward over the per-key timeline
    val wScan = Window.partitionBy(col(key))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = rTagged.unionByName(lTagged)
      .withColumn("_c", last(col("_rpay"), ignoreNulls = true).over(wScan))

    // 4. keep left rows; re-surface the left row and the matched payload
    carried.filter(col("_side") === 1)
      .select(left.columns.map(c => col(s"_lrow.$c").as(c)) ++
        valueCols.map(c => col(s"_c.$c").as(c)): _*)
  }
}

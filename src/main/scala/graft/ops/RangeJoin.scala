package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — match each point row to every interval row
  * whose [lo, hi] contains it, optionally co-keyed. The windowed-label
  * primitive (events inside promo windows, reads inside gene ranges,
  * timestamps inside sessions).
  *
  * Spark plans a raw `p.v BETWEEN i.lo AND i.hi` predicate as a
  * BroadcastNestedLoopJoin (or cartesian) — O(|points|×|intervals|)
  * comparisons regardless of selectivity, a non-starter at scale. The
  * scale shape is GRID BUCKETING: quantize the value axis into cells of
  * width `bucketWidth`; each interval replicates to the cells it covers,
  * each point lands in exactly ONE cell, and the join becomes an
  * EQUI-join on (key, cell) + a residual between-filter. Each matching
  * pair meets in exactly one cell (the point's), so no dedup pass is
  * needed. Cost: |intervals| × avg-span/width replication vs a hash join
  * — tune `bucketWidth` to the typical interval span.
  */
object RangeJoin {

  /** Co-keyed interval join: points (.. `valueCol` ..) × intervals
    * (.. `loCol`, `hiCol` ..), both sides sharing `key`. Inclusive bounds.
    * `bucketWidth` must be positive; intervals with hi < lo match nothing. */
  def byBucket(points: DataFrame, intervals: DataFrame, key: String,
               valueCol: String, loCol: String, hiCol: String,
               bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val cell = "_graft_cell"
    require(!points.columns.contains(cell) && !intervals.columns.contains(cell),
      s"inputs must not already contain a '$cell' column")
    val p = points.withColumn(cell, floor(col(valueCol) / bucketWidth))
    val i = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn(cell, explode(sequence(
        floor(col(loCol) / bucketWidth), floor(col(hiCol) / bucketWidth))))
    p.join(i, Seq(key, cell))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop(cell)
  }

  /** Interval×interval overlap join — pairs whose [lo, hi] ranges
    * intersect (inclusive), co-keyed. The session-collision / window-
    * conflict primitive that [[byBucket]] cannot express: a point lands
    * in exactly one grid cell, but two OVERLAPPING intervals share every
    * cell their intersection covers, so a naive grid join emits each
    * pair once per shared cell. The standard dedup makes the join
    * exact-once WITHOUT a distinct: emit a pair only in the FIRST cell
    * of the intersection (cell == max(⌊aLo/w⌋, ⌊bLo/w⌋) — the left edge
    * of the later-starting interval, a cell both sides provably cover).
    * The pair predicate aLo <= bHi AND bLo <= aHi runs as the residual
    * filter; everything upstream is a plain shuffled equi-join on
    * (key, cell) — codegen'd, AQE-skew-splittable, no distinct shuffle.
    *
    * Column names must be disjoint across `a` and `b` (pre-alias the
    * sides); `hi < lo` intervals match nothing on either side. */
  def overlapByBucket(a: DataFrame, b: DataFrame, key: String,
                      aLo: String, aHi: String, bLo: String, bHi: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val cell = "_graft_cell"
    Seq(a, b).foreach { d =>
      require(!d.columns.contains(cell), s"inputs must not already contain a '$cell' column")
    }
    val dupes = a.columns.toSet.intersect(b.columns.toSet) - key
    require(dupes.isEmpty, s"overlapByBucket sides share non-key columns: ${dupes.mkString(", ")}")
    val ax = a.filter(col(aLo) <= col(aHi)).withColumn(cell,
      explode(sequence(floor(col(aLo) / bucketWidth), floor(col(aHi) / bucketWidth))))
    val bx = b.filter(col(bLo) <= col(bHi)).withColumn(cell,
      explode(sequence(floor(col(bLo) / bucketWidth), floor(col(bHi) / bucketWidth))))
    ax.join(bx, Seq(key, cell))
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .filter(col(cell) === greatest(floor(col(aLo) / bucketWidth), floor(col(bLo) / bucketWidth)))
      .drop(cell)
  }
}

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
}

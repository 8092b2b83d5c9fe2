package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch — fixed-size frequency summaries for heavy-hitter
  * queries over unbounded token/key streams (Cormode & Muthukrishnan,
  * "An Improved Data Stream Summary: The Count-Min Sketch and its
  * Applications", J. Algorithms 2005).
  *
  * The sketch is a depth×width grid of BIGINT counters: each item
  * increments one counter per row (md5-derived bucket, a different seed
  * per row); a point estimate is the MIN over its depth counters —
  * always an over-estimate, off by at most ε·N with probability 1−δ
  * (w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉).
  *
  * Scale shape: the grid is d·w longs (a few KB) REGARDLESS of corpus
  * size — counters partial-aggregate map-side, the shuffle carries at
  * most d·w rows per partition, and two sketches merge by adding
  * counters (integer sums, merge-order-free — same exact-state
  * discipline as [[Hll]]). The estimate path broadcasts the probe keys,
  * never the corpus.
  */
object Cms {

  /** md5-derived bucket of `v` for sketch row `seed`: uniform in
    * [0, width), identical in Spark and the DuckDB oracle. */
  def bucketCol(v: Column, seed: Int, width: Int): Column =
    graft.util.Hash.seededBucket(v, seed, width.toLong)

  /** One (row_idx, bucket) struct per sketch row for `v`, exploded —
    * the shared grid-addressing step of both build and probe. */
  private def rowBuckets(v: Column, depth: Int, width: Int): Column =
    explode(array((0 until depth).map(s =>
      struct(lit(s).as("row_idx"), bucketCol(v, s, width).as("bucket"))): _*))

  /** Build the counter grid over `valueCol` (nulls ignored, like any
    * counting aggregate): one row per touched (row_idx, bucket) —
    * untouched counters are implicitly 0. */
  def sketch(df: DataFrame, valueCol: Column,
             depth: Int = 4, width: Int = 256): DataFrame = {
    df.select(valueCol.as("_v")).filter(col("_v").isNotNull)
      .select(rowBuckets(col("_v"), depth, width).as("rb"))
      .groupBy(col("rb.row_idx").as("row_idx"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `probes` (a small keyed frame): min over the
    * sketch rows of the probed counters. Missing counters read as 0 —
    * only possible for keys the sketch never saw. */
  def estimate(counters: DataFrame, probes: DataFrame, keyCol: String,
               depth: Int = 4, width: Int = 256): DataFrame = {
    val probed = probes
      .select(col(keyCol), rowBuckets(col(keyCol), depth, width).as("rb"))
      .select(col(keyCol), col("rb.row_idx").as("row_idx"), col("rb.bucket").as("bucket"))
    probed.join(counters, Seq("row_idx", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }
}

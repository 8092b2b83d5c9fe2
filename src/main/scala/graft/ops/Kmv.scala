package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Min-value (bottom-k by stochastic averaging / one-permutation MinHash)
  * sketch over KEYED SETS — the corpus-level companion to the per-document
  * minhash in [[Dedup]]: where that answers "are these two DOCUMENTS
  * near-duplicates", this answers "how much do these two SOURCES (or crawl
  * snapshots, or shards) overlap at the vocabulary level", the audit a
  * mixing stage runs before setting per-source weights (a mirror site and
  * its origin should not both get full weight).
  *
  * Sketch state: ONE md5-derived 60-bit hash per value; bucket = `h mod b`,
  * in-bucket rank value = `h div b` (the quotient is uniform on
  * [0, 2^60/b) and independent of the bucket), state = per-(group, bucket)
  * MIN of the rank value. This is one-permutation hashing (Li, Owen, Zhang
  * 2012, "One Permutation Hashing"): b bins of a single permutation, each
  * keeping its minimum.
  *
  * Why this shape at 100 TB: MIN is associative/commutative/idempotent, so
  * the aggregate is map-side combinable — the shuffle carries at most `b`
  * rows per group no matter the corpus size, and sketches of disjoint
  * slices (per-day crawls, per-shard partials) merge by the same MIN into
  * exactly the single-pass state, in any order. A true bottom-k KMV needs
  * a global k-smallest per group (a rank/limit that sorts the whole group);
  * stochastic averaging buys the same estimator family for one combinable
  * aggregate. Everything is integer arithmetic — the estimates are pure
  * functions of hash-exact state, replayable by an independent engine.
  */
object Kmv {

  /** 2^60 — the hash domain size; rank values live in [0, 2^60 div b). */
  val HashDomain: Long = 1L << 60

  /** Per-(group, bucket) min-value sketch of `valueCol`'s DISTINCT values:
    * (groupCols..., bucket, m). Nulls are ignored like any distinct-count
    * aggregate. Mergeable: union two sketch frames and re-take
    * `min(m) group by (group, bucket)`. */
  def minSketch(df: DataFrame, groupCols: Seq[String], valueCol: Column,
                b: Int): DataFrame = {
    require(b >= 2 && (b & (b - 1)) == 0 && b <= (1 << 20),
      s"bucket count must be a power of two in [2, 2^20], got $b")
    df.select(groupCols.map(col) :+ valueCol.as("_v"): _*)
      .filter(col("_v").isNotNull)
      .select(groupCols.map(col) :+ graft.util.Hash.md5Bits60(col("_v")).as("_h"): _*)
      .groupBy(groupCols.map(col) :+ expr(s"_h % $b").as("bucket"): _*)
      .agg(min(expr(s"_h div $b")).as("m"))
  }

  /** Merge sketch frames built with the same (groupCols, b): per
    * (group, bucket) MIN — order-free, idempotent on overlapping slices. */
  def merge(groupCols: Seq[String], frames: DataFrame*): DataFrame = {
    require(frames.nonEmpty, "nothing to merge")
    frames.reduce(_.unionByName(_))
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(min(col("m")).as("m"))
  }

  /** Distinct-cardinality card per group from the sketch: the SUMMED
    * min-value estimator (MinCount / stochastic-averaging family, Giroire
    * 2009, "Order statistics and estimating cardinalities of massive data
    * sets"). Each bucket's min of n_j uniforms on [0, R) has
    * E[min] ~= R/(n_j + 1), so SUM the minima first and invert ONCE:
    * S ~= b.R/(n/b + 1) => n ~= b.R.b/S - b — summing before inverting is
    * load-bearing (E[1/min] is heavy-tailed; a per-bucket inverse reads
    * ~4-5x high). Empty buckets contribute a full R (n_j = 0). To keep
    * b^2.R = 2^60.b inside BIGINT the minima enter the sum coarsened by
    * div b (negligible vs m ~ 2^52/n_j): with m' = m div b and
    * R' = 2^60 div b^2,  est = 2^60 div (S' + hit) - b  where
    * S' = sum(m') + (b - hit).R'. This is a monitoring estimate whose
    * error the demo row REPORTS against the exact count, not a
    * replacement for [[Hll]] when cardinality alone is wanted. Output:
    * (groupCols..., buckets_hit, est_distinct). Integer-exact. */
  def cardinalityCard(sketch: DataFrame, groupCols: Seq[String], b: Int): DataFrame = {
    val rp = HashDomain / b.toLong / b.toLong // R' = 2^60 / b^2
    sketch.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("buckets_hit"),
        sum(expr(s"m div $b")).as("_sm"))
      .withColumn("est_distinct",
        expr(s"${HashDomain}L div (_sm + ($b - buckets_hit) * ${rp}L + buckets_hit) - $b"))
      .drop("_sm")
  }

  /** Leave-one-out marginal-contribution card — the acquisition question
    * "how much NEW vocabulary does each source actually add" answered
    * from sketches alone: for every group g, the estimated cardinality of
    * the union WITHOUT g beside the full union's, their difference being
    * g's marginal contribution (Σ marginals ≤ union — overlap is counted
    * toward nobody, which is exactly what makes this the mixing-weight
    * audit: a mirror source's marginal reads ~0 however big it is).
    *
    * Scale shape: the input is the per-group SKETCH (|groups| × b rows —
    * corpus-independent); the leave-one-out unions come from ONE
    * sketch ⋈ group-list cross join filtered on inequality, grouped per
    * (excluded, bucket) MIN — every relation in sight is sketch-sized.
    * Output: (groupCols' group, est_without, est_union, est_marginal). */
  def marginalCard(sketch: DataFrame, groupCol: String, b: Int): DataFrame = {
    val groups = sketch.select(col(groupCol).as("_excl")).distinct()
    val loo = sketch.crossJoin(groups)
      .filter(col(groupCol) =!= col("_excl"))
      .groupBy(col("_excl"), col("bucket")).agg(min(col("m")).as("m"))
    // left join back to the group list: a group whose removal empties the
    // union (single-group corpus) reads est_without = 0, not a lost row
    val without = groups
      .join(cardinalityCard(loo, Seq("_excl"), b).select(col("_excl"), col("est_distinct")),
        Seq("_excl"), "left")
      .select(col("_excl").as(groupCol), coalesce(col("est_distinct"), lit(0L)).as("est_without"))
    val full = cardinalityCard(
      sketch.groupBy(col("bucket")).agg(min(col("m")).as("m")).withColumn("_all", lit(1)),
      Seq("_all"), b)
      .select(col("est_distinct").as("est_union"))
    without.crossJoin(broadcast(full))
      .withColumn("est_marginal",
        greatest(col("est_union") - col("est_without"), lit(0L)))
  }

  /** Pairwise set-similarity matrix between the groups of one sketch
    * frame (single group column): for each unordered pair (a < b) of
    * groups, the OPH Jaccard estimate = matching mins over co-occupied
    * buckets, in basis points. Empty-bucket handling: a bucket counts
    * into the denominator only when BOTH sides occupy it (the natural
    * co-occupancy estimator; at set sizes >> b the empty-bin correction
    * terms of Li et al. vanish). The join is bucket-keyed — |groups| x b
    * rows a side, never the corpus. Output:
    * (src_a, src_b, co_buckets, match_buckets, jaccard_est_bp). */
  def jaccardMatrix(sketch: DataFrame, groupCol: String): DataFrame = {
    val a = sketch.select(col(groupCol).as("src_a"), col("bucket"), col("m").as("m_a"))
    val b = sketch.select(col(groupCol).as("src_b"), col("bucket"), col("m").as("m_b"))
    a.join(b, Seq("bucket"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("co_buckets"),
        sum(when(col("m_a") === col("m_b"), 1L).otherwise(0L)).as("match_buckets"))
      .withColumn("jaccard_est_bp",
        expr("match_buckets * 10000 div co_buckets"))
  }
}

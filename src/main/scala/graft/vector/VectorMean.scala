package graft.vector

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed element-wise mean of vectors — the engine's custom-aggregate
  * (UDAF) surface. The buffer is (running sums, count): associative and
  * commutative, so Spark computes partial sums map-side and merges across
  * partitions — one k×dim-sized row per group crosses the shuffle, exactly
  * like the cents-sum convention for scalar aggregates.
  *
  * Used by [[graft.ops.Ivf.train]] for centroid updates (replacing a
  * posexplode + (cluster, dim) groupBy with a single-pass aggregate).
  */
class VectorMean(dim: Int) extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
    val (sums, n) = b
    // fail loudly on ragged embedding columns — silently truncating would
    // corrupt every centroid downstream
    require(v.length == dim,
      s"VectorMean(dim=$dim) got a vector of length ${v.length}")
    var i = 0
    while (i < dim) { sums(i) += v(i); i += 1 }
    (sums, n + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    val (sa, na) = a; val (sb, nb) = b
    var i = 0
    while (i < dim) { sa(i) += sb(i); i += 1 }
    (sa, na + nb)
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] = {
    val (sums, n) = r
    if (n == 0) sums.toSeq else sums.map(_ / n).toSeq
  }

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

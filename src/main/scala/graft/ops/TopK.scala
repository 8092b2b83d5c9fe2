package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Grouped top-k with BOUNDED aggregation state — the scale-correct form
  * of "top k rows per key".
  *
  * The standard window formulation
  * (`row_number().over(partitionBy(key).orderBy(ord)) <= k`) shuffles
  * EVERY row to its key's partition and fully sorts each key's rows —
  * O(n) exchange and O(n log n) sort for an output of size keys×k. This
  * operator instead runs a typed [[Aggregator]] whose buffer is a
  * bounded min-heap of size k: partials combine map-side, so the
  * exchange carries at most keys×k rows per input partition and nothing
  * is ever fully sorted (the classic TeraSort-style partial top-k; the
  * same shape Spark uses internally for global `orderBy().limit()` in
  * TakeOrderedAndProject, applied per key).
  *
  * Ordering is (ord DESC, id ASC) over exact integers — deterministic
  * under any partition merge order, so results are engine-replayable. */
object TopK {

  /** Bounded buffer of (ord, id) keeping the k strongest by
    * (ord DESC, id ASC). The buffer is a plain k-array with a linear
    * replace-weakest scan — for the small k this operator targets, the
    * O(k) scan beats a heap's allocation/sift overhead, and the selection
    * (a set, not a sequence) is merge-order-free either way; ordering is
    * imposed once in finish(). */
  private final class HeapAgg(k: Int)
    extends Aggregator[(Long, Long), Array[(Long, Long)], Seq[(Long, Long)]] {
    // entries are (ord, id); "weaker" = lower ord, then HIGHER id
    private def weaker(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 < b._1 || (a._1 == b._1 && a._2 > b._2)

    override def zero: Array[(Long, Long)] = Array.empty

    override def reduce(buf: Array[(Long, Long)], v: (Long, Long)): Array[(Long, Long)] =
      if (buf.length < k) buf :+ v
      else {
        // replace the weakest entry if v beats it
        var wi = 0
        var i = 1
        while (i < buf.length) { if (weaker(buf(i), buf(wi))) wi = i; i += 1 }
        if (weaker(buf(wi), v)) { buf(wi) = v; buf } else buf
      }

    override def merge(a: Array[(Long, Long)], b: Array[(Long, Long)]): Array[(Long, Long)] =
      b.foldLeft(a)(reduce)

    override def finish(r: Array[(Long, Long)]): Seq[(Long, Long)] =
      // strongest first, via the same comparator as selection — NOT
      // sortBy(-ord), which overflows at ord = Long.MinValue
      r.sortWith((a, b) => weaker(b, a)).toSeq

    override def bufferEncoder: Encoder[Array[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Long)]]()
    override def outputEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
  }

  /** Top `k` rows per `keyCol` by (`ordCol` DESC, `idCol` ASC), both read
    * as longs. Rows where any of the three columns is null (or casts to
    * null) are DROPPED — the typed buffer has no null slot; derive a real
    * key/ordinal first if nulls carry meaning. Returns
    * (keyCol, idCol, ordCol, rank) exploded back to rows — never an
    * array column. */
  def topKPerKey(df: DataFrame, keyCol: String, idCol: String, ordCol: String,
                 k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new HeapAgg(k).toColumn
    val packed = df
      .select(col(keyCol).cast("long"), col(ordCol).cast("long"), col(idCol).cast("long"))
      .na.drop()
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, ord, id) => (ord, id) }
      .agg(agg.name("top"))
    packed.toDF(keyCol, "top")
      .select(col(keyCol), posexplode(col("top")).as(Seq("_pos", "_e")))
      .select(col(keyCol), col("_e._2").as(idCol), col("_e._1").as(ordCol),
        (col("_pos") + 1).cast("int").as("rank"))
  }
}

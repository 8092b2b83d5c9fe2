package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining: assign token-counted chunks to
  * fixed-budget training sequences, concat-then-chunk style — the
  * cumulative token offset of each chunk (within a deterministic order)
  * decides its sequence id and offset, and a chunk straddling a boundary
  * is split downstream exactly as real packing pipelines do.
  *
  * This is the SCALABLE packing formulation: one window cumsum per group
  * (shuffle + sort on the group key), no sequential driver-side fold.
  * First-fit/best-fit bin packing trades that single pass for a
  * sequential scan with no exact distributed form; concat-then-chunk is
  * what large pretraining runs actually use (no padding waste either).
  */
object Packing {

  /** Per (group, ordered chunk): `seq_id` = which budget-sized training
    * sequence this chunk starts in; `seq_offset` = its token offset within
    * that sequence. Order must be a deterministic total order within each
    * group for the assignment to be reproducible. */
  def packOffsets(df: DataFrame, groupCol: String, orderCols: Seq[String],
                  nTokensCol: String, budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    Seq("seq_id", "seq_offset", "_cum_before").foreach(c =>
      require(!df.columns.contains(c), s"input must not already contain a '$c' column"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("_cum_before", coalesce(sum(col(nTokensCol)).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"_cum_before div ${budget}L"))
      .withColumn("seq_offset", expr(s"_cum_before % ${budget}L"))
      .drop("_cum_before")
  }
}

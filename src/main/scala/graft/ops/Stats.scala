package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact corpus statistics operators.
  *
  * `quantilesDisc` computes EXACT discrete quantiles (type-1 / lower
  * nearest-rank: the value at position ⌈q·n⌉ of the sorted group) with one
  * shuffle on the group key — no approx_percentile sketch, no collect to
  * the driver. Discrete quantiles are engine-portable (the selected value
  * is a real data value, so there is no interpolation arithmetic to drift
  * between engines) and a window partition holds one GROUP, not the
  * corpus; for percentiles over a single giant group, pre-aggregate to
  * (value, count) first and rank the run-length-encoded stream instead.
  *
  * Tie handling: row_number over (value) is nondeterministic among equal
  * values, but the SELECTED value at any fixed rank is invariant under
  * that reordering — equal values are interchangeable — so the result is
  * deterministic even though the row numbering isn't.
  */
object Stats {

  /** Per-group discrete quantiles of `valueCol`. `qsBp` are quantiles in
    * basis points (5000 = median). Returns (groupCols..., q_bp, value),
    * one row per group × quantile; null values are ignored (SQL aggregate
    * semantics), all-null/empty groups are absent. */
  def quantilesDisc(df: DataFrame, groupCols: Seq[String], valueCol: Column,
                    qsBp: Seq[Int] = Seq(5000, 9000, 9900)): DataFrame = {
    require(qsBp.nonEmpty && qsBp.forall(q => q > 0 && q <= 10000),
      s"quantiles must be in (0, 10000] bp, got $qsBp")
    val gcols = groupCols.map(col)
    val w = Window.partitionBy(gcols: _*).orderBy(col("_v"))
    val wn = Window.partitionBy(gcols: _*)
    val ranked = df.select(gcols :+ valueCol.as("_v"): _*)
      .filter(col("_v").isNotNull)
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(wn))
    // explode the quantile list AFTER the window: a projection+filter, no
    // extra shuffle; ⌈q·n⌉ in pure integer arithmetic (no float rank)
    ranked
      .withColumn("q_bp", explode(typedLit(qsBp.sorted)))
      .filter(col("_rn") === expr("(_n * q_bp + 9999) div 10000"))
      .select(gcols ++ Seq(col("q_bp"), col("_v").as("value")): _*)
  }
}

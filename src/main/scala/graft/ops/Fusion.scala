package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval (north-star extension): merge a
  * lexical ranked list (BM25) and a vector ranked list (kNN/ANN) into one
  * result by RECIPROCAL RANK FUSION —
  * `rrf(d) = Σ_lists floor(scale / (k0 + rank_list(d)))` (Cormack et al.'s
  * RRF with k0=60). RRF consumes only RANKS, never raw scores, which is
  * why it is the standard hybrid fusion: BM25 odds-scores and cosine
  * similarities live in incomparable spaces and need no calibration.
  * Integer arithmetic (exact long division) so the DuckDB oracle replays
  * the fusion bit-for-bit.
  */
object Fusion {

  /** Fuse two ranked lists `(idCol, rankCol)` by RRF. Full-outer on the
    * id: a document present in only one list still scores from that list
    * (the absent list contributes 0) — dropping single-list hits would
    * defeat the point of hybrid retrieval. The unpartitioned rank window
    * is deliberate: fusion runs over two TOP-K lists (bounded, two
    * broadcastable relations), never over corpora — generate the inputs
    * with the bounded retrieval operators ([[Bm25.search]],
    * [[graft.vector.VectorOps.knnCosine]], the ANN paths). */
  def reciprocalRankFusion(a: DataFrame, b: DataFrame, idCol: String,
                           rankCol: String = "rank",
                           k0: Int = 60, scale: Long = 1000000L): DataFrame = {
    // reserved-name guards (the Sampling.tokenBudgetPerKey convention): the
    // output/temp columns would silently clobber the join key or each other.
    // rankCol gets the same check for symmetry — it is aliased away
    // immediately, but a rankCol literally named "_ra"/"_rb"/"rrf_score"
    // reads as a caller mistake worth refusing loudly.
    require(!Set("rank", "rrf_score", "_ra", "_rb").contains(idCol),
      s"idCol '$idCol' collides with reciprocalRankFusion output/internal column names")
    require(!Set("rrf_score", "_ra", "_rb").contains(rankCol),
      s"rankCol '$rankCol' collides with reciprocalRankFusion output/internal column names")
    require(rankCol != idCol, s"rankCol and idCol are both '$idCol'")
    val left = a.select(col(idCol), col(rankCol).as("_ra"))
    val right = b.select(col(idCol), col(rankCol).as("_rb"))
    left.join(right, Seq(idCol), "full_outer")
      .withColumn("rrf_score",
        coalesce(expr(s"${scale}L div ($k0 + _ra)"), lit(0L)) +
          coalesce(expr(s"${scale}L div ($k0 + _rb)"), lit(0L)))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf_score").desc, col(idCol))))
      .select(col(idCol), col("rrf_score"), col("rank"))
  }
}

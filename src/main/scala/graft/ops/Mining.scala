package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hard-negative mining for embedding-model training data — the
  * contrastive-pair construction step of the 2023-25 retrieval-model
  * recipes (DPR's in-batch negatives hardened ANCE-style: negatives come
  * from the CURRENT index's nearest non-positives, not from random
  * sampling, because random negatives are too easy to carry gradient).
  *
  * Composition over invention: candidates are the IVF-probed,
  * exact-cosine-rescored neighbor set ([[Ivf.probedRescored]], the same
  * pass ann_ivf's search ranks), and "hard negative" is a pure relational
  * predicate over it — a different-labeled neighbor, similar enough to be
  * confusable but below the near-duplicate band (a too-similar
  * cross-label pair is a LABEL ERROR or an unflagged duplicate, and
  * training on it as a negative teaches the model to split twins — the
  * standard false-negative trap this band guards against).
  *
  * Scale shape: the query set is an explicit bounded batch (training
  * mines negatives per batch against the frozen index — |Q| is a
  * training-loop constant, not a corpus fraction), so cost is
  * |Q| × nprobe × cell-size = linear in the corpus at fixed Q, and the
  * output is ≤ |Q|·k rows. The codebook is driver-resident (k·dim longs,
  * the Ivf broadcast contract); the only corpus-wide work is the assign
  * pass and the per-probed-cell rescore join.
  */
object Mining {

  /** `(query_id, neg_id, neg_label, rank, sim_bp)`: for each query, the
    * top-`k` different-labeled neighbors from its `nprobe` IVF cells with
    * cosine in `[hardBp, dupBp)` basis points — closest-first (the
    * hardest usable negatives), near-duplicate band excluded. `sim_bp` is
    * `floor(cos·10000)` (the dedup_semantic verify arithmetic), and the
    * ranking runs on the INTEGER bp with `neg_id` tiebreak so the order
    * replays bit-exactly in any engine. */
  def hardNegatives(emb: DataFrame, idCol: String, vecCol: String, labelCol: String,
                    model: Ivf.Model, queryIds: Seq[Long], k: Int,
                    dupBp: Long = 9800L, hardBp: Long = 0L, nprobe: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(hardBp < dupBp, s"hard band must sit below the dup band, got [$hardBp, $dupBp)")
    val cands = Ivf.probedRescored(emb, idCol, vecCol, model, queryIds, nprobe)
      .withColumn("sim_bp", floor(col("sim") * 10000).cast("long"))
    val qLabels = broadcast(
      emb.filter(col(idCol).isin(queryIds: _*))
        .select(col(idCol).cast("long").as("query_id"), col(labelCol).as("_qlabel")))
    val nLabels = emb.select(col(idCol).cast("long").as("neighbor_id"),
      col(labelCol).as("neg_label"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_bp").desc, col("neighbor_id"))
    cands.join(qLabels, "query_id")
      .join(nLabels, "neighbor_id")
      .filter(col("neg_label") =!= col("_qlabel") &&
        col("sim_bp") >= hardBp && col("sim_bp") < dupBp)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id").as("neg_id"),
        col("neg_label"), col("rank"), col("sim_bp"))
  }
}

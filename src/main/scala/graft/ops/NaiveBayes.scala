package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over hashed bigram features — the classifier
  * tier of a curation stack (domain labeling, source attribution, quality
  * routing): train per-class bucket counts on a labeled corpus, score
  * held-out documents with additive log-likelihoods, emit argmax labels.
  * The relational form of the fastText-style linear baseline every
  * data-mixing paper reaches for first.
  *
  * Parity contract: like [[Dsir]], all log-domain weights are exact
  * fixed-point log2 integers ([[Dsir.ilog2qSql]]), so scores — and
  * therefore argmax labels — replay bit-for-bit in the oracle.
  *
  * Scale shape: the model is a (classes × buckets) count table — bounded
  * by `Buckets`·|classes| rows regardless of corpus size, built with one
  * map-side-combined aggregation. Scoring joins the document bigram
  * stream to the broadcast weight table on (bucket), fanning out one row
  * per matching class (the standard NB scoring join; for very wide class
  * sets, pivot the weights to a per-bucket map column and the fan-out
  * becomes a map-only lookup). The argmax is a per-document window —
  * document-cardinality keys, no skew. */
object NaiveBayes {

  /** Per-(class, bucket) occurrence counts — the feature half of the
    * trainable state. */
  def train(docs: DataFrame, classCol: String, textCol: String): DataFrame = {
    val bg = docs.select(col(classCol).as("_cls"),
      explode(Dsir.bigramsCol(col(textCol))).as("_g"))
      .withColumn("_b", graft.util.Hash.seededBucket(col("_g"), Dsir.Seed, Dsir.Buckets))
    bg.groupBy(col("_cls"), col("_b")).agg(count(lit(1)).as("n_cb"))
  }

  /** Per-class document counts — the prior half of the state. Training
    * from the SAME labeled slice as [[train]] keeps the two halves
    * consistent. */
  def trainPriors(docs: DataFrame, classCol: String): DataFrame =
    docs.groupBy(col(classCol).as("_cls")).agg(count(lit(1)).as("n_docs"))

  /** Score + classify `docs` against a trained model: per document, the
    * class maximizing `ilog2q(n_docs_c+1) + Σ_bigrams ilog2q(n_cb+1)
    * − n_bigrams·ilog2q(n_c+B)` — log-prior plus multinomial
    * log-likelihood in 2^-10 log2 units (the per-class normalizer enters
    * once per bigram, so it multiplies by the doc's bigram count).
    * Documents with no bigrams reduce to the prior-argmax (ties by class
    * name). Returns (idCol, true class col, predicted). */
  def classify(model: DataFrame, priors: DataFrame, docs: DataFrame,
               idCol: String, classCol: String, textCol: String): DataFrame = {
    // class totals + the class list, derived from the model itself; the
    // log-prior joins in from the document-count half of the state
    val totals = model.groupBy(col("_cls"))
      .agg(sum(col("n_cb")).as("n_c"))
      .withColumn("_nt", col("n_c") + Dsir.Buckets)
      .select(col("_cls"), expr(Dsir.ilog2qSql("_nt", duck = false)).as("norm_q"))
      .join(priors.withColumn("_np", col("n_docs") + 1L)
        .select(col("_cls"), expr(Dsir.ilog2qSql("_np", duck = false)).as("prior_q")),
        Seq("_cls"))
    val weights = model
      .withColumn("_n1", col("n_cb") + 1L)
      .select(col("_cls"), col("_b"), expr(Dsir.ilog2qSql("_n1", duck = false)).as("w_q"))

    val bg = docs.select(col(idCol), col(classCol),
      explode_outer(Dsir.bigramsCol(col(textCol))).as("_g"))
      .withColumn("_b", when(col("_g").isNotNull,
        graft.util.Hash.seededBucket(col("_g"), Dsir.Seed, Dsir.Buckets)))

    // fan out each bigram to the classes whose buckets saw it; unseen
    // (class, bucket) pairs contribute the +1-smoothing floor ilog2q(1)=0,
    // so they can be OMITTED from the sum entirely — only the normalizer
    // (which applies to every bigram × class) needs the full fan-out
    val hits = bg.filter(col("_b").isNotNull)
      .join(broadcast(weights), Seq("_b"))
      .groupBy(col(idCol), col("_cls")).agg(sum(col("w_q")).as("hit_q"))
    val nBigrams = bg.groupBy(col(idCol), col(classCol))
      .agg(count(col("_b")).as("n_bg"))
    val classes = broadcast(totals)
    val scored = nBigrams.crossJoin(classes)
      .join(hits, Seq(idCol, "_cls"), "left")
      .withColumn("score_q",
        col("prior_q") + coalesce(col("hit_q"), lit(0L)) - col("n_bg") * col("norm_q"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_q").desc, col("_cls"))
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(idCol), col(classCol), col("_cls").as("predicted"))
  }

  /** (true class, predicted, n): the held-out confusion matrix. */
  def confusion(model: DataFrame, priors: DataFrame, docs: DataFrame,
                idCol: String, classCol: String, textCol: String): DataFrame =
    classify(model, priors, docs, idCol, classCol, textCol)
      .groupBy(col(classCol), col("predicted"))
      .agg(count(lit(1)).as("n"))
}

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
  * by `buckets`·|classes| rows regardless of corpus size, built with one
  * map-side-combined aggregation. [[classify]] joins the document bigram
  * stream to the broadcast weight table on (bucket), fanning out one row
  * per matching class plus a docs×classes crossJoin for the normalizer —
  * the standard NB scoring join, right for a handful of routing labels.
  * For wide class sets use [[classifyMap]]: weights pivot to a per-bucket
  * `{class → w_q}` map and scoring is a map-only lookup with an in-row
  * argmax — no docs×classes materialization anywhere. The two are
  * label-identical (NaiveBayesSpec pins equality on 26 classes). */
object NaiveBayes {

  /** Per-(class, bucket) occurrence counts — the feature half of the
    * trainable state. `buckets` sizes the hashed feature space (see the
    * sizing note on [[Dsir.Buckets]]); scoring MUST pass the same value
    * the model was trained with. */
  def train(docs: DataFrame, classCol: String, textCol: String,
            buckets: Long = Dsir.Buckets): DataFrame = {
    require(buckets > 0, s"train: buckets must be positive, got $buckets")
    val bg = docs.select(col(classCol).as("_cls"),
      explode(Dsir.bigramsCol(col(textCol))).as("_g"))
      .withColumn("_b", graft.util.Hash.seededBucket(col("_g"), Dsir.Seed, buckets))
    bg.groupBy(col("_cls"), col("_b")).agg(count(lit(1)).as("n_cb"))
  }

  /** Per-class document counts — the prior half of the state. Training
    * from the SAME labeled slice as [[train]] keeps the two halves
    * consistent. */
  def trainPriors(docs: DataFrame, classCol: String): DataFrame =
    docs.groupBy(col(classCol).as("_cls")).agg(count(lit(1)).as("n_docs"))

  /** Class totals + the class list, derived from the model itself; the
    * log-prior joins in from the document-count half of the state.
    * (`_cls`, `norm_q`, `prior_q`), one row per class. */
  private def classTotals(model: DataFrame, priors: DataFrame, buckets: Long): DataFrame =
    model.groupBy(col("_cls"))
      .agg(sum(col("n_cb")).as("n_c"))
      .withColumn("_nt", col("n_c") + buckets)
      .select(col("_cls"), expr(Dsir.ilog2qSql("_nt", duck = false)).as("norm_q"))
      .join(priors.withColumn("_np", col("n_docs") + 1L)
        .select(col("_cls"), expr(Dsir.ilog2qSql("_np", duck = false)).as("prior_q")),
        Seq("_cls"))

  /** One row per document bigram (null-bucket row for bigram-free docs). */
  private def bigramBuckets(docs: DataFrame, idCol: String, classCol: String,
                            textCol: String, buckets: Long): DataFrame =
    docs.select(col(idCol), col(classCol),
      explode_outer(Dsir.bigramsCol(col(textCol))).as("_g"))
      .withColumn("_b", when(col("_g").isNotNull,
        graft.util.Hash.seededBucket(col("_g"), Dsir.Seed, buckets)))

  /** Score + classify `docs` against a trained model: per document, the
    * class maximizing `ilog2q(n_docs_c+1) + Σ_bigrams ilog2q(n_cb+1)
    * − n_bigrams·ilog2q(n_c+B)` — log-prior plus multinomial
    * log-likelihood in 2^-10 log2 units (the per-class normalizer enters
    * once per bigram, so it multiplies by the doc's bigram count).
    * Documents with no bigrams reduce to the prior-argmax (ties by class
    * name). Returns (idCol, true class col, predicted). */
  /** The full (doc, true class, candidate class, score_q) relation —
    * [[classify]]'s argmax and [[prCurve]]'s threshold sweep both consume
    * it; one scoring pass either way. */
  def scores(model: DataFrame, priors: DataFrame, docs: DataFrame,
             idCol: String, classCol: String, textCol: String,
             buckets: Long = Dsir.Buckets): DataFrame = {
    val totals = classTotals(model, priors, buckets)
    val weights = model
      .withColumn("_n1", col("n_cb") + 1L)
      .select(col("_cls"), col("_b"), expr(Dsir.ilog2qSql("_n1", duck = false)).as("w_q"))

    val bg = bigramBuckets(docs, idCol, classCol, textCol, buckets)

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
    nBigrams.crossJoin(classes)
      .join(hits, Seq(idCol, "_cls"), "left")
      .withColumn("score_q",
        col("prior_q") + coalesce(col("hit_q"), lit(0L)) - col("n_bg") * col("norm_q"))
  }

  def classify(model: DataFrame, priors: DataFrame, docs: DataFrame,
               idCol: String, classCol: String, textCol: String,
               buckets: Long = Dsir.Buckets): DataFrame = {
    val scored = scores(model, priors, docs, idCol, classCol, textCol, buckets)
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_q").desc, col("_cls"))
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(idCol), col(classCol), col("_cls").as("predicted"))
  }

  /** One-vs-rest calibration sweep for `targetClass` — the curve a data
    * team reads to SET a quality-filter threshold ([[confusion]] only
    * reports the argmax operating point; production filters run at a
    * CHOSEN precision/recall trade instead). The decision statistic is
    * the argmax rule's own margin, score(target) − best rival score
    * (margin > 0 ⟺ the argmax would predict the target), quantized into
    * `bandWidth`-wide integer bands with an explicit floor (Spark `div`
    * truncates toward zero while DuckDB `//` floors — NEGATIVE margins
    * would silently band differently, so both engines run the same
    * non-negative-operand CASE). Per occupied band, from the top down:
    * cumulative TP/FP and precision/recall in bp — the operating point
    * of "keep docs with margin ≥ band·width".
    *
    * Scale shape: one scoring pass (the [[scores]] relation), one
    * doc-keyed margin collapse, then a |bands|-row grouped aggregate and
    * an unpartitioned cumulative window over THOSE — lattice-sized
    * state, the privacy-family discipline; the corpus is never globally
    * sorted. */
  def prCurve(model: DataFrame, priors: DataFrame, docs: DataFrame,
              idCol: String, classCol: String, textCol: String,
              targetClass: String, bandWidth: Long = 4096L, // 4 ilog2q log2 units
              buckets: Long = Dsir.Buckets): DataFrame = {
    require(bandWidth >= 1L, s"bandWidth must be >= 1, got $bandWidth")
    val sc = scores(model, priors, docs, idCol, classCol, textCol, buckets)
    val margins = sc.groupBy(col(idCol))
      .agg(
        max(when(col("_cls") === targetClass, col("score_q"))).as("_sc"),
        max(when(col("_cls") =!= targetClass, col("score_q"))).as("_so"),
        max(when(col(classCol) === targetClass, 1L).otherwise(0L)).as("_pos"))
      .filter(col("_sc").isNotNull && col("_so").isNotNull)
      .select(col(idCol), (col("_sc") - col("_so")).as("_m"), col("_pos"))
    val bands = margins.withColumn("band", expr(
      s"CASE WHEN _m >= 0 THEN _m div $bandWidth ELSE -(((-_m) + $bandWidth - 1) div $bandWidth) END"))
    val perBand = bands.groupBy(col("band"))
      .agg(sum(col("_pos")).as("n_pos"), sum(lit(1L) - col("_pos")).as("n_neg"))
    val totals = margins.agg(sum(col("_pos")).as("_np"))
    val wDesc = Window.orderBy(col("band").desc)
    perBand
      .withColumn("tp", sum(col("n_pos")).over(wDesc))
      .withColumn("fp", sum(col("n_neg")).over(wDesc))
      .crossJoin(broadcast(totals))
      .select(col("band"), (col("band") * bandWidth).as("threshold_q"),
        col("tp"), col("fp"),
        expr("10000 * tp div (tp + fp)").as("precision_bp"),
        expr("10000 * tp div greatest(_np, 1L)").as("recall_bp"))
  }

  /** Wide-class scoring: identical labels to [[classify]] (pinned by
    * NaiveBayesSpec on 26+ classes) with a docs×classes-free plan. The
    * fan-out form's `nBigrams.crossJoin(classes)` materializes
    * |docs|·|classes| rows before the argmax — fine for a handful of
    * routing labels, hostile at hundreds of domain classes over 100 TB.
    * Here the weights pivot to a per-BUCKET map column `{class → w_q}`
    * (≤ `buckets` rows regardless of class count, broadcast), each bigram
    * does one map lookup, per-doc maps merge with `map_zip_with` inside a
    * single doc-keyed aggregation, and the argmax runs INSIDE the row via
    * `aggregate` over the collected class list — so the widest thing that
    * ever shuffles is one map per document, and no window is needed.
    * Class metadata (prior/norm) rides in as an array literal: a bounded
    * model artifact (|classes| rows), same collect contract as the IVF
    * codebook. Tie-break matches [[classify]]: max score, then min class
    * name. */
  def classifyMap(model: DataFrame, priors: DataFrame, docs: DataFrame,
                  idCol: String, classCol: String, textCol: String,
                  buckets: Long = Dsir.Buckets): DataFrame = {
    import org.apache.spark.sql.Row
    val clsMeta: Array[(String, Long, Long)] =
      classTotals(model, priors, buckets).collect()
        .map { case Row(c: String, n: Long, p: Long) => (c, n, p) }
        .sortBy(_._1)
    // (class, prior_q, norm_q) literal array — sorted by class name so the
    // in-row argmax scan resolves ties to the FIRST (min) class, matching
    // the window form's (score desc, class asc) ordering
    val clsArr = array(clsMeta.map { case (c, n, p) =>
      struct(lit(c).as("c"), lit(p).as("pq"), lit(n).as("nq"))
    }: _*)

    val wmap = model
      .withColumn("_n1", col("n_cb") + 1L)
      .withColumn("w_q", expr(Dsir.ilog2qSql("_n1", duck = false)))
      .groupBy(col("_b"))
      .agg(map_from_entries(array_sort(collect_list(struct(col("_cls"), col("w_q")))))
        .as("_wm"))

    val bg = bigramBuckets(docs, idCol, classCol, textCol, buckets)
    val perDoc = bg
      .join(broadcast(wmap), Seq("_b"), "left")
      .groupBy(col(idCol), col(classCol))
      .agg(count(col("_b")).as("n_bg"),
        collect_list(col("_wm")).as("_wms"))
      // merge the per-bigram hit maps: class → Σ w_q over this doc's bigrams
      .withColumn("_hm", aggregate(col("_wms"),
        expr("cast(map() as map<string,bigint>)"),
        (acc, m) => map_zip_with(acc, m,
          (_, a, b) => coalesce(a, lit(0L)) + coalesce(b, lit(0L)))))
      .drop("_wms")

    // in-row argmax over the class list: score(c) = prior + hits − n_bg·norm
    val best = aggregate(clsArr,
      struct(lit(null).cast("string").as("c"), lit(Long.MinValue).as("s")),
      (acc, e) => {
        val s = e.getField("pq") +
          coalesce(element_at(col("_hm"), e.getField("c")), lit(0L)) -
          col("n_bg") * e.getField("nq")
        when(s > acc.getField("s"), struct(e.getField("c").as("c"), s.as("s")))
          .otherwise(acc)
      })
    perDoc.withColumn("_best", best)
      .select(col(idCol), col(classCol), col("_best").getField("c").as("predicted"))
  }

  /** (true class, predicted, n): the held-out confusion matrix. */
  def confusion(model: DataFrame, priors: DataFrame, docs: DataFrame,
                idCol: String, classCol: String, textCol: String,
                buckets: Long = Dsir.Buckets): DataFrame =
    classify(model, priors, docs, idCol, classCol, textCol, buckets)
      .groupBy(col(classCol), col("predicted"))
      .agg(count(lit(1)).as("n"))
}

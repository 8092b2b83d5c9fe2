package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection with importance resampling (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling",
  * NeurIPS 2023): score every raw document by how much more likely its
  * hashed-bigram features are under a target-domain unigram-of-bigrams
  * model than under the raw-corpus model, then keep the top scorers.
  * This is the standard pretraining-curation move for "give me more data
  * that looks like THIS slice" — the reference corpus here is the
  * `documents` table and the target slice a set of sources.
  *
  * Scale shape (the paper's own two-pass structure, re-expressed
  * relationally): pass 1 streams the corpus once and aggregates bucket
  * counts to a FIXED 8192-row table (map-side combine into 8192 keys —
  * the shuffle is constant-size no matter the corpus); pass 2 re-streams
  * the corpus, broadcast-joins the 8192-row weight table, and aggregates
  * per-document scores (one shuffle on doc id). No driver-side loop, no
  * vocabulary blow-up: the hashed feature space caps state at `Buckets`
  * regardless of corpus size, which is exactly why DSIR hashes.
  *
  * Parity contract: importance weights are log-likelihood ratios, and
  * logs don't replay bit-for-bit across engines — so the weight lives in
  * an exact fixed-point log2 domain instead. `ilog2q(n)` (see
  * [[Dsir.ilog2qSql]]) = `e·1024 + ((n·1024) >> e) − 1024` with
  * `e = floor(log2 n)` taken from the length of the binary string: the
  * classic exponent-plus-linear-mantissa integer log2 (max error vs true
  * log2 ≈ 0.086, monotone, pure integer arithmetic). The SAME generated
  * fragment (modulo shift-operator spelling) runs in Spark and DuckDB, so
  * per-bucket weights — and therefore every score — are integers both
  * engines agree on exactly.
  */
object Dsir {

  /** Default hashed feature space size. 2^13 buckets holds per-bucket
    * counts in the thousands at test SFs (smoothing stays meaningful)
    * while keeping the weight table broadcast-trivial; the paper uses
    * 10^4-ish.
    *
    * Corpus-scale sizing: per-bucket counts grow linearly with the corpus,
    * and once the average count dwarfs the +1 Laplace term the smoothing
    * stops regularizing rare buckets — at 100 TB (~10^11 bigrams) prefer
    * 2^17–2^20 buckets so collisions stay rare and smoothing stays
    * meaningful. Every model function below takes `buckets` as a
    * parameter (the [[Dedup.bucketCandidatePairsAuto]] pattern); the ONLY
    * constraint is that scoring must use the same count the weights were
    * built with — the bucket id is `hash(bigram) mod buckets`, so a
    * mismatch silently mis-buckets every feature. */
  val Buckets = 8192L

  /** Seed for the bucket hash ([[graft.util.Hash.seededBucket]] family). */
  val Seed = 7

  /** Fixed-point log2 with 10 fractional bits over a POSITIVE integer SQL
    * expression `x`: `(e·1024 + ((x·1024) >> e) − 1024)` where
    * `e = length(bin(x)) − 1 = floor(log2 x)`. One derivation for both
    * dialects; only the shift spelling differs (DuckDB has the `>>`
    * operator but no `shiftright` function, Spark the reverse). Exact,
    * monotone, and branch-free — callers must guarantee `x ≥ 1` (all uses
    * here are `count + 1` Laplace forms). */
  def ilog2qSql(x: String, duck: Boolean): String = {
    val e = s"(length(bin($x)) - 1)"
    val m = if (duck) s"((($x) * 1024) >> $e)" else s"shiftright(($x) * 1024, $e)"
    s"($e * 1024 + $m - 1024)"
  }

  private def ilog2q(colName: String): Column = expr(ilog2qSql(colName, duck = false))

  /** Lower-cased whitespace bigrams of `textCol`, empty tokens dropped
    * BEFORE pairing (so adjacency is over real words). The slice/zip_with
    * form needs no size guard: both slices are empty for 0- and 1-token
    * documents. */
  def bigramsCol(textCol: Column): Column = {
    val toks = filter(Dedup.tokensCol(textCol), t => t =!= lit(""))
    // Spark's slice rejects negative lengths, so clamp the 0-token case
    // (empty text tokenizes to [] after the filter) up to length 0.
    val n1 = greatest(size(toks) - 1, lit(0))
    zip_with(
      slice(toks, lit(1), n1),
      slice(toks, lit(2), n1),
      (a, b) => concat(a, lit(" "), b))
  }

  /** The shared bigram-occurrence stream: one row per bigram (plus one
    * null-bucket row per bigram-free document, so downstream grouping
    * keeps every doc). `carryCols` are extra document columns carried
    * through to the scored output (beyond `idCol`) — they must exist on
    * `docs`, checked eagerly so a missing column fails here with a clear
    * message instead of as an unresolved-column error deep in the plan. */
  private def bigramStream(docs: DataFrame, idCol: String, textCol: String,
                           isTarget: Column, carryCols: Seq[String],
                           buckets: Long): DataFrame = {
    val missing = (idCol +: textCol +: carryCols).filterNot(docs.columns.contains)
    require(missing.isEmpty,
      s"bigramStream: docs lacks column(s) ${missing.mkString(", ")} " +
        s"(have: ${docs.columns.mkString(", ")})")
    docs
      .select(col(idCol) +: carryCols.map(col) :+ isTarget.as("_tgt") :+
        explode_outer(bigramsCol(col(textCol))).as("_g"): _*)
      .withColumn("_b", when(col("_g").isNotNull,
        graft.util.Hash.seededBucket(col("_g"), Seed, buckets)))
  }

  /** Pass 1 — the persistable model: (`_b`, `lrq`) per observed bucket,
    * `lrq` the Laplace-smoothed target-vs-raw likelihood ratio
    * `((tgt_b+1)/(tgt_tot+B)) / ((raw_b+1)/(raw_tot+B))` taken apart into
    * four exact ilog2q terms. Constant-size state (≤ `Buckets` rows,
    * map-side combined) no matter the corpus — this is the table
    * [[writeWeights]] persists so crawl increments score without ever
    * re-streaming the corpus. */
  def bucketWeights(docs: DataFrame, idCol: String, textCol: String,
                    isTarget: Column, buckets: Long = Buckets): DataFrame = {
    require(buckets > 0, s"bucketWeights: buckets must be positive, got $buckets")
    val counts = bigramStream(docs, idCol, textCol, isTarget, Nil, buckets)
      .filter(col("_b").isNotNull)
      .groupBy(col("_b"))
      .agg(count(lit(1)).as("raw_b"),
        sum(when(col("_tgt"), 1L).otherwise(0L)).as("tgt_b"))
    val totals = counts.agg(sum(col("raw_b")).as("raw_tot"), sum(col("tgt_b")).as("tgt_tot"))
    counts.crossJoin(broadcast(totals))
      .withColumn("_t1", col("tgt_b") + 1L)
      .withColumn("_r1", col("raw_b") + 1L)
      .withColumn("_tt", col("tgt_tot") + buckets)
      .withColumn("_rt", col("raw_tot") + buckets)
      .select(col("_b"),
        (ilog2q("_t1") - ilog2q("_tt") - ilog2q("_r1") + ilog2q("_rt")).as("lrq"))
  }

  /** Pass 2 — score `docs` against an existing weight table: one stream
    * over the SCORED set only, broadcast-joining the ≤8192-row weights.
    * Map-only but for the per-doc aggregation; buckets unseen at weight
    * time contribute 0 (the neutral "no evidence" prior, coalesce below).
    * Documents with fewer than two words score 0 with n_bigrams 0. */
  def scoreWith(weights: DataFrame, docs: DataFrame, idCol: String,
                textCol: String, carryCols: Seq[String] = Seq("source"),
                buckets: Long = Buckets): DataFrame =
    bigramStream(docs, idCol, textCol, lit(false), carryCols, buckets)
      .join(broadcast(weights), Seq("_b"), "left")
      .groupBy(col(idCol) +: carryCols.map(col): _*)
      .agg(count(col("_b")).as("n_bigrams"),
        coalesce(sum(col("lrq")), lit(0L)).as("score_q"))

  /** (idCol, source, n_bigrams, score_q): per-document DSIR importance in
    * 2^-10 log2 units — `Σ_bigrams [ilog2q-ratio of the bigram's bucket]`
    * over weights built from THIS corpus (the one-shot batch form;
    * [[bucketWeights]]+[[scoreWith]] split the two passes for the
    * persisted-model increment path). */
  def importanceScores(docs: DataFrame, idCol: String, textCol: String,
                       isTarget: Column, carryCols: Seq[String] = Seq("source"),
                       buckets: Long = Buckets): DataFrame =
    scoreWith(bucketWeights(docs, idCol, textCol, isTarget, buckets),
      docs, idCol, textCol, carryCols, buckets)

  /** Persist / reload the bucket-weight model ([[bucketWeights]] output)
    * as an exact-integer generation-committed table
    * ([[graft.io.GenTable]], keyed by `name` under the warehouse
    * genstore) — build once per corpus epoch, score every increment
    * against it map-only. The marker commit (r12 unification) means a
    * crash mid-rebuild leaves the previous epoch's weights live instead
    * of an absent/half-written model under the streaming scorers. */
  def writeWeights(spark: org.apache.spark.sql.SparkSession, weights: DataFrame,
                   name: String): Unit = {
    graft.io.GenTable.replace(spark, graft.io.GenTable.rootFor(spark, name), weights)
    ()
  }

  def readWeights(spark: org.apache.spark.sql.SparkSession, name: String): DataFrame =
    graft.io.GenTable.read(spark, graft.io.GenTable.rootFor(spark, name))
      .getOrElse(throw new IllegalArgumentException(s"no committed DSIR weights '$name'"))

  def weightsExist(spark: org.apache.spark.sql.SparkSession, name: String): Boolean =
    graft.io.GenTable.exists(spark, graft.io.GenTable.rootFor(spark, name))

  /** Top-`k` documents by importance (desc, id-tiebroken) with their
    * selection rank. The global top-k is a TakeOrdered (distributed
    * heap), NOT a single-partition window; the rank window runs over the
    * already-collected k rows only. */
  def selectTop(scored: DataFrame, idCol: String, k: Int): DataFrame = {
    val top = scored.orderBy(col("score_q").desc, col(idCol)).limit(k)
    top.withColumn("sel_rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("score_q").desc, col(idCol))).cast("int"))
  }
}

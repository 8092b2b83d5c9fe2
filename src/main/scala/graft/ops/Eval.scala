package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Answer-scoring evaluation — the generation-side companion to the
  * retrieval eval card: token-level F1 between a prediction and its gold
  * reference (the SQuAD-style metric every QA/extraction eval reports),
  * in exact basis points. Overlap is the MULTISET intersection
  * Σ_tok min(c_pred, c_gold) — a repeated gold token must be produced
  * the right number of times to count, which plain set intersection
  * would over-credit.
  *
  * Scale shape: one tokenize/explode per side into (id, tok) counts
  * (map-side combined), ONE full-outer join co-partitioned on (id, tok),
  * then a per-id collapse — the shuffle carries per-document vocabularies,
  * never the token stream, and nothing is pairwise across documents.
  */
object Eval {

  /** Bigram-encode a text column for ROUGE-2 scoring through [[tokenF1]]:
    * each adjacent token pair becomes ONE space-delimited pseudo-token
    * `len(a)§a§b`. The length prefix makes the encoding collision-free
    * even when a token itself contains '§' (the tokenizer only lowercases
    * and splits on whitespace, so '§' CAN survive into tokens — without
    * the prefix, ["a§b","c"] and ["a","b§c"] would both encode "a§b§c"):
    * decoding reads the digits up to the first '§' to recover the split
    * point, so distinct pairs never share an encoding (the same
    * length-prefix trick as Cdc.valueDigest). A text of fewer than 2
    * tokens encodes to the empty string — the standard ROUGE-2 convention
    * that a 1-token reference has no bigrams to credit. Composing the
    * encoding with [[tokenF1]] IS ROUGE-2 (precision/recall/F1 over
    * bigram multisets), with the same empty-side conventions. */
  def bigramEncode(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val tk = Dedup.tokensCol(c)
    val pairs = transform(slice(tk, lit(1), size(tk) - 1),
      (x, i) => concat(length(x).cast("string"), lit("§"), x, lit("§"),
        element_at(tk, i + 2)))
    when(size(tk) < 2, lit("")).otherwise(array_join(pairs, " "))
  }

  /** Per-id token F1 of `predCol` against `goldCol`:
    * (idCol, n_gold, n_pred, n_overlap, precision_bp, recall_bp, f1_bp).
    * Empty sides score 0 (and 10000 only when both sides are empty —
    * the SQuAD convention for empty-gold/empty-pred agreement). */
  def tokenF1(df: DataFrame, idCol: String, goldCol: String,
              predCol: String): DataFrame = {
    def counts(c: String, as: String) =
      df.select(col(idCol), explode(Dedup.tokensCol(col(c))).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as(as))
    val joined = counts(goldCol, "cg").join(counts(predCol, "cp"),
      Seq(idCol, "tok"), "full_outer")
    val scored = joined.groupBy(col(idCol)).agg(
      sum(coalesce(col("cg"), lit(0L))).as("n_gold"),
      sum(coalesce(col("cp"), lit(0L))).as("n_pred"),
      sum(least(coalesce(col("cg"), lit(0L)), coalesce(col("cp"), lit(0L)))).as("n_overlap"))
    // ids whose BOTH sides tokenized to nothing never reach the join;
    // re-enter them from the source with the both-empty convention
    df.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_gold"), lit(0L)).as("n_gold"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("precision_bp",
        expr("CASE WHEN n_pred = 0 THEN CASE WHEN n_gold = 0 THEN 10000L ELSE 0L END " +
          "ELSE n_overlap * 10000 div n_pred END"))
      .withColumn("recall_bp",
        expr("CASE WHEN n_gold = 0 THEN CASE WHEN n_pred = 0 THEN 10000L ELSE 0L END " +
          "ELSE n_overlap * 10000 div n_gold END"))
      .withColumn("f1_bp",
        expr("CASE WHEN n_gold + n_pred = 0 THEN 10000L " +
          "ELSE 2 * n_overlap * 10000 div (n_gold + n_pred) END"))
  }
}

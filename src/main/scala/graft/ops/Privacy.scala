package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy / compliance operators for training-data release: k-anonymity
  * suppression, l-diversity, and generalization-ladder search (Sweeney 2002,
  * "k-anonymity: a model for protecting privacy"; Machanavajjhala et al. 2007,
  * "l-diversity"). The reference pipeline has no privacy stage; this family is
  * a north-star extension — a corpus published for training must be able to
  * prove that no quasi-identifier combination isolates fewer than k records.
  *
  * Scale shape (the 100 TB question): every operator here is one partial
  * aggregation over the quasi-identifier columns — map-side combine collapses
  * the shuffle to |distinct QI tuples|, which is ≪ corpus for any QI set worth
  * anonymizing — followed by a LEFT SEMI join of the corpus against the
  * surviving key set. The key set after `HAVING count >= k` is small by
  * construction (it is bounded by n/k groups), so AQE will usually broadcast
  * it; no window-over-full-corpus, no second full shuffle.
  *
  * Null semantics: rows with a NULL in any quasi-identifier are suppressed
  * (privacy-conservative — a NULL QI is itself identifying). This matches the
  * join-based oracle form in both engines: equality joins drop NULL keys.
  */
object Privacy {

  /** Rows whose quasi-identifier tuple occurs at least `k` times (suppression
    * model: under-k groups are dropped, surviving rows are untouched). */
  def kAnonymize(df: DataFrame, quasiIds: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(quasiIds.nonEmpty, "need at least one quasi-identifier column")
    val safe = df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("__qi_cnt"))
      .filter(col("__qi_cnt") >= k)
      .select(quasiIds.map(col): _*)
    // using-column joins front the join keys; restore the caller's order
    df.join(safe, quasiIds, "left_semi").select(df.columns.map(col): _*)
  }

  /** Rows whose quasi-identifier group contains at least `l` distinct values
    * of the sensitive column (distinct l-diversity). A group can be large
    * (k-anonymous) yet still leak the sensitive attribute if every member
    * shares one value; this is the standard second gate. */
  def lDiverse(df: DataFrame, quasiIds: Seq[String], sensitiveCol: String,
               l: Int): DataFrame = {
    require(l >= 1, s"l must be >= 1, got $l")
    val safe = df.groupBy(quasiIds.map(col): _*)
      .agg(countDistinct(col(sensitiveCol)).as("__sens_card"))
      .filter(col("__sens_card") >= l)
      .select(quasiIds.map(col): _*)
    df.join(safe, quasiIds, "left_semi").select(df.columns.map(col): _*)
  }

  /** Group-level l-diversity report: one row per quasi-identifier group with
    * its size and sensitive-value cardinality, flagged diverse / not. */
  def lDiversityGroups(df: DataFrame, quasiIds: Seq[String],
                       sensitiveCol: String, l: Int): DataFrame = {
    require(l >= 1, s"l must be >= 1, got $l")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("grp_rows"),
        countDistinct(col(sensitiveCol)).as("sens_card"))
      .withColumn("diverse", (col("sens_card") >= l).cast("int"))
  }

  /** Prosecutor re-identification risk histogram (the ARX release metric):
    * each row's risk is 1/|its QI group| — reported in integer basis points
    * (10000 div n, floor) and aggregated to (risk_bp → rows at that risk),
    * so an analyst reads "N rows are re-identifiable at ≥ X%" directly.
    * Same bounded-state shape as [[kAnonymize]]: one QI collapse, then a
    * second collapse over the ≤ |distinct group sizes| histogram — the
    * corpus is scanned once and never joined. */
  def riskHistogram(df: DataFrame, quasiIds: Seq[String]): DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier column")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("grp_rows"))
      .select(expr("10000 div grp_rows").as("risk_bp"), col("grp_rows"))
      .groupBy(col("risk_bp"))
      .agg(sum(col("grp_rows")).as("n_rows"), count(lit(1)).as("n_groups"))
  }

  /** Value generalization: fixed-width banding (floor to the band's lower
    * edge). `floor` on doubles is exact, so both engines band identically. */
  def band(c: Column, width: Double): Column = {
    require(width > 0, s"band width must be > 0, got $width")
    floor(c / lit(width)) * lit(width)
  }

  /** One generalization level: a named set of (output column, expression)
    * projections of the quasi-identifiers. Coarser levels map more raw tuples
    * onto the same generalized tuple, trading precision for group size. */
  final case class GeneralizationLevel(name: String, cols: Seq[(String, Column)])

  /** Suppression stats for each level of a generalization ladder, in ladder
    * order: rows that would be suppressed at `k`, group count, and the
    * suppression rate in basis points (integer — oracle-exact). One cheap
    * aggregate per level over the distinct-QI space; the corpus is scanned
    * once per level but never joined or shuffled beyond the QI collapse. */
  def ladderStats(df: DataFrame, ladder: Seq[GeneralizationLevel],
                  k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(ladder.nonEmpty, "ladder must have at least one level")
    val perLevel = ladder.zipWithIndex.map { case (lvl, i) =>
      val proj = lvl.cols.map { case (n, c) => c.as(n) }
      val groups = df.select(proj: _*)
        .groupBy(lvl.cols.map { case (n, _) => col(n) }: _*)
        .agg(count(lit(1)).as("grp_rows"))
      groups.agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("grp_rows") < k, col("grp_rows")).otherwise(lit(0L)))
          .as("suppressed_rows"),
        sum(col("grp_rows")).as("total_rows"))
        .select(lit(i).cast("int").as("level"), lit(lvl.name).as("level_name"),
          col("n_groups"), col("suppressed_rows"),
          // integer div — identical floor semantics to the oracle's `//`
          expr("(suppressed_rows * 10000) div total_rows").as("suppress_bp"))
    }
    perLevel.reduce(_.unionByName(_))
  }

  /** Walk the ladder from most precise to most general and return the first
    * level whose suppression rate at `k` is <= `maxSuppressBp` basis points,
    * together with the k-anonymized frame at that level (generalized QI
    * columns replace the raw ones; non-QI columns pass through via `carry`).
    * Falls back to the last (most general) level if none meets the target.
    * Driver-side loop over a handful of levels, each one aggregate — the
    * standard lattice-walk shape, never materializing more than group counts.
    */
  def generalizeToK(df: DataFrame, ladder: Seq[GeneralizationLevel], k: Int,
                    maxSuppressBp: Long, carry: Seq[String]): (Int, DataFrame) = {
    val stats = ladderStats(df, ladder, k)
      .select("level", "suppress_bp").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val chosen = ladder.indices.find(i => stats(i) <= maxSuppressBp)
      .getOrElse(ladder.length - 1)
    val lvl = ladder(chosen)
    val proj = carry.map(col) ++ lvl.cols.map { case (n, c) => c.as(n) }
    val generalized = df.select(proj: _*)
    (chosen, kAnonymize(generalized, lvl.cols.map(_._1), k))
  }
}

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

  /** t-closeness report (Li, Li & Venkatasubramanian 2007, "t-Closeness:
    * Privacy Beyond k-Anonymity and l-Diversity") for an ORDERED sensitive
    * attribute: one row per quasi-identifier group with its size, the
    * Earth Mover's Distance between the group's sensitive distribution
    * and the global one in integer basis points, and a `close` flag
    * (emd_bp <= tBp). A group can be k-anonymous and l-diverse yet still
    * leak — if its salary distribution sits far above the corpus's, an
    * attacker learns "this group is rich" without isolating anyone;
    * t-closeness is the standard third release gate.
    *
    * EMD for an ordered attribute with values v_1 < … < v_m is
    * (1/(m-1)) · Σ_j |Σ_{i<=j} (P_i - Q_i)| (the cumulative form). With
    * P_i = c_i/n_g and Q_i = C_i/N this is EXACT in integers: the j-th
    * cumulative difference scaled by n_g·N is D_j = Σ_{i<=j}(c_i·N -
    * C_i·n_g), and emd_bp = (10000 · Σ_j |D_j|) div (n_g·N·(m-1)), summed
    * over j = 1..m-1 (D_m = 0 identically, so summing all j is the same
    * number). Every quantity is a long — DuckDB replays it exactly.
    * (At extreme corpus sizes 10000·Σ|D_j| approaches long range —
    * n_g·N·10000·(m-1) must stay under 2^63; band the sensitive values
    * and/or pre-aggregate if N·max(n_g) exceeds ~10^14.)
    *
    * Scale shape: one corpus scan feeding three partial aggregates over
    * (QI), (QI, v) and (v) — all map-side-combined to lattice-sized
    * state; the dense (group × value) grid, the cumulative window and
    * the final collapse all live on the lattice, never the corpus. Rows
    * with a NULL sensitive value are excluded up front (they have no
    * position in the ordered domain); NULL QI values form their own
    * group, as in [[lDiversityGroups]]. */
  def tClosenessGroups(df: DataFrame, quasiIds: Seq[String],
                       sensitiveCol: String, tBp: Long): DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier column")
    require(tBp >= 0, s"tBp must be >= 0, got $tBp")
    val qi = quasiIds.map(col)
    val s = col(sensitiveCol)
    val base = df.filter(s.isNotNull).select(qi :+ s.as("_v"): _*)
    val gsize = base.groupBy(qi: _*).agg(count(lit(1)).as("_ng"))
    val gdist = base.groupBy(col("_v")).agg(count(lit(1)).as("_gc"))
    val tot = base.agg(count(lit(1)).as("_N"),
      countDistinct(col("_v")).as("_m"))
    // dense (group × value) grid so values ABSENT from a group still
    // contribute their -C_i·n_g term to the cumulative difference; the
    // cell join is null-SAFE on the QI side so an all-null QI group
    // keeps its own cells (matching the groupBy semantics above)
    val cells = quasiIds.zipWithIndex
      .foldLeft(base.groupBy(qi :+ col("_v"): _*).agg(count(lit(1)).as("_c"))
        .withColumnRenamed("_v", "_vv")) {
        case (d, (n, i)) => d.withColumnRenamed(n, s"_q$i")
      }
    val joinCond = quasiIds.zipWithIndex
      .map { case (n, i) => col(n) <=> col(s"_q$i") }
      .reduce(_ && _) && (col("_v") <=> col("_vv"))
    val grid = gsize.crossJoin(broadcast(gdist)).crossJoin(broadcast(tot))
      .join(cells, joinCond, "left")
      .withColumn("_c", coalesce(col("_c"), lit(0L)))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(qi: _*).orderBy(col("_v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    grid
      .withColumn("_d", col("_c") * col("_N") - col("_gc") * col("_ng"))
      .withColumn("_cum", sum(col("_d")).over(wCum))
      .groupBy(qi: _*)
      .agg(max(col("_ng")).as("grp_rows"),
        sum(abs(col("_cum"))).as("_num"),
        max(col("_N")).as("_Nv"), max(col("_m")).as("_mv"))
      .select(qi ++ Seq(col("grp_rows"),
        when(col("_mv") <= 1, lit(0L)).otherwise(
          expr("(_num * 10000) div (grp_rows * _Nv * (_mv - 1))"))
          .as("emd_bp")): _*)
      .withColumn("close", (col("emd_bp") <= tBp).cast("int"))
  }

  /** Rows whose quasi-identifier group passes t-closeness at `tBp` basis
    * points — the suppression form, composing with [[kAnonymize]] /
    * [[lDiverse]] into the full release gate. Same lattice-sized
    * left-semi shape: NULL-QI rows are dropped (equality join). */
  def tClose(df: DataFrame, quasiIds: Seq[String], sensitiveCol: String,
             tBp: Long): DataFrame = {
    val safe = tClosenessGroups(df, quasiIds, sensitiveCol, tBp)
      .filter(col("close") === 1)
      .select(quasiIds.map(col): _*)
    df.join(safe, quasiIds, "left_semi").select(df.columns.map(col): _*)
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
    * suppression rate in basis points (integer — oracle-exact).
    *
    * ONE corpus scan for the whole ladder: each row explodes into one
    * `(level, qi)` record per level — `qi` is the JSON encoding of that
    * level's generalized tuple (injective for a fixed per-level schema:
    * field set and types are constant across rows, so two tuples encode
    * equal iff they are equal, nulls included) — then a grouped count
    * whose map-side combine collapses the shuffle to the union of the
    * per-level QI lattices, then a lattice-sized second collapse per
    * level. The ×levels explode is row-width, not scan, cost; the old
    * one-aggregate-per-level form re-read the corpus once per level,
    * which at 100 TB makes a 4-level ladder 4 full scans. Returns no
    * rows for an empty corpus (there is no lattice to report on). */
  def ladderStats(df: DataFrame, ladder: Seq[GeneralizationLevel],
                  k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(ladder.nonEmpty, "ladder must have at least one level")
    val tagged = ladder.zipWithIndex.map { case (lvl, i) =>
      struct(lit(i).cast("int").as("level"),
        to_json(struct(lvl.cols.map { case (n, c) => c.as(n) }: _*)).as("qi"))
    }
    val names = array(ladder.map(l => lit(l.name)): _*)
    df.select(explode(array(tagged: _*)).as("_l"))
      .select(col("_l.level").as("level"), col("_l.qi").as("qi"))
      .groupBy(col("level"), col("qi"))
      .agg(count(lit(1)).as("grp_rows"))
      .groupBy(col("level"))
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("grp_rows") < k, col("grp_rows")).otherwise(lit(0L)))
          .as("suppressed_rows"),
        sum(col("grp_rows")).as("total_rows"))
      .select(col("level"), element_at(names, col("level") + 1).as("level_name"),
        col("n_groups"), col("suppressed_rows"),
        // integer div — identical floor semantics to the oracle's `//`
        expr("(suppressed_rows * 10000) div total_rows").as("suppress_bp"))
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
    // a level absent from the stats (empty corpus) is treated as
    // over-budget, falling through to the most general level
    val chosen = ladder.indices
      .find(i => stats.getOrElse(i, Long.MaxValue) <= maxSuppressBp)
      .getOrElse(ladder.length - 1)
    val lvl = ladder(chosen)
    val proj = carry.map(col) ++ lvl.cols.map { case (n, c) => c.as(n) }
    val generalized = df.select(proj: _*)
    (chosen, kAnonymize(generalized, lvl.cols.map(_._1), k))
  }
}

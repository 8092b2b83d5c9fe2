package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch with EXACTLY-verifiable state (the
  * "novel sketch" slot next to minhash/simhash).
  *
  * Design for verifiability: the sketch STATE is pure integer arithmetic —
  * md5-derived 60-bit hashes, register index = low 6 bits, rank = leading-
  * zero count of the next 49 bits, registers = per-group MAX (associative,
  * merge-order-free, so the shuffle carries one 64-register row per group
  * and reruns are bit-identical). The harmonic denominator is kept as the
  * exact integer Σ 2^(50 - M_j) (scaled by 2^50; ≤ 64·2^50 < 2^63), so an
  * independent engine can replay the whole sketch hash-exactly — the float
  * ESTIMATE is then a pure local function of verified state, never part of
  * the comparison surface.
  *
  * m = 64 registers → standard error ≈ 1.04/√64 ≈ 13%.
  */
object Hll {

  val NumRegisters = 64 // 6 index bits
  private val RankBits = 49 // rank domain: bits 11..59 of the 60-bit hash
  private val MaxRank = RankBits + 1 // all-zero suffix caps at 50

  /** Per-group sketch state over `exprCol` values:
    * (groupCols..., hll_zeros, hll_denom_scaled).
    * `hll_denom_scaled` = 2^50 · Σ_j 2^(-M_j) exactly (absent registers
    * contribute M_j = 0 → 2^50 each); `hll_zeros` = registers never hit. */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: Column): DataFrame =
    collapse(registers(df, groupCols, valueCol), groupCols)

  /** Raw register vectors (groupCols..., _j, _m) — the MERGEABLE form:
    * two register frames over disjoint (or overlapping — max is
    * idempotent) slices combine with [[merge]] into exactly the registers
    * a single pass over the union would produce. */
  def registers(df: DataFrame, groupCols: Seq[String], valueCol: Column): DataFrame = {
    // null values are IGNORED like any SQL distinct-count aggregate ignores
    // them: an unfiltered null would hash to a null register (_j/_m null)
    // that count(lit(1)) counts but sum() skips, corrupting both zeros and
    // the denominator
    val hashed = df.select(groupCols.map(col) :+ valueCol.as("_v"): _*)
      .filter(col("_v").isNotNull)
      .select(groupCols.map(col) :+ graft.util.Hash.md5Bits60(col("_v")).as("_h"): _*)
    val ranked = hashed.select(groupCols.map(col) ++ Seq(
      expr("int(_h & 63)").as("_j"),
      // leading zeros of the 49-bit suffix + 1; bin() has no leading zeros,
      // so length(bin(v)) = floor(log2 v) + 1 exactly (integer-exact rank)
      expr(s"case when (_h >> 11) = 0 then $MaxRank else 50 - length(bin(_h >> 11)) end").as("_rho")): _*)
    ranked.groupBy(groupCols.map(col) :+ col("_j"): _*)
      .agg(max(col("_rho")).as("_m"))
  }

  /** Merge register frames: per (group, register) MAX — associative,
    * commutative, idempotent, so incremental sketching (per-day slices,
    * per-shard partials) reaches the same state in any merge order. */
  def merge(groupCols: Seq[String], regFrames: DataFrame*): DataFrame = {
    require(regFrames.nonEmpty, "nothing to merge")
    regFrames.reduce(_.unionByName(_))
      .groupBy(groupCols.map(col) :+ col("_j"): _*)
      .agg(max(col("_m")).as("_m"))
  }

  /** Collapse register vectors to the verified sketch state
    * (hll_zeros, hll_denom_scaled) — see [[sketch]]. */
  def collapse(regs: DataFrame, groupCols: Seq[String]): DataFrame =
    regs.groupBy(groupCols.map(col): _*)
      .agg(
        (lit(NumRegisters) - count(lit(1))).cast("int").as("hll_zeros"),
        (sum(expr("shiftleft(cast(1 as bigint), 50 - _m)")) +
          (lit(NumRegisters.toLong) - count(lit(1))) * lit(1L << 50)).as("hll_denom_scaled"))

  /** The HLL estimate from verified state — local float math over exact
    * integers (α_64 · m² / Σ2^-M_j, linear counting below 2.5m). */
  def estimate(zeros: Int, denomScaled: Long): Double = {
    val m = NumRegisters.toDouble
    val alpha = 0.709 // α_64
    val raw = alpha * m * m / (denomScaled.toDouble / math.pow(2.0, 50))
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m / zeros) else raw
  }
}

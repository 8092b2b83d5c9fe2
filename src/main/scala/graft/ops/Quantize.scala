package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 embedding quantization (the Faiss `SQ8` storage tier) — at
  * 100 TB the representation that cuts a float32 vector store 4× with
  * near-lossless cosine: each vector is stored as a per-vector scale plus
  * one signed byte per dimension. Map-only and shuffle-free: every
  * expression is a pure SQL array transform, so the pass rides whole-stage
  * codegen and composes with any scan.
  *
  * Parity contract (the repo's established pattern, cf. [[Ivf.quantCol]]):
  * all arithmetic happens in the exact-integer 2^-20 domain —
  * `xq = floor(x · 2^20)`, per-vector scale `amax_q = max |xq|`, code =
  * `sign(xq) · round(|xq|·127 / amax_q)` with the round expressed as
  * integer `(2·|xq|·127 + amax_q) div (2·amax_q)` — so the DuckDB oracle
  * replays every code bit-for-bit; no float division crosses the engine
  * boundary. A zero vector (amax_q = 0) quantizes to all-zero codes.
  */
object Quantize {

  private val Q = 1048576L // 2^20, the shared quantization unit

  /** (id, amax_q, codes): per-vector symmetric scale (in 2^-20 units) and
    * int8-range codes (BIGINT-typed longs in [-127, 127]; the storage
    * layer narrows to TINYINT at write time).
    *
    * Domain: inputs are clamped to ±2^34 before quantization so every
    * downstream integer (`xq` ≤ 2^54, `2·|xq|·127` < 2^62) stays in Long
    * range IDENTICALLY in both engines — without the clamp, a pathological
    * float like 1e15f would make Spark's non-ANSI cast saturate while
    * DuckDB's cast raises, an engine divergence. Real embeddings live in
    * [-1000, 1000]; the clamp is invisible there. */
  def int8Codes(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol),
      expr(s"transform($vecCol, x -> CAST(floor(" +
        s"greatest(least(CAST(x AS DOUBLE), 17179869184.0D), -17179869184.0D) * $Q.0) AS BIGINT))").as("_xq"))
      .withColumn("amax_q", expr("aggregate(_xq, 0L, (a, v) -> greatest(a, abs(v)))"))
      .withColumn("codes", expr(
        """transform(_xq, v -> CASE WHEN amax_q = 0 THEN 0L
          |  ELSE CAST(sign(v) AS BIGINT) * ((2 * abs(v) * 127 + amax_q) div (2 * amax_q)) END)""".stripMargin))
      .drop("_xq")

  /** The relational/oracle surface: index-free integer summaries of each
    * vector's codes (sum, sum of squares, min, max, non-zeros). Granular
    * enough that any codegen/rounding regression flips a row hash, while
    * staying engine-portable (no list-index lambdas). */
  def int8Stats(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    int8Codes(df, idCol, vecCol).select(
      col(idCol),
      col("amax_q"),
      expr("aggregate(codes, 0L, (a, v) -> a + v)").as("code_sum"),
      expr("aggregate(codes, 0L, (a, v) -> a + v * v)").as("code_sumsq"),
      expr("aggregate(codes, 127L, (a, v) -> least(a, v))").as("code_min"),
      expr("aggregate(codes, -127L, (a, v) -> greatest(a, v))").as("code_max"),
      expr("aggregate(codes, 0L, (a, v) -> a + CASE WHEN v = 0 THEN 0L ELSE 1L END)").as("nnz"))

  /** Dequantized vector as DOUBLE array — `code · amax_q / (127 · 2^20)`
    * — for downstream cosine/rerank over the compressed store. */
  def dequantCol(codesCol: Column, amaxCol: Column): Column =
    transform(codesCol, c => c.cast("double") * amaxCol.cast("double") / lit(127.0 * Q))

  /** Pure-Scala twin of [[int8Codes]]'s kernel for property tests:
    * `int8Codes` and this agree on every input, including NaN — SQL
    * least/greatest order NaN above every number in both engines, so the
    * SQL kernel clamps NaN to +2^34 and saturates its code at 127; the
    * twin must clamp explicitly (math.min/max would propagate the NaN and
    * floor it to a 0 code instead). */
  def int8CodesLocal(v: Seq[Float]): (Long, Seq[Long]) = {
    val xq = v.map { x =>
      val d = x.toDouble
      val clamped =
        if (d.isNaN) 17179869184.0
        else math.max(math.min(d, 17179869184.0), -17179869184.0)
      math.floor(clamped * Q).toLong
    }
    val amax = xq.foldLeft(0L)((a, q) => math.max(a, math.abs(q)))
    val codes =
      if (amax == 0L) xq.map(_ => 0L)
      else xq.map(q => math.signum(q) * ((2 * math.abs(q) * 127 + amax) / (2 * amax)))
    (amax, codes)
  }
}

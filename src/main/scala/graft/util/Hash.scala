package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's canonical md5→BIGINT derivations. These constants are
  * exactness-critical: every DuckDB oracle replays them as
  * `CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)` (and 17,14 for the
  * second word), so the hex offsets/widths must only ever change here and
  * in the oracle fragments together. */
object Hash {

  /** First 60 bits of md5 (15 hex chars) as a non-negative BIGINT. */
  def md5Bits60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 56 bits from hex positions 17-30 — the independent second word for
    * Kirsch-Mitzenmacher double hashing (`h_i = m1 + i*m2`). */
  def md5Bits56(c: Column): Column =
    conv(substring(md5(c), 17, 14), 16, 10).cast("long")

  /** Seeded uniform bucket in [0, mod): md5 of `"<seed>:" || v` → 60-bit
    * word → pmod. The shared derivation behind [[graft.ops.Cms]] counters
    * and [[graft.ops.Bloom]] bit positions; oracles replay it as
    * `CAST('0x' || substring(md5(CAST(seed AS VARCHAR) || ':' || v), 1, 15)
    * AS BIGINT) % mod`. */
  def seededBucket(v: Column, seed: Int, mod: Long): Column =
    pmod(md5Bits60(concat(lit(s"$seed:"), v)), lit(mod))
}

package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's canonical md5→BIGINT derivations. These constants are
  * exactness-critical: every DuckDB oracle replays them as
  * `CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)` (and 17,14 for the
  * second word), so the hex offsets/widths must only ever change here and
  * in the oracle fragments together. */
object Hash {

  /** First 60 bits of md5 (15 hex chars) as a non-negative BIGINT.
    * r17: computed by the native [[org.apache.spark.sql.graft.Md5Word]]
    * expression straight from digest bytes — same value as the
    * hex-slice/conv chain ([[bits60OfHex]]∘md5, which the DuckDB oracles
    * replay and TextHashKernelSpec pins) without materializing the hex
    * string or paying two radix parses per row. */
  def md5Bits60(c: Column): Column = org.apache.spark.sql.graft.Md5Word(c, 0, 15)

  /** 56 bits from hex positions 17-30 — the independent second word for
    * Kirsch-Mitzenmacher double hashing (`h_i = m1 + i*m2`). */
  def md5Bits56(c: Column): Column = org.apache.spark.sql.graft.Md5Word(c, 16, 14)

  /** The (60-bit, 56-bit) Kirsch-Mitzenmacher word pair from ONE
    * materialized digest column (`md5(v)` aliased once upstream) — use
    * this instead of md5Bits60/md5Bits56 side by side when both words of
    * the SAME value are needed: the single-digest shape is guaranteed
    * structurally rather than left to codegen subexpression elimination.
    * Identical values to md5Bits60/md5Bits56 (same hex slices), so no
    * oracle changes when switching call sites. */
  def bits60OfHex(hexDigest: Column): Column =
    conv(substring(hexDigest, 1, 15), 16, 10).cast("long")
  def bits56OfHex(hexDigest: Column): Column =
    conv(substring(hexDigest, 17, 14), 16, 10).cast("long")

  /** `k`-th 32-bit word of the md5 digest (hex chars 8k+1..8k+8, k in
    * 0..3) as a non-negative BIGINT — a 4-member hash family paying ONE
    * digest per value, vs. seeded re-digests ([[seededBucket]]) which pay
    * one md5 (plus a concat) per member. Oracles replay it as
    * `CAST('0x' || substring(md5(v), 1 + 8*k, 8) AS BIGINT)`. Taken mod a
    * power of two (≤ 2^32), the bucket is exactly uniform. */
  def md5Word32(c: Column, k: Int): Column = {
    require(k >= 0 && k < 4, s"md5 has four 32-bit words, got k=$k")
    org.apache.spark.sql.graft.Md5Word(c, 8 * k, 8)
  }

  /** Seeded uniform bucket in [0, mod): md5 of `"<seed>:" || v` → 60-bit
    * word → pmod. The shared derivation behind [[graft.ops.Cms]] counters
    * and [[graft.ops.Bloom]] bit positions; oracles replay it as
    * `CAST('0x' || substring(md5(CAST(seed AS VARCHAR) || ':' || v), 1, 15)
    * AS BIGINT) % mod`. */
  def seededBucket(v: Column, seed: Int, mod: Long): Column =
    pmod(md5Bits60(concat(lit(s"$seed:"), v)), lit(mod))
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom filter — set-membership pre-filtering without
  * shipping the set. The 100 TB use case is decontamination and
  * seen-set suppression: build a few-KB filter over the benchmark /
  * already-ingested side, broadcast it, and drop the 99.9% of corpus
  * rows with no bits set BEFORE any shuffle or join; only the (tiny,
  * false-positive-inflated) surviving slice pays the exact check —
  * the same role `spark.sql.optimizer.runtime.bloomFilter` plays for
  * joins, but with md5-derived bit positions so the filter is
  * ENGINE-PORTABLE: the DuckDB oracle rebuilds the identical bit array
  * and reproduces every false positive bit-for-bit (Spark's built-in
  * BloomFilterAggregate hashes with xxhash64 seeds internal to its
  * implementation, which no other engine replays).
  *
  * Bits live in `numBits/64` BIGINT words, OR-merged map-side (bit_or
  * is associative and commutative — merge-order-free exact state, the
  * [[Hll]]/[[Cms]] discipline). False-positive rate follows the standard
  * (1 - e^(-kn/m))^k; size for ~1% at the expected set cardinality.
  */
object Bloom {

  /** Bit position of `v` for hash `seed` (0..3): the seed-th 32-bit word
    * of ONE md5 digest, mod numBits — uniform in [0, numBits) for the
    * power-of-two sizes [[build]] enforces, identical in Spark and the
    * DuckDB oracle. One digest serves the whole hash family: the probe
    * side previously paid `numHashes` seeded md5s (plus seed-prefix
    * concats) per value on the hottest decontamination path; codegen
    * subexpression elimination now collapses the four members to a single
    * md5 evaluation per row. */
  def bitCol(v: Column, seed: Int, numBits: Int): Column =
    pmod(graft.util.Hash.md5Word32(v, seed), lit(numBits.toLong))

  /** Build the filter over `valueCol` (nulls ignored): returns the word
    * array as a one-row DataFrame (bloom_words: array<bigint> of length
    * numBits/64), ready to broadcast-cross-join onto a probe side. The
    * grid is bounded (numBits/64 words) regardless of input size. */
  def build(df: DataFrame, valueCol: Column,
            numBits: Int = 1 << 16, numHashes: Int = 4): DataFrame = {
    require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
      s"numBits must be a power of two >= 64 (exact word layout, unbiased 32-bit-word buckets): $numBits")
    require(numHashes >= 1 && numHashes <= 4,
      s"the md5-word hash family has 4 members, got numHashes=$numHashes")
    val spark = df.sparkSession
    import spark.implicits._
    val nWords = numBits / 64
    val bits = df.select(valueCol.as("_v")).filter(col("_v").isNotNull)
      .select(explode(array((0 until numHashes).map(s => bitCol(col("_v"), s, numBits)): _*)).as("bit"))
    val words = bits
      .select(expr("bit div 64").as("w"), expr("shiftleft(cast(1 as bigint), cast(bit % 64 as int))").as("mask"))
      .groupBy(col("w")).agg(bit_or(col("mask")).as("word"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val full = Array.tabulate(nWords)(i => words.getOrElse(i, 0L))
    Seq(Tuple1(full.toSeq)).toDF("bloom_words")
  }

  /** Membership predicate: all `numHashes` bits of `v` set in `words`
    * (an array<bigint> column, 1-indexed by element_at). Word index is
    * bit >> 6, in-word mask 1 << (bit & 63) — bit positions are
    * non-negative (pmod), so shifts are exact integer div/mod. */
  def mightContain(words: Column, v: Column, numBits: Int, numHashes: Int): Column =
    (0 until numHashes).map { s =>
      val bit = bitCol(v, s, numBits)
      val wordIdx = call_function("shiftright", bit, lit(6)).cast("int")
      val mask = call_function("shiftleft", lit(1L), bit.bitwiseAND(lit(63L)).cast("int"))
      element_at(words, wordIdx + 1).bitwiseAND(mask) =!= 0L
    }.reduce(_ && _)
}

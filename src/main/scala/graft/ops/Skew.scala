package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation joins (SURVEY.md §7 scale notes).
  *
  * A hash-shuffled equi-join sends every row of a hot key to ONE reducer;
  * at 100 TB a single viral doc_id / null-ish default key can hold a stage
  * at 1/1000th parallelism. Two remedies, in preference order:
  *
  *  1. AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
  *     default on) — handles skew discovered at RUNTIME, no code change;
  *     works when both sides are shuffled.
  *  2. Explicit salting ([[saltedJoin]]) — for joins AQE cannot split
  *     (e.g. a shuffled build side that must stay intact, or pre-AQE
  *     engines): the fact side spreads each key across `saltFactor`
  *     sub-keys deterministically; the dim side replicates `saltFactor`×.
  *     Replication multiplies the SMALL side only — the classic
  *     hot-key/broadcast middle ground.
  */
object Skew {

  /** Deterministic per-row salt in [0, saltFactor): xxhash64 of the whole
    * fact row — stable across reruns (no rand(), which would break
    * idempotent retries of a failed stage). */
  private def saltCol(df: DataFrame, saltFactor: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(saltFactor)).cast("int")

  /** Inner/left equi-join of a skewed `facts` side against a small-ish
    * `dims` side on `key`, with the dim side replicated over `saltFactor`
    * salted sub-keys. Result equals `facts.join(dims, key, joinType)`
    * row-for-row (spec-asserted); only the shuffle distribution changes. */
  def saltedJoin(facts: DataFrame, dims: DataFrame, key: String,
                 saltFactor: Int = 16, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    val salted = facts.withColumn("_salt", saltCol(facts, saltFactor))
    val replicated = dims
      .withColumn("_salt", explode(expr(s"sequence(0, ${saltFactor - 1})")))
      .withColumn("_salt", col("_salt").cast("int"))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}

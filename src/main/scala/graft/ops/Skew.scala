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

  private val SaltName = "_graft_salt" // internal; collision-checked below

  /** Deterministic per-row salt in [0, saltFactor): xxhash64 of the whole
    * fact row — stable across reruns (no rand(), which would break
    * idempotent retries of a failed stage). */
  private def saltCol(df: DataFrame, saltFactor: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(saltFactor)).cast("int")

  /** Inner/left equi-join of a skewed `facts` side against a small-ish
    * `dims` side on `key`, with the dim side replicated over `saltFactor`
    * salted sub-keys. Result equals `facts.join(dims, key, joinType)`
    * row-for-row (spec-asserted); only the shuffle distribution changes.
    *
    * Only inner and left joins are accepted: replication multiplies
    * UNMATCHED dim rows, so right/full outer would emit saltFactor copies
    * of each — reverse the operands (dims are never the skewed side). */
  def saltedJoin(facts: DataFrame, dims: DataFrame, key: String,
                 saltFactor: Int = 16, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    val jt = joinType.toLowerCase.replace("_", "")
    require(jt == "inner" || jt == "left" || jt == "leftouter",
      s"saltedJoin supports inner/left joins only, got '$joinType' " +
        "(outer-replicated dim rows would duplicate; swap the operands instead)")
    require(!facts.columns.contains(SaltName) && !dims.columns.contains(SaltName),
      s"inputs must not already contain a '$SaltName' column")
    val salted = facts.withColumn(SaltName, saltCol(facts, saltFactor))
    val replicated = dims
      .withColumn(SaltName, explode(expr(s"sequence(0, ${saltFactor - 1})")))
      .withColumn(SaltName, col(SaltName).cast("int"))
    salted.join(replicated, Seq(key, SaltName), joinType).drop(SaltName)
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance — the merge-not-recompute
  * contract a 100 TB corpus forces on every standing statistic (per-source
  * doc counts, char volumes, high-water marks): the maintained state is a
  * small per-key table of MERGEABLE aggregates (sum-able counts/sums,
  * max-able maxima), and an increment applies as
  * `state' = merge(state, aggState(delta))` — one pass over the DELTA
  * only, never a corpus re-scan. Algebra: every column here is a
  * commutative monoid (Long +, Long max), so merge order and batching
  * don't matter and `merge(aggState(A), aggState(B)) = aggState(A ∪ B)`
  * exactly — which is precisely what the oracle pins (the full recompute).
  *
  * The same shape extends to any mergeable sketch the engine already has
  * ([[Hll]] registers max-merge per index, [[Cms]] counters add,
  * [[Stats.quantilesHistogram]] bins add); this operator keeps the
  * maintained-table machinery in one place with the exact-integer columns
  * as the oracle-able reference. */
object Mv {

  /** Mergeable per-key state of a document set: (key, n_docs, sum_chars,
    * max_chars). One hash-aggregation — map-side combined, output is
    * key-cardinality-sized. */
  def aggState(docs: DataFrame, keyCol: String, charsCol: String): DataFrame =
    docs.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col(charsCol)), lit(0L)).as("sum_chars"),
        coalesce(max(col(charsCol)), lit(0L)).as("max_chars"))

  /** `merge(a, b)`: union + one re-aggregation over the (small) state
    * tables themselves — counts/sums add, maxima max. */
  def merge(a: DataFrame, b: DataFrame, keyCol: String): DataFrame =
    a.unionByName(b).groupBy(col(keyCol))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("sum_chars")).as("sum_chars"),
        max(col("max_chars")).as("max_chars"))

  /** Persist / reload / probe the maintained base state as a
    * generation-committed table ([[graft.io.GenTable]], keyed by `name`
    * under the warehouse genstore) — the r12 one-protocol unification:
    * `saveAsTable` overwrite had a crash window where the old state was
    * dropped before the new one committed; the marker commit never
    * exposes a missing or half-written table, on any filesystem. */
  def writeState(spark: SparkSession, state: DataFrame, name: String): Unit = {
    graft.io.GenTable.replace(spark, graft.io.GenTable.rootFor(spark, name), state)
    ()
  }

  def readState(spark: SparkSession, name: String): DataFrame =
    graft.io.GenTable.read(spark, graft.io.GenTable.rootFor(spark, name))
      .getOrElse(throw new IllegalArgumentException(s"no committed MV state '$name'"))

  def stateExists(spark: SparkSession, name: String): Boolean =
    graft.io.GenTable.exists(spark, graft.io.GenTable.rootFor(spark, name))
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities for skewed keys and co-located joins — the knobs SURVEY
  * §4 reserves for the 100 TB posture.
  */
object Scale {

  /** Salted equi-join for skewed large⋈medium joins where neither AQE's
    * skew split nor a broadcast applies (medium side too big to ship, hot
    * keys too big for one task).
    *
    * The large side gets a deterministic salt in [0, saltFactor) derived
    * from hashing the whole row (xxhash64 — cheap, codegen'd, and stable
    * across retries, unlike rand()); the medium side is exploded
    * saltFactor× so every (key, salt) bucket finds its match. Hot keys
    * spread over saltFactor tasks at the cost of replicating the medium
    * side — the classic trade.
    *
    * Caveats: only inner/left/semi joins are sound (a right/full outer
    * would emit one null-extended row per unmatched salt copy of the
    * medium side — rejected). Byte-identical duplicate rows hash to the
    * same salt; pre-aggregate duplicates or add a distinguishing column
    * if the hot key's rows are identical. */
  def saltedJoin(large: DataFrame, medium: DataFrame, key: String,
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi")
      .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/left_semi, got $joinType")
    val saltedLarge = large.withColumn("_salt",
      pmod(xxhash64(struct(large.columns.map(col).toIndexedSeq: _*)), lit(saltFactor)).cast("int"))
    val explodedMedium = medium.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLarge.join(explodedMedium, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Write a bucketed+sorted table: co-locates future equi-joins and
    * aggregations on `key` (no exchange, no sort at read time when both
    * sides share the layout). Bucketed tables need the catalog, hence
    * saveAsTable. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Range-partitioned write for ordered scans / time-pruned reads:
    * `partitionBy` on a derived coarse column (e.g. day from epoch
    * seconds) so predicate pushdown prunes whole directories. */
  def writeTimePartitioned(df: DataFrame, path: String, epochSecCol: String): Unit =
    df.withColumn("_day", expr(s"$epochSecCol div 86400"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("_day")
      .parquet(path)
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record-level change capture between corpus versions — the refresh loop
  * of a periodically re-crawled corpus. [[graft.ops.Stats]]'s
  * snapshot_diff answers "which FILES changed" at the manifest level;
  * this answers "which RECORDS were added / deleted / edited", and
  * [[applyChanges]] replays such a batch onto the previous version — so a
  * 100 TB corpus refresh ships the (usually tiny) change batch, not the
  * corpus. Diff then merge is identity by construction:
  * applyChanges(v1, diff(v1, v2)) == v2 row-for-row (pinned by oracle).
  *
  * Scale shape: [[diff]] is ONE full-outer join co-partitioned on the
  * key — each side shuffles once on the key it would bucket by anyway,
  * and the value comparison rides a single md5 digest per side computed
  * BEFORE the join (the wide row never crosses the shuffle twice).
  * [[applyChanges]] is one left-anti join (drop deleted/updated keys)
  * plus a union of the change batch's upserts — when the batch is small
  * (the normal refresh), AQE broadcasts it and the base never shuffles.
  */
object Cdc {

  /** Digest of the value columns, null-safe and unambiguous: each value
    * is length-prefixed so ("ab","c") never collides with ("a","bc"),
    * and null is distinct from any string. */
  private def valueDigest(valueCols: Seq[String]): Column =
    md5(concat_ws("|", valueCols.map { c =>
      val sc = col(c).cast("string")
      concat(coalesce(length(sc).cast("string"), lit("null")), lit(":"),
        coalesce(sc, lit("")))
    }: _*))

  /** Classify every key across two keyed snapshots:
    * op = 'I' (only in v2), 'D' (only in v1), 'U' (both, value digest
    * differs). Unchanged keys emit NO row — the change batch is
    * change-sized, not corpus-sized. Output: (keyCols..., op). */
  def diff(v1: DataFrame, v2: DataFrame, keyCols: Seq[String],
           valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty, "need key and value columns")
    val a = v1.select((keyCols.map(col) :+ valueDigest(valueCols).as("_da")): _*)
    val b = v2.select((keyCols.map(col) :+ valueDigest(valueCols).as("_db")): _*)
    a.join(b, keyCols, "full_outer")
      .withColumn("op",
        when(col("_da").isNull, lit("I"))
          .when(col("_db").isNull, lit("D"))
          .when(col("_da") =!= col("_db"), lit("U")))
      .filter(col("op").isNotNull)
      .select(keyCols.map(col) :+ col("op"): _*)
  }

  /** Apply a change batch to the base version: rows of `changes` carry
    * (keyCols..., op, <full new row values for I/U>). Deleted and
    * updated keys leave the base via ONE left-anti join; inserts and
    * updates enter from the batch. Column set of `changes` minus `op`
    * must equal the base's. */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
                   opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "need key columns")
    val gone = changes.select(keyCols.map(col): _*) // D, U, and I keys alike
    base.join(gone, keyCols, "left_anti")
      .unionByName(changes.filter(col(opCol) =!= "D").drop(opCol))
  }

  /** [[applyChanges]] against a persisted [[graft.io.GenTable]]: read the
    * current generation, merge the batch, commit the result as ONE new
    * generation — a reader sees the pre-batch table or the post-batch
    * table, never a half-applied state, and a crash mid-write leaves the
    * old generation current (the engine's one commit protocol, shared
    * with compaction/MV/upsert). Applying the SAME batch twice is a
    * no-op by construction — deleted keys are already gone (anti-join
    * passes through) and upserted rows re-enter identically — the
    * at-least-once delivery contract a refresh feed needs, pinned in
    * CdcSpec. Returns the committed generation number. */
  def applyToTable(spark: org.apache.spark.sql.SparkSession, root: String,
                   changes: DataFrame, keyCols: Seq[String],
                   opCol: String = "op"): Long = {
    val base = graft.io.GenTable.read(spark, root)
      .getOrElse(throw new IllegalStateException(s"no committed generation under $root"))
    val merged = applyChanges(base, changes, keyCols, opCol)
    graft.io.GenTable.replace(spark, root, merged)
  }
}

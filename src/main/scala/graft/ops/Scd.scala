package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history builder — the incremental-
  * curation primitive: fold a stream of versioned snapshots of an entity
  * (document metadata, source config, license state) into effective-dated
  * history rows, so any past state of the corpus is reconstructable with
  * `WHERE version_from <= v AND (version_to IS NULL OR v < version_to)`.
  *
  * Shape: ONE shuffle on the entity key; everything else is window
  * functions inside the partition (lag for change compression, lead for
  * interval close-off). No driver-side state, no join of the dimension
  * against itself — at 100 TB the key partitioning is the same shuffle a
  * groupBy would pay, and AQE handles skewed hot keys.
  */
object Scd {

  /** Compress versioned snapshots into SCD2 intervals.
    *
    * Input: one row per (key, version) observation carrying `attrCols`.
    * Output: one row per EFFECTIVE interval — consecutive versions with
    * identical attributes collapse into one row (no-op updates vanish):
    * (keyCols..., attrCols..., version_from, version_to, is_current) with
    * `version_to` null on the open interval and is_current = 1 on it.
    *
    * Duplicate (key, version) rows are rejected nowhere — the caller owns
    * version uniqueness; ties would make lag/lead order nondeterministic,
    * so `require` it cheap at the call site if the feed can violate it. */
  def history(snapshots: DataFrame, keyCols: Seq[String], versionCol: String,
              attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "SCD2 needs at least one tracked attribute")
    val internal = Seq("_chg", "version_from", "version_to", "is_current")
    require(!internal.exists(snapshots.columns.contains),
      s"input must not already contain ${internal.mkString("/")}")
    val k = keyCols.map(col)
    val wv = Window.partitionBy(k: _*).orderBy(col(versionCol))
    // change detection: struct equality vs the previous version (null-safe
    // <=> so a null attribute equals a null attribute, like DISTINCT FROM)
    val attrs = struct(attrCols.map(col): _*)
    val changed = lag(attrs, 1).over(wv).isNull ||
      !(lag(attrs, 1).over(wv) <=> attrs)
    val compressed = snapshots
      .withColumn("_chg", changed)
      .filter(col("_chg"))
    // close each interval at the NEXT surviving change (windows re-rank
    // after the filter, so lead sees only real changes)
    val w2 = Window.partitionBy(k: _*).orderBy(col(versionCol))
    compressed
      .withColumn("version_from", col(versionCol))
      .withColumn("version_to", lead(col(versionCol), 1).over(w2))
      .withColumn("is_current", when(col("version_to").isNull, 1).otherwise(0))
      .select(keyCols.map(col) ++ attrCols.map(col) ++
        Seq(col("version_from"), col("version_to"), col("is_current")): _*)
  }
}

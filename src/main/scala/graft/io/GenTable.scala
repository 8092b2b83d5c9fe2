package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generation-committed parquet table — THE crash-safety protocol for every
  * maintained (rewritten-in-place) artifact: streaming upsert targets,
  * MV/DSIR base state, compaction. One protocol where round 11 had three
  * (compaction's `__compact_old` rename-swap, the upsert stream's
  * rename-aside, and bare `saveAsTable` overwrite for state tables), each
  * of which leaned on rename being an atomic metadata operation — true on
  * HDFS/local, FALSE on S3-style object stores where rename is a
  * non-atomic copy+delete per object.
  *
  * Layout under `root`:
  * {{{
  *   root/gen-<n>/       immutable parquet generation (written once)
  *   root/_commits/<n>   marker file, content = the generation dir name
  * }}}
  * The live table is the generation named by the HIGHEST marker. A writer
  * (1) writes the full new generation to a fresh `gen-<n+1>` directory —
  * data paths are never renamed or mutated; (2) publishes it by writing
  * the marker to a dot-temp name and renaming it to `_commits/<n+1>` —
  * one small object, so the publish is a single atomic create on
  * HDFS/local and a single all-or-nothing PUT on object stores (the
  * `_last_checkpoint` / HDFSMetadataLog shape); (3) best-effort GCs
  * superseded generations and markers. A crash at ANY point leaves the
  * previous marker and its generation untouched: readers never observe a
  * missing or half-swapped table — the window the rename-swap protocols
  * could not close off-HDFS. The streaming per-batchId delta sinks
  * ([[graft.streaming.StreamingIngest.runAppendOnce]] family) are the
  * same idea with the query checkpoint as the commit record; this object
  * is that shape for FULL-TABLE artifacts.
  *
  * Single-writer, last-writer-wins — the same contract every maintained
  * artifact here already had. Concurrent readers of the PREVIOUS
  * generation can lose files to GC mid-read (this is crash-safety, not
  * snapshot isolation); a production multi-reader deployment layers a
  * retention window on the GC or uses a transactional table format, which
  * is this protocol productized. */
object GenTable {

  /** Conventional root for a NAMED state artifact (MV state, DSIR
    * weights): `<spark.sql.warehouse.dir>/genstore/<name>` — beside where
    * managed tables would live, but catalog-free so the layout is plain
    * files any engine can resolve. */
  def rootFor(spark: SparkSession, name: String): String = {
    require(name.matches("[A-Za-z0-9_]+"), s"unsafe artifact name: $name")
    val wh = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    new Path(new Path(wh, "genstore"), name).toString
  }

  private def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitsDir(root: String) = new Path(root, "_commits")

  /** Committed marker numbers, descending. */
  private def markers(fs: FileSystem, root: String): Seq[Long] = {
    val dir = commitsDir(root)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName).filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toLong).sorted.reverse
  }

  private def readMarker(fs: FileSystem, root: String, n: Long): String = {
    val in = fs.open(new Path(commitsDir(root), n.toString))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  /** The live generation: (marker number, absolute generation path). A
    * marker naming a vanished directory (interrupted GC of a corrupt
    * store) falls back to the next-lower committed marker rather than
    * failing the read. */
  def currentGen(spark: SparkSession, root: String): Option[(Long, String)] = {
    val fs = fsOf(spark, root)
    markers(fs, root).iterator.map { n =>
      (n, new Path(root, readMarker(fs, root, n)).toString)
    }.find { case (_, dir) => fs.exists(new Path(dir)) }
  }

  /** True iff the root has at least one committed generation. */
  def exists(spark: SparkSession, root: String): Boolean =
    currentGen(spark, root).isDefined

  /** The live table, if any generation was ever committed. */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    currentGen(spark, root).map { case (_, dir) => spark.read.parquet(dir) }

  /** Commit one new generation: `write` receives the fresh generation
    * directory to populate (typically `df.write.parquet(dir)`), and the
    * marker is published only after it returns. Returns the committed
    * marker number. Debris from a previously crashed attempt at the same
    * number is cleared before writing; GC of superseded generations runs
    * after the publish, best-effort. */
  /** Surviving generations under retention, newest first:
    * (marker number, absolute generation path). Markers whose directory
    * vanished (interrupted GC) are skipped. */
  def generations(spark: SparkSession, root: String): Seq[(Long, String)] = {
    val fs = fsOf(spark, root)
    markers(fs, root).flatMap { n =>
      val dir = new Path(root, readMarker(fs, root, n)).toString
      if (fs.exists(new Path(dir))) Some((n, dir)) else None
    }
  }

  /** Time-travel read of a RETAINED generation (committed with
    * `keep > 1`): the table exactly as marker `n` published it — the
    * audit/debugging read every table format ships ("what did the state
    * look like before yesterday's batch"). Fails with the retention
    * explanation when `n` was already GC'd, listing what survives. */
  def readGeneration(spark: SparkSession, root: String, n: Long): DataFrame = {
    val live = generations(spark, root)
    live.find(_._1 == n) match {
      case Some((_, dir)) => spark.read.parquet(dir)
      case None => throw new IllegalArgumentException(
        s"generation $n is not retained under $root (surviving: " +
          s"${live.map(_._1).mkString(", ")}); commit with keep > 1 to retain history")
    }
  }

  def commit(spark: SparkSession, root: String, keep: Int = 1)(write: String => Unit): Long = {
    require(keep >= 1, s"retention must keep at least the live generation, got $keep")
    commitImpl(spark, root, keep)(write)
  }

  private def commitImpl(spark: SparkSession, root: String, keep: Int)(write: String => Unit): Long = {
    val fs = fsOf(spark, root)
    // number PAST the highest existing marker, valid or dangling — a
    // marker whose generation vanished must be superseded, not reused
    // (reusing its number would make the dangling marker suddenly "valid"
    // the moment the new generation lands, before its own marker commits)
    val next = markers(fs, root).headOption.getOrElse(0L) + 1L
    val genName = s"gen-$next"
    val genDir = new Path(root, genName)
    fs.delete(genDir, true) // crashed prior attempt at this number
    write(genDir.toString)
    require(fs.exists(genDir), s"commit callback wrote nothing at $genDir")
    // publish: dot-temp + rename to the final numeric name (atomic create)
    fs.mkdirs(commitsDir(root))
    val tmp = new Path(commitsDir(root), s".$next.tmp")
    val out = fs.create(tmp, true)
    try out.write(genName.getBytes("UTF-8")) finally out.close()
    val marker = new Path(commitsDir(root), next.toString)
    if (!fs.rename(tmp, marker))
      throw new java.io.IOException(
        s"marker publish $tmp -> $marker failed (concurrent writer?); " +
          s"data intact at the previous generation")
    // best-effort GC under retention: keep the newest `keep` marked
    // generations, delete the rest (and unmarked debris). A crash here
    // leaves extra files, never a broken table.
    val retainedMarkers = markers(fs, root).take(keep)
    val retainedDirs = retainedMarkers.map(m => readMarker(fs, root, m)).toSet
    if (fs.exists(new Path(root))) fs.listStatus(new Path(root)).foreach { st =>
      val nm = st.getPath.getName
      if (nm.startsWith("gen-") && !retainedDirs.contains(nm) &&
        nm.stripPrefix("gen-").forall(_.isDigit)) fs.delete(st.getPath, true)
    }
    markers(fs, root).filterNot(retainedMarkers.contains).foreach(m =>
      fs.delete(new Path(commitsDir(root), m.toString), false))
    next
  }

  /** Replace the table's content with `df` as one committed generation;
    * `keep` retains that many newest generations for [[readGeneration]]. */
  def replace(spark: SparkSession, root: String, df: DataFrame, keep: Int = 1): Long =
    commit(spark, root, keep)(dir => df.write.parquet(dir))

  /** Compact the live generation's small files: rewrite to
    * ceil(totalBytes / targetBytes) files via a round-robin repartition
    * (no shuffle key — pure rebalancing) committed as the NEXT generation.
    * Incremental pipelines accrete kilobyte-scale files whose per-file
    * open/footer cost eventually dominates scans; periodic compaction is
    * the standard fix (what OPTIMIZE does in table formats) — and under
    * this protocol the table is never absent mid-compaction and a crash
    * at any point leaves the previous generation live. A hive-partitioned
    * generation is REFUSED: rewriting it flat would silently drop the
    * partition columns from the directory structure. */
  def compact(spark: SparkSession, root: String,
              targetBytes: Long = 128L << 20): Unit = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val fs = fsOf(spark, root)
    val (_, genDir) = currentGen(spark, root)
      .getOrElse(throw new IllegalArgumentException(s"no committed table at $root"))
    val gen = new Path(genDir)
    val partitioned = fs.listStatus(gen)
      .exists(s => s.isDirectory && s.getPath.getName.contains("="))
    require(!partitioned,
      s"$genDir is hive-partitioned; compact each partition separately " +
        "(a flat rewrite would drop the partition layout)")
    val totalBytes = fs.getContentSummary(gen).getLength
    val nFiles = math.max(1, ((totalBytes + targetBytes - 1) / targetBytes).toInt)
    val df = spark.read.parquet(genDir).repartition(nFiles)
    replace(spark, root, df)
    ()
  }
}

package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.vector.VectorOps

/** Structured Streaming formulation of the reference's incremental-ingest
  * semantics (SURVEY.md §2.9): the batch pipeline's resume-anti-join +
  * idempotent upsert (S11/J3/V3) is exactly the file-source + checkpoint +
  * `foreachBatch`-merge model. The `events` fixture drives watermarked
  * event-time windows.
  *
  * Streams read the same parquet the batch path reads; `ts` arrives as raw
  * nanos (INT64) and is floored to micros like [[graft.io.Tables.events]].
  */
object StreamingIngest {

  /** Run a streaming block in a CHILD session with a bounded
    * state-partition count. The shuffle-partition conf is pinned into a
    * streaming query's state layout at first start; 32 task-parallel state
    * stores for kilobyte-scale per-partition state just multiplies
    * checkpoint/commit overhead. A child session (same SparkContext, own
    * conf + catalog) means no mutation of the caller's session — no
    * save/restore race on a shared session, no leakage into concurrent
    * batch queries. The bound only ever LOWERS the inherited setting; a
    * production job sizes it to its state volume before the FIRST run
    * (the count cannot change across restarts).
    *
    * State-store provider: setting `graft.streaming.stateStore=rocksdb`
    * on the CALLER session routes every stateful operator in the child
    * session to RocksDBStateStoreProvider — per-partition state lives in
    * a local RocksDB instance (off-heap, spills to disk) with changelog/
    * snapshot files under the checkpoint, so state survives 100×
    * cardinality growth that would OOM the default HDFS-backed in-memory
    * provider. Like the partition count, the provider is pinned into a
    * query's checkpoint at first start — choose it before the first run. */
  private[streaming] def withStateSession[T](spark: SparkSession, n: Int = 4)(body: SparkSession => T): T = {
    val s = spark.newSession()
    val inherited = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // `graft.streaming.statePartitions` on the CALLER session overrides
    // the default small-state bound — the localEdgeThreshold idiom: the
    // r16 sf30 audit showed 4 in-memory state partitions OOM a 27M-event
    // sessionization that 32 RocksDB partitions absorb; a deployment
    // sizes this to its state volume before the FIRST run (the count is
    // pinned into the checkpoint).
    val statePartitions = spark.conf.getOption("graft.streaming.statePartitions")
      .map(_.toInt).getOrElse(math.min(inherited, n))
    s.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    if (spark.conf.getOption("graft.streaming.stateStore").contains("rocksdb"))
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    body(s)
  }

  /** Streaming source (path, leaf-file glob) for a table that is either a
    * single parquet FILE named `glob` under `dir` (the driver testdata
    * layout) or a Spark-written DIRECTORY of part files at `dir/glob`
    * (the StressGen sets). pathGlobFilter matches leaf FILE names and the
    * file-stream source does not recurse, so streaming `dir` with a
    * directory-named glob silently matches ZERO files — the r16 audit
    * caught sf10/sf30 stream cells reading 0.4 s because they processed
    * an empty stream. Dir-shaped tables stream from inside the directory
    * instead. A caller-passed glob that isn't a table name ("*") passes
    * through untouched. */
  private[streaming] def tableStreamSource(dir: String, glob: String): (String, String) = {
    // Resolve through the Hadoop FileSystem of the path itself, not
    // java.io.File (ADVICE r16): a java.io probe is silently false for
    // any non-local scheme (hdfs://, s3a://, even file: URIs), which
    // would quietly reinstate the zero-file-match bug this method fixed
    // the moment the table lives off the local disk.
    val sub = new org.apache.hadoop.fs.Path(dir, glob)
    val fs = sub.getFileSystem(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    val isDir = try fs.isDirectory(sub) catch { case _: Exception => false }
    if (isDir) (sub.toString, "*.parquet") else (dir, glob)
  }

  /** Batch-read the same (path, glob) a [[tableStreamSource]] stream will
    * consume — the schema probe every runner does before readStream. */
  private def tableSchema(ss: SparkSession, path: String, glob: String) =
    ss.read.option("pathGlobFilter", glob).parquet(path).schema

  /** Streaming source over the events table (file source, one-shot here;
    * directory-watching in production). Like [[graft.io.Tables.events]],
    * ingestion is schema-adaptive: `ts` normalizes to a TimestampType
    * instant whether the parquet carries TIMESTAMP(MICROS) (NTZ),
    * TIMESTAMP(NANOS)-as-long, or epoch-nanos int64. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val (path, glob) = tableStreamSource(dir, "events.parquet")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", glob).parquet(path)
    raw.withColumn("ts",
      timestamp_micros(graft.io.Tables.tsToMicros(schema("ts").dataType, col("ts"))))
  }

  /** Watermarked tumbling-window aggregate; runs to completion against the
    * current file set via a memory sink and returns the result. */
  def runTumbling(spark: SparkSession, dir: String, queryName: String = "graft_tumbling"): DataFrame = {
    withStateSession(spark) { ss =>
    val agg = eventsStream(ss, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(unix_timestamp(col("window.start")).as("win_start_s"), col("event_type"), col("n"), col("total_value"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    ss.table(queryName)
    }
  }

  /** Watermark LATE-DATA semantics pinned end-to-end — the one streaming
    * contract the family didn't yet oracle: append-mode emission +
    * late-input DROP. Two-phase run over a staged copy of the events
    * slice: phase 1 streams the `event_id % 5 != 0` rows at their real
    * timestamps and commits watermark = max(ts) − 1h; phase 2 delivers
    * (a) the % 5 == 0 rows REWRITTEN 10 hours before the corpus MINIMUM —
    * every one arrives with its window end far below the committed
    * watermark, so the rows are discarded and their ancient windows never
    * emit — and (b) one future "pusher" row at max(ts) + 3h whose only
    * job is to advance the final watermark past every phase-1 window end
    * (its own window stays open and never emits). The emitted file set is
    * therefore EXACTLY the phase-1 slice's tumbling aggregate, whatever
    * the micro-batch split: late windows end below the phase-1 watermark
    * (≤ any later watermark — dropped under any batching), the pusher's
    * window ends above the final one. A broken watermark (late rows
    * counted, open windows flushed, or a restart re-emitting) changes
    * rows or counts and fails the hash. Batch-replayable oracle: the
    * plain hour-window aggregate over the phase-1 slice. `value` rides
    * out 2^-20-quantized (the scalar-output contract). */
  def runLateDrops(spark: SparkSession, dir: String, base: String): DataFrame =
    runLateDropsImpl(spark, dir, base, attach = _ => ())

  /** [[runLateDrops]] with its watermark discards made OBSERVABLE (r14
    * verdict task 4): the same two-phase run with a
    * [[graft.StreamingDropListener]] attached to each phase's session,
    * reduced to a one-row audit card:
    * (n_dropped, n_emitted_windows, n_input_rows).
    *
    * Granularity caveat, pinned rather than papered over: Spark counts
    * `numRowsDroppedByWatermark` at the state operator, AFTER the
    * partial (map-side) aggregate — so the tally is late (window, type)
    * GROUPS per input partition, not raw input rows (the raw volume is
    * recoverable as n_input_rows − on-time − 1 if needed). With phase 2
    * staged as one file (one input partition) the count is exactly the
    * late slice's distinct (window, type) set: all late rows share one
    * rewritten timestamp, so n_dropped = its distinct event types —
    * deterministic, and the DuckDB oracle replays all three columns from
    * the events table. This is the row that turns "the watermark drops
    * late data" from pinned semantics into pinned ACCOUNTING. */
  def runLateDropsAudit(spark: SparkSession, dir: String, base: String): DataFrame = {
    val listener = new graft.StreamingDropListener(expectedQueries = 2)
    val out = runLateDropsImpl(spark, dir, base, attach = _.streams.addListener(listener))
    require(listener.awaitAllTerminated(120000L),
      "streaming listener bus did not drain both phases within 120s")
    val emitted = out.count()
    spark.range(1).select(
      lit(listener.droppedByWatermark).as("n_dropped"),
      lit(emitted).as("n_emitted_windows"),
      lit(listener.inputRows).as("n_input_rows"))
  }

  private def runLateDropsImpl(spark: SparkSession, dir: String, base: String,
                               attach: SparkSession => Unit): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val ev = graft.io.Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"), col("ts"), col("ts_us"))
    val b = ev.agg(min(col("ts_us")).as("mn"), max(col("ts_us")).as("mx")).head()
    val (mn, mx) = (b.getLong(0), b.getLong(1))
    def phase(): Unit = withStateSession(spark) { ss =>
      attach(ss)
      val agg = ss.readStream
        .schema("event_id BIGINT, event_type STRING, value DOUBLE, ts TIMESTAMP")
        .parquet(s"$base/in")
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(floor(value * 1048576.0) AS BIGINT)")).as("sum_vq"))
        .select(unix_timestamp(col("window.start")).as("win_start_s"),
          col("event_type"), col("n"), col("sum_vq"))
      val q = agg.writeStream.outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .format("parquet").option("path", s"$base/out")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // phase 1: the on-time slice (one staged write = one file batch, so no
    // intra-phase watermark race can drop real rows)
    ev.filter(col("event_id") % 5 =!= 0)
      .select(col("event_id"), col("event_type"), col("value"), col("ts"))
      .coalesce(4).write.mode("append").parquet(s"$base/in")
    phase()
    // phase 2: late rows (10h before the corpus minimum) + the pusher
    val late = ev.filter(col("event_id") % 5 === 0)
      .select(col("event_id"), col("event_type"), col("value"),
        timestamp_micros(lit(mn - 36000000000L)).as("ts"))
    val pusher = spark.range(1).select(lit(-1L).as("event_id"),
      lit("zz_pusher").as("event_type"), lit(0.0).as("value"),
      timestamp_micros(lit(mx + 10800000000L)).as("ts"))
    // ONE file on purpose (not 4): the audit variant reads the drop tally
    // from numRowsDroppedByWatermark, which Spark counts AFTER partial
    // aggregation — i.e. in (window, type) GROUPS per input partition,
    // not raw rows. A single staged file = a single input partition, so
    // the tally is exactly the late slice's distinct (window, type)
    // groups, deterministic and oracle-replayable
    late.unionByName(pusher).coalesce(1).write.mode("append").parquet(s"$base/in")
    phase()
    spark.read
      .schema("win_start_s BIGINT, event_type STRING, n BIGINT, sum_vq BIGINT")
      .parquet(s"$base/out")
  }

  /** Streaming dedup + idempotent upsert into a generation-committed
    * parquet table ([[graft.io.GenTable]]): `foreachBatch` applies the
    * same keyed MERGE the batch path uses (VectorOps.upsert) against the
    * live generation and commits the result as the next one,
    * checkpointed so replays converge — the streaming form of the
    * reference's deterministic-id rerun semantics.
    *
    * Crash-safety (the r12 one-protocol unification — this replaced a
    * rename-aside swap that was only sound where rename is atomic): the
    * merged table is fully written to an immutable `gen-<n+1>` directory
    * before one small marker object publishes it, so a crash at any
    * point — mid-write, pre-publish, pre-checkpoint-commit — leaves the
    * previous generation live, and the checkpoint-driven replay of the
    * interrupted batch merges into that committed prefix. A first batch
    * with no committed generation merges into empty. Read the target
    * with [[graft.io.GenTable.read]]. */
  def runUpsertStream(spark: SparkSession, dir: String, targetPath: String,
                      checkpoint: String): Unit = {
    val stream = eventsStream(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val existing = graft.io.GenTable.read(spark, targetPath)
          .getOrElse(spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema))
        val merged = VectorOps.upsert(existing, batch, "event_id")
        graft.io.GenTable.replace(spark, targetPath, merged)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  /** One AvailableNow pass of an APPEND-sink stream: each micro-batch
    * lands in its own `b<batchId>` subdirectory of `outPath` (overwrite
    * mode), and the checkpoint records committed batches — so a RESTART
    * with the same checkpoint over an unchanged file set commits NOTHING,
    * and over a grown file set commits only the new files. This is the
    * reference's resume-from-prior-output semantics (S11/J3) in streaming
    * form: the checkpoint is the durable seen-set, and the target doubles
    * rows if resume ever re-reads a committed batch (exactly what the
    * stream_resume oracle would catch). The per-batch directory keyed by
    * batchId makes the sink IDEMPOTENT under the foreachBatch contract's
    * at-least-once replay: a crash after the data write but before the
    * checkpoint commit re-runs that batchId, which overwrites the same
    * directory instead of appending a duplicate copy. Read the target
    * with `recursiveFileLookup=true`. */
  def runAppendOnce(spark: SparkSession, dir: String, outPath: String,
                    checkpoint: String): Unit = {
    withStateSession(spark) { ss =>
      val stream = eventsStream(ss, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      val q = stream.writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          batch.write.mode("overwrite").parquet(s"$outPath/b$batchId"); () }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
  }

  /** Streaming incremental NEAR-dedup against a PERSISTED minhash index —
    * the production continuous-curation loop composed from the pieces that
    * exist separately (S11 resume + V3 idempotent sink +
    * [[graft.ops.Dedup.incrementalNearDuplicatesIndexed]]): each
    * micro-batch of newly crawled documents probes the bucketed corpus
    * index ([[graft.ops.Dedup.writeMinhashIndex]]) and only NOVEL
    * documents — no confirmed near-duplicate in the kept corpus — are
    * appended. The checkpoint is the durable seen-set (a restart over an
    * unchanged file set commits nothing), and the per-batchId output
    * directory makes the append idempotent under foreachBatch's
    * at-least-once replay, exactly the [[runAppendOnce]] contract.
    *
    * Scale shape per batch: the increment pays its own signature pass and
    * shuffles itself into the index's bucket layout; the corpus side stays
    * two zero-exchange bucketed scans. Batch-INTERNAL near-dups are out of
    * scope here (they are [[graft.ops.Dedup.nearDuplicates]] on the batch,
    * composable in the same foreachBatch when wanted); novelty is defined
    * against the persisted corpus only.
    *
    * `glob` selects the watched files under `dir` (directory-watching in
    * production); `increment` filters the stream to the new-data slice.
    * `maxBucket` is the per-side hot-band cap forwarded to the probe
    * (production default [[graft.ops.Dedup.DefaultMaxBucket]]); the
    * oracle-pinned query rows pass Int.MaxValue because their batch-replay
    * oracles model the UNCAPPED pair set — same contract as
    * dedup_incremental_indexed. */
  def runDedupIncrementalOnce(spark: SparkSession, dir: String, outPath: String,
                              checkpoint: String, bandsTable: String,
                              setsTable: String, idCol: String, textCol: String,
                              glob: String = "documents.parquet",
                              increment: Column = lit(true),
                              k: Int = 3, numHashes: Int = 16,
                              minJaccardBp: Long = 5000L,
                              transform: DataFrame => DataFrame = identity,
                              maxBucket: Int = graft.ops.Dedup.DefaultMaxBucket): Unit = {
    withStateSession(spark) { ss =>
      val (srcPath, srcGlob) = tableStreamSource(dir, glob)
      val schema = tableSchema(ss, srcPath, srcGlob)
      val stream = ss.readStream.schema(schema)
        .option("pathGlobFilter", srcGlob).parquet(srcPath)
        .filter(increment)
      val q = stream.writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // per-batch curation hook (quality gates, projections, scoring)
          // runs BEFORE the novelty probe: gated-out docs never pay the
          // signature pass, and the probe's candidate set only carries
          // ids the batch still contains
          val shaped = transform(batch)
          val dupIds = graft.ops.Dedup.incrementalNearDuplicatesIndexed(
            shaped, idCol, textCol, bandsTable, setsTable, k, numHashes, minJaccardBp,
            maxBucket)
            .select(col("new_id")).distinct()
          val novel = shaped.join(dupIds, shaped(idCol) === dupIds("new_id"), "left_anti")
          novel.write.mode("overwrite").parquet(s"$outPath/b$batchId"); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
  }

  /** Streaming DSIR scoring (the importance-resampling analogue of
    * [[runDedupIncrementalOnce]]): each micro-batch of the watched slice
    * is scored map-only against the PERSISTED bucket-weight model
    * ([[graft.ops.Dsir.bucketWeights]], built once per corpus epoch) and
    * appended to a per-batchId directory — idempotent under foreachBatch's
    * at-least-once replay, and a restart over an unchanged file set
    * commits nothing (the checkpoint is the durable seen-set). Per batch:
    * one bigram pass over the BATCH only + the broadcast ≤8192-row weight
    * join — zero corpus-side work, the crawl-increment 100 TB shape. */
  def runDsirScoreOnce(spark: SparkSession, dir: String, outPath: String,
                       checkpoint: String, weightsTable: String,
                       idCol: String, textCol: String,
                       glob: String = "documents.parquet",
                       increment: Column = lit(true)): Unit = {
    withStateSession(spark) { ss =>
      val (srcPath, srcGlob) = tableStreamSource(dir, glob)
      val schema = tableSchema(ss, srcPath, srcGlob)
      val weights = graft.ops.Dsir.readWeights(ss, weightsTable)
      val stream = ss.readStream.schema(schema)
        .option("pathGlobFilter", srcGlob).parquet(srcPath)
        .filter(increment)
      val q = stream.writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.ops.Dsir.scoreWith(weights, batch, idCol, textCol)
            .write.mode("overwrite").parquet(s"$outPath/b$batchId"); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
  }

  /** Streaming materialized-aggregate maintenance (the streaming face of
    * [[graft.ops.Mv]]): each micro-batch writes its DELTA state —
    * `aggState(batch)` alone, one delta-sized aggregation, never a corpus
    * re-scan — to a per-batchId directory; the current total is
    * `merge(base, union of all committed deltas)`, which [[readMvState]]
    * computes in one small-state aggregation. Deltas (not merged totals)
    * are what make this restart-correct: per-batchId overwrite is
    * idempotent under foreachBatch replay, a restart over an unchanged
    * file set commits nothing, and — because every column is a
    * commutative monoid — the reader's fold is batch-count- and
    * order-invariant, so a source that splits one increment into many
    * micro-batches converges to the same state as a single batch.
    * (Folding INSIDE foreachBatch would instead merge each batch against
    * the base, double-counting it across batches — the trap this shape
    * exists to avoid.) */
  def runMvMergeOnce(spark: SparkSession, dir: String, outPath: String,
                     checkpoint: String,
                     keyCol: String, charsCol: String,
                     glob: String = "documents.parquet",
                     increment: Column = lit(true)): Unit = {
    withStateSession(spark) { ss =>
      val (srcPath, srcGlob) = tableStreamSource(dir, glob)
      val schema = tableSchema(ss, srcPath, srcGlob)
      val stream = ss.readStream.schema(schema)
        .option("pathGlobFilter", srcGlob).parquet(srcPath)
        .filter(increment)
      val q = stream.writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.ops.Mv.aggState(batch, keyCol, charsCol)
            .write.mode("overwrite").parquet(s"$outPath/b$batchId"); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
  }

  /** The maintained total: base state ⊎ every committed delta under
    * `outPath` — one aggregation over key-cardinality-sized inputs. */
  def readMvState(spark: SparkSession, stateTable: String, outPath: String,
                  keyCol: String): DataFrame =
    graft.ops.Mv.merge(graft.ops.Mv.readState(spark, stateTable),
      spark.read.parquet(s"$outPath/b*"), keyCol)

  /** Streaming link-graph maintenance (the streaming face of the r17
    * incremental graph leg, the [[runMvMergeOnce]] shape): each
    * micro-batch of the crawl increment synthesizes its links via
    * `edges`, canonicalizes, anti-joins the PERSISTED base edge set
    * (re-crawled links contribute nothing) and commits the genuinely-new
    * edges to a per-batchId directory — delta-sized work, never a corpus
    * re-scan, idempotent under foreachBatch replay. Unlike the MV deltas
    * these are SET elements, not monoid values, so cross-batch duplicate
    * delivery is resolved on the READ side ([[readGraphDegrees]]
    * distincts the union of committed deltas — delta-volume work) rather
    * than by ordering the commits. */
  def runGraphEdgesOnce(spark: SparkSession, dir: String, outPath: String,
                        checkpoint: String, undRoot: String,
                        edges: DataFrame => DataFrame,
                        glob: String = "documents.parquet",
                        increment: Column = lit(true)): Unit = {
    withStateSession(spark) { ss =>
      val (srcPath, srcGlob) = tableStreamSource(dir, glob)
      val schema = tableSchema(ss, srcPath, srcGlob)
      val baseUnd = graft.io.GenTable.read(ss, undRoot)
        .getOrElse(sys.error(s"no committed graph edge state at $undRoot"))
      val stream = ss.readStream.schema(schema)
        .option("pathGlobFilter", srcGlob).parquet(srcPath)
        .filter(increment)
      val q = stream.writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.ops.Graph.newUndirectedEdges(baseUnd, edges(batch))
            .write.mode("overwrite").parquet(s"$outPath/b$batchId"); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
  }

  /** The maintained degree card: base degree state ⊎ degrees of the
    * DISTINCT union of every committed delta edge — the additive merge
    * is sound because the read-side distinct restores set semantics
    * whatever the batching or delivery duplication. */
  def readGraphDegrees(spark: SparkSession, degRoot: String,
                       outPath: String): DataFrame =
    graft.ops.Graph.histogramOfDegrees(
      graft.ops.Graph.mergeDegrees(
        graft.io.GenTable.read(spark, degRoot)
          .getOrElse(sys.error(s"no committed degree state at $degRoot")),
        graft.ops.Graph.degreesOf(
          spark.read.parquet(s"$outPath/b*").distinct())))

  /** Streaming min-value-sketch maintenance ([[graft.ops.Kmv]]'s
    * streaming face, the runMvMergeOnce shape): each micro-batch of the
    * crawl increment commits its own per-batch SKETCH delta (≤ b
    * rows/source — the state that crosses the commit is sketch-sized,
    * never token-sized); the read-side MIN-merge of base + deltas equals
    * the single-pass sketch whatever the batching, because per-(group,
    * bucket) MIN is a commutative idempotent monoid — the same
    * column-algebra contract as the MV row, so duplicate delivery and
    * batch splits both converge. */
  def runSketchOnce(spark: SparkSession, dir: String, outPath: String,
                    checkpoint: String,
                    groupCol: String, textCol: String, b: Int,
                    glob: String = "documents.parquet",
                    increment: Column = lit(true)): Unit = {
    withStateSession(spark) { ss =>
      val (srcPath, srcGlob) = tableStreamSource(dir, glob)
      val schema = tableSchema(ss, srcPath, srcGlob)
      val stream = ss.readStream.schema(schema)
        .option("pathGlobFilter", srcGlob).parquet(srcPath)
        .filter(increment)
      val q = stream.writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val terms = batch.select(col(groupCol),
              explode(graft.ops.Dedup.tokensCol(col(textCol))).as("term"))
            .filter(col("term") =!= "")
          graft.ops.Kmv.minSketch(terms, Seq(groupCol), col("term"), b)
            .write.mode("overwrite").parquet(s"$outPath/b$batchId"); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
  }

  /** Streaming exact dedup (the north-star dedup family's streaming face):
    * every event delivered twice — a stand-in for the at-least-once
    * delivery a 100 TB ingest sees — collapses back to one copy per key
    * via watermark-bounded keyed state, then aggregates. The result
    * provably equals the single-copy counts.
    *
    * Duplicates here arrive WITHIN a micro-batch (a single-file source
    * yields one batch); the cross-BATCH state path is exercised
    * separately by StreamingSpec's maxFilesPerTrigger=1 test, where the
    * second copy arrives a batch later and must hit stored state. */
  def runDedupedCounts(spark: SparkSession, dir: String,
                       queryName: String = "graft_stream_dedup",
                       checkpoint: Option[String] = None): DataFrame = {
    withStateSession(spark) { ss =>
    val replayed = eventsStream(ss, dir)
      .withColumn("_copy", explode(expr("array(0, 1)")))
    val agg = replayed
      .select(col("event_id"), col("event_type"), col("ts"))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = agg.writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
    val q = checkpoint.fold(w)(c => w.option("checkpointLocation", c))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    ss.table(queryName)
    }
  }

  /** Stream-stream interval join: click events joined to the view events
    * they follow within 10 minutes, per user. Both sides watermarked so
    * Spark bounds the join state (a side's buffered rows are evicted once
    * the other side's watermark passes the interval's reach) — the
    * canonical attribution-join shape at scale: state is
    * O(events within the interval), never O(stream). Inner join: matches
    * emit as they are found, and with the fixture's single-file source
    * (one micro-batch) the result equals the batch join exactly. Under
    * multi-batch arrival the usual streaming caveat applies — rows
    * arriving later than the watermark allows are dropped as late, so
    * equality with the batch join holds only for data within the
    * watermark delay (here 1 hour vs a 10-minute interval). */
  def runStreamJoin(spark: SparkSession, dir: String,
                    queryName: String = "graft_stream_join"): DataFrame = {
    withStateSession(spark) { ss =>
    val views = eventsStream(ss, dir).filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("event_id").as("view_id"))
      .withWatermark("v_ts", "1 hour")
    val clicks = eventsStream(ss, dir).filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("click_id"))
      .withWatermark("c_ts", "1 hour")
    val joined = views.join(clicks,
      col("v_user") === col("c_user") &&
        col("c_ts") >= col("v_ts") &&
        col("c_ts") <= col("v_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("v_user").as("user_id"), col("view_id"), col("click_id"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    ss.table(queryName)
    }
  }

  /** Stateful sessionization on the stream: event-time session windows with
    * a 30-minute gap, watermarked. */
  def runSessionWindows(spark: SparkSession, dir: String, queryName: String = "graft_sessions"): DataFrame = {
    withStateSession(spark) { ss =>
    val agg = eventsStream(ss, dir)
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"), unix_timestamp(col("session_window.start")).as("session_start_s"),
        col("n_events"), col("total_value"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    ss.table(queryName)
    }
  }
}

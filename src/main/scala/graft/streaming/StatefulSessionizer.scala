package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

final case class SessionEvent(user_id: Long, ts_us: Long, value: Double, ts: java.sql.Timestamp)
final case class SessionState(startUs: Long, lastUs: Long, n: Long, total: Double)
final case class SessionOut(user_id: Long, session_start_s: Long, n_events: Long, total_value_c: Long)
final case class SessionSnap(user_id: Long, session_start_s: Long, n_events: Long,
                             total_value_c: Long, is_open: Int)

/** Custom stateful streaming operator (north-star §2.9): sessionization via
  * `flatMapGroupsWithState` — the hand-rolled state machine Spark's built-in
  * `session_window` compiles to, exposed for semantics the built-in can't
  * express (per-session running aggregates, mid-session emission, custom
  * eviction). State is partitioned by user key, timeout-driven, and scales
  * with active sessions rather than events.
  */
object StatefulSessionizer {

  val GapUs: Long = 30L * 60 * 1000000 // 30-minute session gap

  /** The gap-rule fold shared by both emission modes: returns the sessions
    * CLOSED by this batch's events (in order) and the still-open tail. */
  private def advance(events: Iterator[SessionEvent],
                      start: Option[SessionState]): (Vector[SessionState], Option[SessionState]) = {
    val sorted = events.toVector.sortBy(_.ts_us)
    var cur = start
    val closed = Vector.newBuilder[SessionState]
    for (e <- sorted) {
      cur match {
        case Some(s) if e.ts_us - s.lastUs <= GapUs =>
          cur = Some(s.copy(lastUs = e.ts_us, n = s.n + 1, total = s.total + e.value))
        case Some(s) =>
          closed += s
          cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
        case None =>
          cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
      }
    }
    (closed.result(), cur)
  }

  /** Register state + timeout for the open session; the timeout must lie
    * strictly beyond the current watermark (clamped so a stale session
    * can't register an already-passed timestamp, which throws). */
  private def keepOpen(state: GroupState[SessionState], s: SessionState): Unit = {
    state.update(s)
    val timeoutMs = math.max(s.lastUs / 1000L + GapUs / 1000L,
      state.getCurrentWatermarkMs() + 1)
    state.setTimeoutTimestamp(timeoutMs)
  }

  /** Emit closed sessions; keep open ones in state until timeout. */
  private def track(userId: Long, events: Iterator[SessionEvent],
                    state: GroupState[SessionState]): Iterator[SessionOut] = {
    def out(s: SessionState) =
      SessionOut(userId, s.startUs / 1000000L, s.n, math.round(s.total * 100))
    val (closedStates, cur) = advance(events, state.getOption)
    val closed = closedStates.map(out)
    if (state.hasTimedOut) {
      val fin = cur.map(out)
      state.remove()
      return (closed ++ fin).iterator
    }
    cur.foreach(keepOpen(state, _))
    closed.iterator
  }

  /** [[track]] plus MID-SESSION EMISSION — the semantics the custom state
    * machine exists for, and the one `session_window` cannot express: the
    * built-in only materializes a session when it CLOSES, while a
    * monitoring/alerting consumer needs the running aggregates of sessions
    * still in flight. After each data batch, every still-open session
    * emits a progress snapshot (`is_open=1`) carrying its
    * running count/total; closed sessions emit with `is_open=0` exactly
    * like [[track]]. State lifecycle is identical to [[track]]'s. */
  private def trackProgress(userId: Long, events: Iterator[SessionEvent],
                            state: GroupState[SessionState]): Iterator[SessionSnap] = {
    def snap(s: SessionState, open: Int) =
      SessionSnap(userId, s.startUs / 1000000L, s.n, math.round(s.total * 100), open)
    val (closedStates, cur) = advance(events, state.getOption)
    val closed = closedStates.map(snap(_, 0))
    if (state.hasTimedOut) {
      val fin = cur.map(snap(_, 0))
      state.remove()
      return (closed ++ fin).iterator
    }
    cur.foreach { s => keepOpen(state, s) }
    // the progress snapshot: only on data batches (hasTimedOut path above
    // returns early), one per open session per batch
    (closed ++ cur.map(snap(_, 1))).iterator
  }

  /** Each user's FINAL session start over a bounded events frame (batch
    * islands replay of [[track]]'s gap rule). Whether the final session is
    * emitted by a drained stream depends on whether the end-of-stream
    * watermark fires its timeout — a boundary artifact of finite input,
    * not of the operator — so comparisons against a batch reference
    * anti-join these rows out on both sides. */
  def lastSessionStarts(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    events
      .withColumn("_prev", lag(col("ts_us"), 1).over(w))
      .withColumn("_new", when(col("_prev").isNull ||
        col("ts_us") - col("_prev") > GapUs, 1L).otherwise(0L))
      .withColumn("_sid", sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("_sid"))
      .agg(expr("min(ts_us) div 1000000L").as("session_start_s"))
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("_sid").desc)))
      .filter(col("_rk") === 1)
      .select(col("user_id"), col("session_start_s"))
  }

  /** Run the stateful sessionizer over the events stream to completion and
    * return closed sessions. Sessions still open at end-of-stream (last
    * event within gap+watermark-delay of the stream's max event time) stay
    * in state — inherent to watermark semantics; a production stream closes
    * them as the watermark advances. */
  def run(spark: SparkSession, dir: String, queryName: String = "graft_stateful_sessions",
          checkpoint: Option[String] = None, outDir: Option[String] = None): DataFrame = {
    StreamingIngest.withStateSession(spark) { ss =>
    import ss.implicits._
    val withTime = StreamingIngest.eventsStream(ss, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withWatermark("ts", "1 minute")
      .select(col("user_id"), col("ts_us"), col("value"), col("ts")).as[SessionEvent]
    val sessions = withTime
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(track)
    outDir match {
      case Some(out) =>
        // file sink (the runDedupIncrementalOnce idiom): the memory sink
        // COLLECTS every emitted session into the driver — fine for a
        // fixture-scale oracle read, a driver OOM at the sf30 audit
        // (millions of closed sessions). Per-batch parquet appends keep
        // the emission distributed; the read-back is a normal scan.
        val w = sessions.writeStream.outputMode("append")
          .foreachBatch { (b: org.apache.spark.sql.Dataset[SessionOut], id: Long) =>
            b.write.mode("overwrite").parquet(s"$out/b$id"); ()
          }
        val q = checkpoint.fold(w)(c => w.option("checkpointLocation", c))
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val fs = org.apache.hadoop.fs.FileSystem.get(ss.sparkContext.hadoopConfiguration)
        // globStatus returns NULL (not an empty array) when the glob's
        // parent dir doesn't exist — i.e. when the stream ran zero
        // batches and never created $out (ADVICE r16)
        if (Option(fs.globStatus(new org.apache.hadoop.fs.Path(s"$out/b*"))).exists(_.nonEmpty))
          ss.read.parquet(s"$out/b*")
        else ss.emptyDataset[SessionOut].toDF()
      case None =>
        val w = sessions.writeStream.outputMode("append")
          .format("memory").queryName(queryName)
        val q = checkpoint.fold(w)(c => w.option("checkpointLocation", c))
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        ss.table(queryName)
    }
    }
  }

  /** [[run]] in progress-emission mode ([[trackProgress]]): the returned
    * frame carries both closed sessions (`is_open=0`) and per-batch open-
    * session snapshots (`is_open=1`). With the single-file events source
    * the data arrives as ONE micro-batch, so each user snapshots exactly
    * once — their final session with full running aggregates — which is
    * what the batch oracle replays. */
  def runWithProgress(spark: SparkSession, dir: String,
                      queryName: String = "graft_stateful_sessions_progress",
                      checkpoint: Option[String] = None): DataFrame = {
    StreamingIngest.withStateSession(spark) { ss =>
    import ss.implicits._
    val withTime = StreamingIngest.eventsStream(ss, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withWatermark("ts", "1 minute")
      .select(col("user_id"), col("ts_us"), col("value"), col("ts")).as[SessionEvent]
    val sessions = withTime
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(trackProgress)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    ss.table(queryName)
    }
  }
}

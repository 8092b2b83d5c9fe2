package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

final case class SessionEvent(user_id: Long, ts_us: Long, value: Double, ts: java.sql.Timestamp)
final case class SessionState(startUs: Long, lastUs: Long, n: Long, total: Double)
final case class SessionOut(user_id: Long, session_start_s: Long, n_events: Long, total_value_c: Long)

/** Custom stateful streaming operator (north-star §2.9): sessionization via
  * `flatMapGroupsWithState` — the hand-rolled state machine Spark's built-in
  * `session_window` compiles to, exposed for semantics the built-in can't
  * express (per-session running aggregates, mid-session emission, custom
  * eviction). State is partitioned by user key, timeout-driven, and scales
  * with active sessions rather than events.
  */
object StatefulSessionizer {

  val GapUs: Long = 30L * 60 * 1000000 // 30-minute session gap

  /** Emit closed sessions; keep open ones in state until timeout. */
  private def track(userId: Long, events: Iterator[SessionEvent],
                    state: GroupState[SessionState]): Iterator[SessionOut] = {
    val sorted = events.toVector.sortBy(_.ts_us)
    var cur = state.getOption
    val closed = Vector.newBuilder[SessionOut]
    for (e <- sorted) {
      cur match {
        case Some(s) if e.ts_us - s.lastUs <= GapUs =>
          cur = Some(s.copy(lastUs = e.ts_us, n = s.n + 1, total = s.total + e.value))
        case Some(s) =>
          closed += SessionOut(userId, s.startUs / 1000000L, s.n, math.round(s.total * 100))
          cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
        case None =>
          cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
      }
    }
    if (state.hasTimedOut) {
      val out = cur.map(s => SessionOut(userId, s.startUs / 1000000L, s.n, math.round(s.total * 100)))
      state.remove()
      return (closed.result() ++ out).iterator
    }
    cur.foreach { s =>
      state.update(s)
      // timeout must lie strictly beyond the current watermark; clamp so a
      // stale session can't register an already-passed timestamp (throws)
      val timeoutMs = math.max(s.lastUs / 1000L + GapUs / 1000L,
        state.getCurrentWatermarkMs() + 1)
      state.setTimeoutTimestamp(timeoutMs)
    }
    closed.result().iterator
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
          checkpoint: Option[String] = None): DataFrame = {
    StreamingIngest.withStateSession(spark) { ss =>
    import ss.implicits._
    val withTime = StreamingIngest.eventsStream(ss, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withWatermark("ts", "1 minute")
      .select(col("user_id"), col("ts_us"), col("value"), col("ts")).as[SessionEvent]
    val sessions = withTime
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(track)
    val w = sessions.writeStream.outputMode("append")
      .format("memory").queryName(queryName)
    val q = checkpoint.fold(w)(c => w.option("checkpointLocation", c))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    ss.table(queryName)
    }
  }
}

package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import scala.collection.concurrent.TrieMap

/** B6: progress instrumentation. The reference wraps its batch loops in
  * tqdm (preprocessing/fulltext_enricher.py:156,179 — "IDConv (DOI→PMCID)"
  * / "EFetch (PMC JATS)" batch bars; pipelines/ingest_and_embed.py:69).
  * On Spark, per-task progress already streams to the Web UI; this
  * listener is the HEADLESS equivalent for driver logs and cron runs:
  * tqdm-shaped `desc: k/n (p%)` lines per stage, throttled to at most
  * `maxLines` per stage so a 10k-task stage at 100 TB emits bounded
  * output. Listener-bus callbacks run on the driver's event thread —
  * executors and the job's critical path never see it. */
final class ProgressListener(out: String => Unit = s => System.err.println(s),
                             maxLines: Int = 10) extends SparkListener {

  private final case class St(name: String, total: Int)
  private val stages = TrieMap.empty[Int, St]
  private val done = TrieMap.empty[Int, Int]

  override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
    stages.put(e.stageInfo.stageId, St(e.stageInfo.name, e.stageInfo.numTasks))
    done.put(e.stageInfo.stageId, 0)
  }

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val id = e.stageId
    stages.get(id).foreach { st =>
      val d = done.updateWith(id)(c => Some(c.getOrElse(0) + 1)).getOrElse(0)
      // emit every ceil(total/maxLines) tasks, and always the last one
      val stride = math.max(1, (st.total + maxLines - 1) / maxLines)
      if (st.total > 0 && (d % stride == 0 || d == st.total))
        out(f"[progress] ${shortName(st.name)}: $d/${st.total} tasks (${100L * d / st.total}%d%%)")
    }
  }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
    val id = e.stageInfo.stageId
    stages.remove(id); done.remove(id); ()
  }

  private def shortName(n: String): String = {
    val head = n.takeWhile(_ != '\n')
    if (head.length <= 60) head else head.take(57) + "..."
  }
}

object ProgressListener {
  /** Attach a fresh listener to the session's context; returns it so the
    * caller can detach with `spark.sparkContext.removeSparkListener`. */
  def attach(spark: org.apache.spark.sql.SparkSession,
             out: String => Unit = s => System.err.println(s),
             maxLines: Int = 10): ProgressListener = {
    val l = new ProgressListener(out, maxLines)
    spark.sparkContext.addSparkListener(l)
    l
  }
}

/** B6's STREAMING sibling (r14 verdict task 4): watermark late-data
  * drops made observable as a number. Structured Streaming reports rows
  * discarded by the watermark per micro-batch in
  * `StreamingQueryProgress.stateOperators[].numRowsDroppedByWatermark`;
  * at 100 TB an operator needs that tally as queryable data — a
  * watermark silently discarding 40% of a day's events is a data-loss
  * incident, not a log line. This listener accumulates drops and input
  * rows across every progress event of the queries it observes.
  *
  * Determinism contract: the listener bus is ASYNC, so callers must not
  * read the tallies right after `awaitTermination` — events may still be
  * in flight. The bus is FIFO per query: the terminated event is posted
  * after the query's last progress event, so [[awaitAllTerminated]]
  * (latch over `expectedQueries` terminations) is the happens-after
  * barrier that makes the counters exact, not racy. */
final class StreamingDropListener(expectedQueries: Int)
  extends org.apache.spark.sql.streaming.StreamingQueryListener {
  import org.apache.spark.sql.streaming.StreamingQueryListener._
  private val dropped = new java.util.concurrent.atomic.AtomicLong(0L)
  private val input = new java.util.concurrent.atomic.AtomicLong(0L)
  private val done = new java.util.concurrent.CountDownLatch(expectedQueries)

  /** Rows discarded by a watermark across all observed progress. */
  def droppedByWatermark: Long = dropped.get()
  /** Input rows across all observed progress. */
  def inputRows: Long = input.get()
  /** Block until `expectedQueries` queries have terminated AND their
    * progress events have therefore drained (FIFO bus). */
  def awaitAllTerminated(timeoutMs: Long): Boolean =
    done.await(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    dropped.addAndGet(p.stateOperators.map(_.numRowsDroppedByWatermark).sum)
    input.addAndGet(p.numInputRows)
    ()
  }
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = done.countDown()
}

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

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.enrich.{BatchConfig, BatchResult, BatchTransport, FixtureTransport, HttpBatch, SlidingWindowRateLimiter}

class HttpBatchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val idMap = Map("d1" -> "PMC1", "d2" -> "PMC2", "d4" -> "PMC4")
  private val failMap = Map("d3" -> "idconv HTTP 400")

  test("S6 batched enrichment: hits, explained failures, silent misses") {
    val input = Seq("d1", "d2", "d3", "d5").toDF("doi_norm")
    val out = HttpBatch.enrich(input, "doi_norm", new FixtureTransport(idMap, failMap),
      BatchConfig(batchSize = 2, throttleMs = 0, backoffMs = 0))
      .collect().map(r => r.getString(0) -> (Option(r.getString(1)), Option(r.getString(2)))).toMap
    assert(out("d1") == (Some("PMC1"), None))
    assert(out("d3") == (None, Some("idconv HTTP 400")))
    assert(out("d5") == (None, None)) // J5 default applied downstream
  }

  test("B5 retry recovers from transient failures") {
    FlakyCounter.counter.set(0)
    val input = Seq("a", "b").toDF("k").coalesce(1)
    val out = HttpBatch.enrich(input, "k", new FlakyTransport(2),
      BatchConfig(batchSize = 10, attempts = 3, backoffMs = 0, throttleMs = 0))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("a" -> "Va", "b" -> "Vb"))
  }

  test("B5 exhaustion converts to per-key failures with the last error") {
    FlakyCounter.counter.set(0)
    val input = Seq("a").toDF("k").coalesce(1)
    val out = HttpBatch.enrich(input, "k", new FlakyTransport(99),
      BatchConfig(batchSize = 10, attempts = 2, backoffMs = 0, throttleMs = 0))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).head
    assert(out._2 == null)
    assert(out._3.startsWith("fetch failed: transient"))
  }

  test("A4 single-item fallback retries batch misses individually") {
    val input = Seq("x", "miss").toDF("k").coalesce(1)
    val withFallback = HttpBatch.enrich(input, "k", new BatchMissTransport,
      BatchConfig(batchSize = 10, throttleMs = 0, singleFallback = true))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(withFallback == Map("x" -> "Vx", "miss" -> "singlemiss"))
    val without = HttpBatch.enrich(input, "k", new BatchMissTransport,
      BatchConfig(batchSize = 10, throttleMs = 0, singleFallback = false))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(without("miss").isEmpty)
  }

  test("B4 sliding-window rate limiter delays the (n+1)th acquisition") {
    val limiter = new SlidingWindowRateLimiter(perMinute = 3, windowMs = 300)
    val t0 = System.currentTimeMillis()
    (1 to 4).foreach(_ => limiter.acquire())
    val elapsed = System.currentTimeMillis() - t0
    assert(elapsed >= 250, s"4th acquire should wait for the window, took ${elapsed}ms")
  }
}

/** JVM-wide counter shared with executor threads (local mode = same JVM). */
object FlakyCounter {
  val counter = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Transport that fails the first `failures` calls, then succeeds —
  * exercises B5 retry/backoff. Top-level so the task closure serializes. */
class FlakyTransport(failures: Int) extends BatchTransport {
  def fetch(keys: Seq[String]): BatchResult = {
    val n = FlakyCounter.counter.incrementAndGet()
    if (n <= failures) throw new RuntimeException(s"transient $n")
    BatchResult(keys.map(k => k -> s"V$k").toMap, Map.empty)
  }
}

/** Transport whose batch calls miss a key but single calls resolve it —
  * exercises the A4 fallback. */
class BatchMissTransport extends BatchTransport {
  def fetch(keys: Seq[String]): BatchResult =
    if (keys.size > 1) BatchResult(keys.filter(_ != "miss").map(k => k -> s"V$k").toMap, Map.empty)
    else BatchResult(keys.map(k => k -> s"single$k").toMap, Map.empty)
}

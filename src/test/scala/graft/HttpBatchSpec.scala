package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.enrich.{BatchConfig, BatchResult, BatchTransport, FixtureTransport, HttpBatch, Sleeper, SlidingWindowRateLimiter, UrlConnectionTransport}

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

  test("virtual sleeper: the retry loop's wait schedule is computed, accounted, not wall-waited") {
    // Retry-After lane: the server's wait wins on every retry gap —
    // attempts=3 sleeps after attempt 1 and 2, never after the last
    val vs = new Sleeper.Virtual
    val r1 = HttpBatch.fetchWithRetry(
      new BatchTransport { def fetch(keys: Seq[String]) = throw graft.enrich.RetryAfter(500) },
      Seq("k"), BatchConfig(attempts = 3, backoffMs = 999, sleeper = vs), null)
    assert(r1.fails("k").startsWith("fetch failed: HTTP 429"))
    assert(vs.totalSleptMs == 1000L, s"expected 500+500 accounted, got ${vs.totalSleptMs}")
    // exponential lane: backoff*1.5^(attempt-1) → 100 + 150
    val vs2 = new Sleeper.Virtual
    val r2 = HttpBatch.fetchWithRetry(
      new BatchTransport { def fetch(keys: Seq[String]) = throw new RuntimeException("boom") },
      Seq("k"), BatchConfig(attempts = 3, backoffMs = 100, sleeper = vs2), null)
    assert(r2.fails("k") == "fetch failed: boom")
    assert(vs2.totalSleptMs == 250L, s"expected 100+150 accounted, got ${vs2.totalSleptMs}")
    // and the throttle goes through the same seam: 2 batches → 2 throttles
    val vs3 = new Sleeper.Virtual
    HttpBatch.enrich(Seq("d1", "d2").toDF("k").coalesce(1), "k",
      new FixtureTransport(idMap),
      BatchConfig(batchSize = 1, throttleMs = 40, sleeper = vs3)).collect()
    assert(vs3.totalSleptMs == 0L,
      "per-task sleeper copies account executor-side; the driver instance stays 0 " +
        s"(got ${vs3.totalSleptMs}) — wall time is what the seam removes")
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

  test("TieredFixtureTransport: the full fallback taxonomy, invariant to batch splits") {
    // keys 0..23 cover every lane twice; run at two batch sizes and two
    // partitionings — the outcome is a pure function of the key, so all
    // four runs must agree row for row with the arithmetic oracle
    val keys = (0L until 24L).map(_.toString)
    def expected(id: Long): (Option[String], Option[String]) = {
      val value = if (id % 3 == 1) Some(s"B$id") else if (id % 6 == 0) Some(s"S$id") else None
      val reason =
        if (id % 3 == 2) Some("batch miss: http 404")
        else if (id % 12 == 3) Some("single miss: not found")
        else if (id % 12 == 9) Some("fetch failed: HTTP 429, retry after 1ms")
        else None
      (value, reason)
    }
    for (bs <- Seq(5, 16); parts <- Seq(1, 7)) {
      val input = keys.toDF("doi").repartition(parts)
      val out = HttpBatch.enrich(input, "doi", new graft.enrich.TieredFixtureTransport,
        BatchConfig(batchSize = bs, attempts = 2, backoffMs = 0, throttleMs = 0,
          singleFallback = true))
        .collect().map(r => r.getString(0).toLong ->
          ((Option(r.getString(1)), Option(r.getString(2))))).toMap
      assert(out.size == 24)
      for (id <- 0L until 24L)
        assert(out(id) == expected(id), s"key $id at batchSize=$bs parts=$parts")
    }
    // without the A4 fallback the second tier never fires: batch-silent
    // keys stay (None, None) — the fallback is load-bearing, not ambient
    val noFb = HttpBatch.enrich(keys.toDF("doi"), "doi",
      new graft.enrich.TieredFixtureTransport,
      BatchConfig(batchSize = 16, attempts = 2, backoffMs = 0, throttleMs = 0,
        singleFallback = false))
      .collect().map(r => r.getString(0).toLong ->
        ((Option(r.getString(1)), Option(r.getString(2))))).toMap
    for (id <- Seq(0L, 3L, 9L, 12L)) assert(noFb(id) == ((None, None)))
  }

  test("Springer.enrich honors the cfg retry machinery (routes via fetchWithRetry)") {
    // One transient failure, then a valid JATS payload: with attempts=3 the
    // row comes back ok — before the fetchWithRetry routing, the raw
    // transport.fetch would have thrown and killed the task.
    val xml = "<resp><record><article><front><article-meta>" +
      """<article-id pub-id-type="doi">10.1/r</article-id>""" +
      "<abstract><p>a</p></abstract></article-meta></front></article></record></resp>"
    val flakyOnce = new BatchTransport {
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      def fetch(keys: Seq[String]): BatchResult =
        if (n.incrementAndGet() == 1) throw new RuntimeException("transient 429-ish")
        else BatchResult(keys.map(_ -> xml).toMap, Map.empty)
    }
    val out = graft.enrich.Springer.enrich(
      Seq("10.1/r").toDF("doi").coalesce(1), "doi", flakyOnce,
      BatchConfig(batchSize = 1, attempts = 3, backoffMs = 0, throttleMs = 0))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("10.1/r" -> "ok"))
  }

  test("B4 sliding-window rate limiter delays the (n+1)th acquisition") {
    val limiter = new SlidingWindowRateLimiter(perMinute = 3, windowMs = 300)
    val t0 = System.currentTimeMillis()
    (1 to 4).foreach(_ => limiter.acquire())
    val elapsed = System.currentTimeMillis() - t0
    assert(elapsed >= 250, s"4th acquire should wait for the window, took ${elapsed}ms")
  }

  // ---- live-socket smoke: UrlConnectionTransport against an in-process
  // HTTP stub (com.sun.net.httpserver, JDK built-in — no new deps). The
  // enrichment runs inside Spark tasks (local mode = same JVM) and every
  // request crosses a real localhost socket, so the "future online mode"
  // seam is demonstrated end to end, not just typed.

  test("S6 live transport: hits and explained failures over real sockets") {
    StubHttp.withServer { stub =>
      stub.respondWith = ids => StubHttp.recordsJson(
        ids.filter(idMap.contains).map(k => k -> Right(idMap(k))) ++
          ids.filter(failMap.contains).map(k => k -> Left(failMap(k))))
      val input = Seq("d1", "d2", "d3", "d5").toDF("doi_norm")
      val out = HttpBatch.enrich(input, "doi_norm",
        new UrlConnectionTransport(stub.endpoint),
        BatchConfig(batchSize = 2, throttleMs = 0, backoffMs = 0))
        .collect().map(r => r.getString(0) -> (Option(r.getString(1)), Option(r.getString(2)))).toMap
      assert(out("d1") == (Some("PMC1"), None))
      assert(out("d2") == (Some("PMC2"), None))
      assert(out("d3") == (None, Some("idconv HTTP 400")))
      assert(out("d5") == (None, None)) // silent miss: J5 default applied downstream
      // enrich dedups via an internal distinct(), so the 4 keys may spread
      // over 1..4 tasks: between 2 (both pairs co-partitioned) and 4
      // (every key alone) POSTs — but never fewer, and never per-row
      val n = stub.requests.get()
      assert(n >= 2 && n <= 4, s"expected 2..4 POSTs for 4 keys at batchSize=2, saw $n")
    }
  }

  test("B5 live retry/backoff: 500s then success, one socket request per attempt") {
    StubHttp.withServer { stub =>
      stub.failFirst.set(2) // first two requests answer HTTP 500
      stub.respondWith = ids => StubHttp.recordsJson(ids.map(k => k -> Right(s"V$k")))
      // single key = single batch = a deterministic request count
      val input = Seq("a").toDF("k")
      val out = HttpBatch.enrich(input, "k",
        new UrlConnectionTransport(stub.endpoint),
        BatchConfig(batchSize = 10, attempts = 3, backoffMs = 1, throttleMs = 0))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(out == Map("a" -> "Va"))
      assert(stub.requests.get() == 3, "two 500s + the succeeding attempt = 3 requests")
    }
  }

  test("B5 live exhaustion: a permanently-500 endpoint becomes per-key failures") {
    StubHttp.withServer { stub =>
      stub.failFirst.set(Int.MaxValue)
      val input = Seq("a").toDF("k").coalesce(1)
      val out = HttpBatch.enrich(input, "k",
        new UrlConnectionTransport(stub.endpoint),
        BatchConfig(batchSize = 10, attempts = 2, backoffMs = 1, throttleMs = 0))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).head
      assert(out._2 == null)
      assert(out._3.startsWith("fetch failed:") && out._3.contains("HTTP 500"))
      assert(stub.requests.get() == 2, "attempts=2 = exactly 2 socket requests")
    }
  }

  test("B4 live rate limit: socket fetches respect the shrunken window") {
    // driven directly (limiter + transport, no enrich): the limiter is
    // per-task state, and enrich's internal distinct() can spread 4 keys
    // over 4 tasks with 4 independent limiters — composition with enrich
    // is covered above; the socket-path claim is limiter-gated fetches
    StubHttp.withServer { stub =>
      stub.respondWith = ids => StubHttp.recordsJson(ids.map(k => k -> Right(s"V$k")))
      val transport = new UrlConnectionTransport(stub.endpoint)
      val limiter = new SlidingWindowRateLimiter(perMinute = 2, windowMs = 300)
      val t0 = System.currentTimeMillis()
      val results = Seq("a", "b", "c", "d").map { k =>
        limiter.acquire(); transport.fetch(Seq(k))
      }
      val elapsed = System.currentTimeMillis() - t0
      assert(results.flatMap(_.hits.values) == Seq("Va", "Vb", "Vc", "Vd"))
      assert(stub.requests.get() == 4)
      assert(elapsed >= 250, s"4 fetches at 2/300ms should span >=1 window, took ${elapsed}ms")
    }
  }

  test("Retry-After header parses as delta-seconds and HTTP-date; garbage -> 0") {
    import graft.enrich.RetryAfter
    assert(RetryAfter.parseHeaderMs("2") == 2000L)
    assert(RetryAfter.parseHeaderMs("0.5") == 500L)
    val now = System.currentTimeMillis()
    val future = java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME.format(
      java.time.Instant.ofEpochMilli(now + 30000).atZone(java.time.ZoneOffset.UTC))
    val ms = RetryAfter.parseHeaderMs(future, now)
    assert(ms > 29000 && ms <= 30000, s"HTTP-date parsed: $ms")
    assert(RetryAfter.parseHeaderMs("garbage") == 0L)
    assert(RetryAfter.parseHeaderMs(null) == 0L)
    // a past HTTP-date clamps to 0 (retry immediately), never negative
    val past = java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME.format(
      java.time.Instant.ofEpochMilli(now - 30000).atZone(java.time.ZoneOffset.UTC))
    assert(RetryAfter.parseHeaderMs(past, now) == 0L)
  }

  test("B5 live 429: the server's Retry-After is honored over the backoff schedule") {
    StubHttp.withServer { stub =>
      stub.rateLimitFirst.set(1) // first request answers 429 + Retry-After: 1
      stub.respondWith = ids => StubHttp.recordsJson(ids.map(k => k -> Right(s"V$k")))
      val input = Seq("a").toDF("k")
      val t0 = System.currentTimeMillis()
      val out = HttpBatch.enrich(input, "k",
        new UrlConnectionTransport(stub.endpoint),
        // backoffMs=0: any wait observed comes from Retry-After, not backoff
        BatchConfig(batchSize = 10, attempts = 3, backoffMs = 0, throttleMs = 0))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val elapsed = System.currentTimeMillis() - t0
      assert(out == Map("a" -> "Va"))
      assert(stub.requests.get() == 2, "429 then success = 2 requests")
      assert(elapsed >= 950, s"the 1s Retry-After was honored, took ${elapsed}ms")
    }
  }

  test("transportFromConf gates the live transport behind spark.graft.http.online") {
    val offline = new FixtureTransport(idMap)
    assert(HttpBatch.transportFromConf(spark, offline) eq offline,
      "flag unset -> the offline fixture transport")
    try {
      spark.conf.set("spark.graft.http.online", "true")
      spark.conf.set("spark.graft.http.endpoint", "http://127.0.0.1:9/idconv")
      assert(HttpBatch.transportFromConf(spark, offline)
        .isInstanceOf[UrlConnectionTransport])
    } finally {
      spark.conf.unset("spark.graft.http.online")
      spark.conf.unset("spark.graft.http.endpoint")
    }
  }
}

/** In-process HTTP stub on an ephemeral localhost port. `respondWith`
  * maps the posted ids to a reply body; `failFirst` answers that many
  * requests with HTTP 500 before switching to the mapped reply. */
object StubHttp {
  final class Stub(server: com.sun.net.httpserver.HttpServer) {
    val requests = new java.util.concurrent.atomic.AtomicInteger(0)
    val failFirst = new java.util.concurrent.atomic.AtomicInteger(0)
    val rateLimitFirst = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var respondWith: Seq[String] => String = ids => recordsJson(Nil)
    def endpoint: String =
      s"http://127.0.0.1:${server.getAddress.getPort}/idconv"
  }

  /** Render the idconv-shaped records array: Right(value) = hit,
    * Left(error) = explained failure. */
  def recordsJson(entries: Seq[(String, Either[String, String])]): String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    entries.map {
      case (id, Right(v)) => s"""{"id":"${esc(id)}","value":"${esc(v)}"}"""
      case (id, Left(e))  => s"""{"id":"${esc(id)}","error":"${esc(e)}"}"""
    }.mkString("""{"records":[""", ",", "]}")
  }

  def withServer[A](body: Stub => A): A = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val stub = new Stub(server)
    server.createContext("/idconv", (ex: com.sun.net.httpserver.HttpExchange) => {
      val n = stub.requests.incrementAndGet()
      val posted = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val ids = posted.stripPrefix("ids=").split(",").toSeq
        .filter(_.nonEmpty).map(java.net.URLDecoder.decode(_, "UTF-8"))
      val (code, reply) =
        if (stub.rateLimitFirst.getAndUpdate(x => if (x > 0) x - 1 else 0) > 0) {
          ex.getResponseHeaders.set("Retry-After", "1")
          (429, """{"error":"rate limited"}""")
        } else if (stub.failFirst.getAndUpdate(x => if (x > 0) x - 1 else 0) > 0)
          (500, """{"error":"synthetic outage"}""")
        else (200, stub.respondWith(ids))
      val bytes = reply.getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    })
    server.start()
    try body(stub)
    finally server.stop(0)
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

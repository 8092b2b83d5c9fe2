package graft.enrich

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** One batched lookup's outcome: per-key hits and per-key failure reasons
  * (sources/pmc.py:63-107 returns exactly this pair). */
final case class BatchResult(hits: Map[String, String], fails: Map[String, String])

/** Transport abstraction over the reference's HTTP sources (S6-S9).
  *
  * The zero-egress build plugs in [[FixtureTransport]]; an online mode
  * plugs in a real HTTP client with the same contract. `fetch` may throw —
  * the runner retries with exponential backoff (B5) and converts final
  * exhaustion into per-key failures, like `doi_to_pmcid_fetch_batch`'s
  * last_err handling. */
trait BatchTransport extends Serializable {
  def fetch(keys: Seq[String]): BatchResult
}

/** Offline transport backed by an in-memory map — the broadcast fixture
  * equivalent of NCBI idconv/EFetch (SURVEY.md §7: same algebra, no HTTP). */
final class FixtureTransport(table: Map[String, String],
                             failReasons: Map[String, String] = Map.empty)
    extends BatchTransport {
  def fetch(keys: Seq[String]): BatchResult = {
    val hits = keys.flatMap(k => table.get(k).map(k -> _)).toMap
    val fails = keys.flatMap(k => failReasons.get(k).map(k -> _)).toMap
    BatchResult(hits, fails)
  }
}

/** Deterministic TIERED fixture transport — the replay harness that puts
  * the whole S7/S9/A4/B5 fallback taxonomy under one oracle (r14 verdict
  * task 7: the driver previously had no hash on the fallback chain, only
  * specs). Outcomes are a pure function of the numeric key, split by call
  * shape — a batch call (|keys| > 1) resolves or fails only the
  * batch-tier slices; a single call (|keys| == 1, i.e. the A4 fallback
  * probe — batch-tier outcomes repeat there so a size-1 TAIL batch is
  * indistinguishable) additionally exercises the second tier:
  *
  *   key % 3 == 1            → batch hit  "B<key>"            (tier 1)
  *   key % 3 == 2            → batch fail "batch miss: http 404"
  *   key % 3 == 0 (batch-silent — no hit, no reason → A4 single retry):
  *     key % 6 == 0          → single hit "S<key>"            (tier 2)
  *     key % 12 == 3         → single fail "single miss: not found"
  *     key % 12 == 9         → RetryAfter(1) on EVERY attempt → B5
  *                             exhaustion converts to the per-key
  *                             "fetch failed: HTTP 429, ..." taxonomy row
  *
  * Every path lands in a distinct, deterministic (value, reason) pair, so
  * `HttpBatch.enrich(singleFallback = true)` over this transport is
  * oracle-replayable row for row whatever the partitioning or batch
  * splits. Non-numeric keys are batch-silent and single-fail — the
  * garbage-in lane. */
final class TieredFixtureTransport extends BatchTransport {
  private def idOf(k: String): Option[Long] = scala.util.Try(k.toLong).toOption
  def fetch(keys: Seq[String]): BatchResult = {
    val single = keys.lengthCompare(1) == 0
    // the B5 lane throws for the WHOLE call — only reachable from the
    // per-key single tier, so it never poisons a multi-key batch
    if (single) idOf(keys.head).foreach { id =>
      if (id % 12 == 9) throw RetryAfter(1)
    }
    val hits = keys.flatMap { k =>
      idOf(k).collect {
        case id if id % 3 == 1                => k -> s"B$id"
        case id if single && id % 6 == 0      => k -> s"S$id"
      }
    }.toMap
    val fails = keys.flatMap { k =>
      idOf(k) match {
        case Some(id) if id % 3 == 2               => Some(k -> "batch miss: http 404")
        case Some(id) if single && id % 12 == 3    => Some(k -> "single miss: not found")
        case None if single                        => Some(k -> "single miss: unparseable key")
        case _                                     => None
      }
    }.toMap
    BatchResult(hits, fails)
  }
}

/** Wall-wait seam for the batch runner's politeness/backoff waits. Every
  * computed wait (B3 throttle, B5 backoff, Retry-After) goes through a
  * Sleeper so a FIXTURE-transport bench row measures the retry ALGEBRA
  * instead of literal wall sleep: the enrich_fallback four-decade cells
  * (0.71 → 5.23 → 14.90 → 12.87 s) were dominated by Thread.sleep in the
  * 429 lane — the row measured the OS timer, not the operator. The
  * default stays the real clock (the live UrlConnectionTransport path and
  * the Springer rate-limit lane keep real waits); [[Sleeper.Virtual]]
  * advances an accounting counter instead, and specs assert the schedule
  * the loop WOULD have waited — the algebra stays fully tested. */
trait Sleeper extends Serializable { def sleep(ms: Long): Unit }
object Sleeper {
  case object Real extends Sleeper {
    def sleep(ms: Long): Unit = if (ms > 0) Thread.sleep(ms)
  }
  /** No-wait accounting clock. Per-instance counter: a task that
    * deserializes its own copy accounts its own waits. */
  final class Virtual extends Sleeper {
    private val slept = new java.util.concurrent.atomic.AtomicLong(0L)
    def sleep(ms: Long): Unit = if (ms > 0) { slept.addAndGet(ms); () }
    def totalSleptMs: Long = slept.get()
  }
}

/** A transport's way of saying "the server told us when to come back":
  * thrown on HTTP 429, carrying the parsed Retry-After. The retry loop
  * honors it (sleep the server's wait, capped at 60 s, instead of the
  * exponential schedule) — springer.py:47-64,208-211's
  * `respect_retry_after_header` semantics. */
final case class RetryAfter(waitMs: Long)
    extends RuntimeException(s"HTTP 429, retry after ${waitMs}ms")

object RetryAfter {
  /** Parse a Retry-After header value: delta-seconds or HTTP-date
    * (RFC 7231 §7.1.3); absent/garbage → 0 (caller falls back to its own
    * backoff), past dates clamp to 0. */
  def parseHeaderMs(value: String, nowMs: Long = System.currentTimeMillis()): Long = {
    if (value == null || value.trim.isEmpty) return 0L
    val v = value.trim
    scala.util.Try(math.max(0L, (v.toDouble * 1000).toLong)).getOrElse {
      scala.util.Try {
        val t = java.time.ZonedDateTime.parse(v,
          java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
        math.max(0L, t.toInstant.toEpochMilli - nowMs)
      }.getOrElse(0L)
    }
  }
}

/** Online transport over plain `java.net` (no added dependencies): one
  * POST per batch to `endpoint` with a form body `ids=k1,k2,...` (POST
  * rather than GET so a 150-key batch never risks URL-length limits),
  * expecting an idconv-shaped JSON reply
  * `{"records":[{"id":…,"value":…} | {"id":…,"error":…}]}` — the
  * reference's records loop (sources/pmc.py:63-107) with neutral field
  * names. Non-2xx status, timeouts, and malformed JSON all THROW: the
  * runner's retry/backoff (B5) owns error policy, this class stays a
  * dumb pipe. Selected via [[HttpBatch.transportFromConf]] so the
  * default build stays zero-egress. One instance serializes into each
  * task; connections are per-fetch (HttpURLConnection pools keep-alive
  * under the hood). */
final class UrlConnectionTransport(endpoint: String,
                                   connectTimeoutMs: Int = 10000,
                                   readTimeoutMs: Int = 30000)
    extends BatchTransport {
  def fetch(keys: Seq[String]): BatchResult = {
    val conn = new java.net.URL(endpoint).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestMethod("POST")
      conn.setRequestProperty("Content-Type", "application/x-www-form-urlencoded")
      conn.setDoOutput(true)
      val body = "ids=" + keys.map(java.net.URLEncoder.encode(_, "UTF-8")).mkString(",")
      val os = conn.getOutputStream
      try os.write(body.getBytes("UTF-8")) finally os.close()
      val code = conn.getResponseCode
      if (code == 429)
        throw RetryAfter(RetryAfter.parseHeaderMs(conn.getHeaderField("Retry-After")))
      if (code < 200 || code >= 300) sys.error(s"HTTP $code from $endpoint")
      val text = {
        val is = conn.getInputStream
        try new String(is.readAllBytes(), "UTF-8") finally is.close()
      }
      parseRecords(text)
    } finally conn.disconnect()
  }

  private def parseRecords(json: String): BatchResult = {
    val recs = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(json).path("records")
    require(recs.isArray, "malformed reply: no records array")
    var hits = Map.empty[String, String]
    var fails = Map.empty[String, String]
    recs.forEach { r =>
      val id = r.path("id").asText(null)
      if (id != null) {
        if (r.hasNonNull("value")) hits += id -> r.get("value").asText()
        else if (r.hasNonNull("error")) fails += id -> r.get("error").asText()
      }
    }
    BatchResult(hits, fails)
  }
}

/** B4: sliding-window rate limiter — ≤ `perMinute` acquisitions per 60 s,
  * sleeping until the oldest timestamp leaves the window
  * (sources/springer.py:28-45). One instance per task. */
final class SlidingWindowRateLimiter(perMinute: Int, windowMs: Long = 60000L) {
  private val stamps = scala.collection.mutable.Queue.empty[Long]
  def acquire(): Unit = synchronized {
    val now = System.currentTimeMillis()
    while (stamps.nonEmpty && now - stamps.head > windowMs) stamps.dequeue()
    if (stamps.size >= perMinute) {
      val wait = windowMs - (now - stamps.head) + 1
      if (wait > 0) Thread.sleep(wait)
    }
    stamps.enqueue(System.currentTimeMillis())
  }
}

/** Tuning for the batch runner, mirroring the reference's knobs
  * (preprocessing/fulltext_enricher.py:109-117, cli.py:16-29). */
final case class BatchConfig(
    batchSize: Int = 150,          // B1: idconv_chunk=150 / efetch_chunk=80
    attempts: Int = 3,             // B5: 3 tries
    backoffMs: Long = 1500,        // B5: backoff^attempt, 1.5 s base
    throttleMs: Long = 100,        // B3: 0.10 s post-batch politeness
    ratePerMin: Int = 0,           // B4: 0 = unlimited (Springer: 90)
    rateWindowMs: Long = 60000L,   // B4: the limiter's window (tests shrink it)
    singleFallback: Boolean = false, // A4: per-key retry for batch misses
    sleeper: Sleeper = Sleeper.Real) // wall-wait seam (fixture benches go virtual)

/** S6-S9 re-expressed Spark-first: batched enrichment as `mapPartitions`.
  *
  * Each partition iterates its keys in `batchSize` groups (B1), one
  * transport call per group — partition-parallelism replaces the
  * reference's 4-thread pool (B2), and the unordered union of partition
  * outputs replaces the `as_completed` merge (J6; per-key last-writer-wins
  * is irrelevant post-dedup, as in the reference). At 1000 executors this
  * is 1000 concurrent polite clients with no driver coordination — the
  * property the reference's single-process pool cannot scale to.
  */
object HttpBatch {

  /** Config-gated transport selection, the "future online mode" seam made
    * concrete: `spark.graft.http.online=true` plus
    * `spark.graft.http.endpoint=<url>` yields a live
    * [[UrlConnectionTransport]]; anything else yields `offline` (the
    * fixture path). The flag defaults off so the build stays zero-egress
    * unless a deployment explicitly opts in. */
  def transportFromConf(spark: org.apache.spark.sql.SparkSession,
                        offline: => BatchTransport): BatchTransport =
    if (spark.conf.get("spark.graft.http.online", "false").toBoolean)
      new UrlConnectionTransport(spark.conf.get("spark.graft.http.endpoint"))
    else offline

  /** Run batched enrichment over `df`'s `keyCol`. Returns one row per
    * DISTINCT non-null input key: (key, value nullable, reason nullable) —
    * duplicates are deduped before fetching (the reference dedups before
    * enrichment too, and refetching a key per duplicate row would multiply
    * real HTTP traffic); null keys are dropped. Keys the transport neither
    * resolves nor explains get reason null (caller applies the J5 default,
    * e.g. "No PMCID"). Callers join the result back on `keyCol`. */
  def enrich(df: DataFrame, keyCol: String, transport: BatchTransport,
             cfg: BatchConfig = BatchConfig()): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(col(keyCol).cast("string")).na.drop().distinct().as[String]
    keys.mapPartitions { iter =>
      val limiter =
        if (cfg.ratePerMin > 0) new SlidingWindowRateLimiter(cfg.ratePerMin, cfg.rateWindowMs)
        else null
      iter.grouped(cfg.batchSize).flatMap { batch =>
        val res = fetchWithRetry(transport, batch, cfg, limiter)
        val firstPass = batch.map { k =>
          (k, res.hits.get(k), res.fails.get(k))
        }
        val resolved =
          if (!cfg.singleFallback) firstPass
          else firstPass.map {
            case (k, None, None) => // A4: batch miss with no recorded reason
              val single = fetchWithRetry(transport, Seq(k), cfg, limiter)
              (k, single.hits.get(k), single.fails.get(k))
            case other => other
          }
        if (cfg.throttleMs > 0) cfg.sleeper.sleep(cfg.throttleMs)
        resolved.map { case (k, v, r) => (k, v.orNull, r.orNull) }
      }
    }.toDF(keyCol, "value", "reason")
  }

  /** B5: retry with exponential backoff; exhaustion converts to per-key
    * failures carrying the last error, like pmc.py:99-107. */
  private[graft] def fetchWithRetry(transport: BatchTransport, batch: Seq[String],
                                     cfg: BatchConfig, limiter: SlidingWindowRateLimiter): BatchResult = {
    var lastErr: Throwable = null
    var attempt = 0
    while (attempt < cfg.attempts) {
      if (limiter != null) limiter.acquire()
      try return transport.fetch(batch)
      catch {
        case ra: RetryAfter =>
          // 429: the server's wait wins over the exponential schedule
          // (capped at 60 s like the reference), and a 0 falls back to it
          lastErr = ra
          attempt += 1
          if (attempt < cfg.attempts) {
            val wait =
              if (ra.waitMs > 0) math.min(ra.waitMs, 60000L)
              else (cfg.backoffMs * math.pow(1.5, attempt - 1)).toLong
            cfg.sleeper.sleep(wait)
          }
        case e: Exception =>
          lastErr = e
          attempt += 1
          if (attempt < cfg.attempts && cfg.backoffMs > 0)
            cfg.sleeper.sleep((cfg.backoffMs * math.pow(1.5, attempt - 1)).toLong)
      }
    }
    BatchResult(Map.empty, batch.map(_ -> s"fetch failed: ${lastErr.getMessage}").toMap)
  }
}

package graft.enrich

import org.w3c.dom.Element
import graft.jats.Jats
import graft.norm.Norm

/** One Springer openaccess/jats lookup's parsed outcome. `via` records
  * which extraction path produced the article (the observable trace of the
  * record chain): "direct", "escaped-xml", "regex". */
final case class SpringerArticle(
    requestedDoi: String,
    pickedDoi: Option[String],
    doiMatched: Boolean,
    title: String,
    abstractText: Option[String],
    nSections: Long,
    bodyLen: Long,
    via: String)

/** S10: the Springer OA JATS source's parse/selection algebra
  * (sources/springer.py:120-316), re-expressed over the shared X1-X7
  * machinery. The reference marks this source dead ("IGNORE FOR NOW"), so
  * it never runs in the live pipeline — implemented here to close the
  * §2 inventory with the SAME seams as the live sources: payloads arrive
  * through [[BatchTransport]] (fixture or live), parsing is a pure
  * function over the response XML, and the Spark face is one
  * `mapPartitions` like every enrichment stage.
  *
  * Per-response semantics (springer.py:236-316):
  *  1. namespace-agnostic scan for every `<record>` (X7);
  *  2. per record, extract the `<article>` via the three-step chain
  *     (springer.py:120-152): (A) direct descendant; (B) `<xml>` wrapper
  *     whose TEXT is escaped JATS — multi-unescape ≤3 (P10) and re-parse;
  *     (C) last-ditch regex scan for `<article>…</article>` in the
  *     record's unescaped text;
  *  3. J7 preference: the first record whose
  *     `article-id[pub-id-type=doi]` equals the requested DOI
  *     (trim+lowercase both sides) wins; otherwise the FIRST extracted
  *     article stands (springer.py:246-267);
  *  4. title = first `article-title` anywhere (default "Untitled");
  *     abstract from `<front>` (whole article as fallback root); body
  *     from `<body>` else `<sub-article>`'s; top-level `<sec>`s → X1
  *     section rows, a section-less body → X2 COLLAPSE (springer.py:300
  *     uses collapse, where the PMC path linearizes — preserved
  *     divergence); no body → abstract-only; neither sections nor
  *     abstract → "Springer: no sections/text".
  */
object Springer {

  private def norm(s: String): String = s.trim.toLowerCase

  /** The A/B/C article-extraction chain over one `<record>`. */
  private[enrich] def extractArticle(rec: Element): Option[(Element, String)] = {
    Jats.findNs(rec, "article").map((_, "direct")).orElse {
      Jats.findNs(rec, "xml").flatMap { x =>
        val raw = x.getTextContent
        if (raw == null || raw.trim.isEmpty) None
        else scala.util.Try(Jats.parseRoot(Norm.htmlMultiUnescape(raw)))
          .toOption.flatMap(root => articleOf(root)).map((_, "escaped-xml"))
      }
    }.orElse {
      val txt = Norm.htmlMultiUnescape(Option(rec.getTextContent).getOrElse(""))
      ArticleRe.findFirstIn(txt).flatMap(frag =>
        scala.util.Try(Jats.parseRoot(frag)).toOption.flatMap(articleOf))
        .map((_, "regex"))
    }
  }

  private val ArticleRe = "(?is)<article\\b[\\s\\S]*?</article>".r

  private def articleOf(root: Element): Option[Element] =
    if (Jats.localName(root) == "article") Some(root) else Jats.findNs(root, "article")

  /** DOI of an extracted article: `article-id[pub-id-type=doi]`, normalized. */
  private[enrich] def articleDoi(article: Element): Option[String] =
    Jats.findAllNs(article, "article-id").collectFirst {
      case aid if Option(aid.getAttribute("pub-id-type")).exists(_.equalsIgnoreCase("doi")) &&
        aid.getTextContent.trim.nonEmpty => norm(aid.getTextContent)
    }

  /** Parse one API response for `requestedDoi`. Left = the reference's
    * error strings, verbatim. */
  def parseResponse(xml: String, requestedDoi: String): Either[String, SpringerArticle] = {
    val root =
      try Jats.parseRoot(xml)
      catch { case e: Exception => return Left(s"Springer: unparseable response: ${e.getMessage}") }
    val records = Jats.findAllNs(root, "record")
    if (records.isEmpty) return Left("Springer: no <record>")
    val requested = norm(requestedDoi)
    // J7: first DOI-matching article wins; else first extracted article
    val extracted = records.iterator.flatMap(r => extractArticle(r)).toVector
    if (extracted.isEmpty) return Left("Springer: no JATS <article> found")
    val best = extracted.find { case (a, _) => articleDoi(a).contains(requested) }
      .getOrElse(extracted.head)
    val (article, via) = best
    // springer.py:280-316 — title anywhere, abstract from front, body with
    // sub-article fallback, top-level secs → X1, section-less → X2 collapse
    val title = Jats.findNs(article, "article-title")
      .map(t => t.getTextContent.trim).filter(_.nonEmpty).getOrElse("Untitled")
    val front = Jats.findNs(article, "front").getOrElse(article)
    val abs = Jats.extractAbstract(front)
    val body = Jats.findNs(article, "body").orElse(
      Jats.findNs(article, "sub-article").flatMap(sub => Jats.findNs(sub, "body")))
    val sections = body match {
      case None    => Nil
      case Some(b) =>
        val secs = Jats.findAllNs(b, "sec").filter(s => s.getParentNode eq b)
        if (secs.nonEmpty) secs.toList.flatMap(s => Jats.sectionToRows(s, Nil))
        else Jats.collapseBody(b)
    }
    // springer.py:295-298 vs 313-314: a BODY-LESS article is a SUCCESS
    // (abstract-only, even when the abstract too is empty — the caller's
    // require_fulltext gate decides its fate); the "no sections/text"
    // error fires only when a body exists but produced neither sections
    // nor an abstract.
    if (body.nonEmpty && sections.isEmpty && abs.isEmpty) Left("Springer: no sections/text")
    else Right(SpringerArticle(
      requestedDoi = requestedDoi,
      pickedDoi = articleDoi(article),
      doiMatched = articleDoi(article).contains(requested),
      title = title,
      abstractText = abs,
      nSections = sections.size.toLong,
      bodyLen = sections.map(_.text.length.toLong).sum,
      via = via))
  }

  /** The Spark face: one row per requested DOI. Payload XML arrives via
    * the shared [[BatchTransport]] seam (fixture map offline, a live
    * `UrlConnectionTransport` subclass online), fetched one key per call
    * like the reference's per-DOI GET; parse runs inside the partition.
    * Fetches route through [[HttpBatch.fetchWithRetry]], so the cfg's
    * B4/B5 machinery — the reference's 90-req/min sliding-window limiter
    * (springer.py:28-45), exponential backoff, Retry-After honor — applies,
    * and a live 429 degrades to a per-key failure row instead of killing
    * the task. The limiter is PER TASK, so the default `partitions = 1`
    * runs the keys on a single task — the reference's sequential per-DOI
    * client — making `ratePerMin` a true GLOBAL budget against the API
    * within one task ATTEMPT. Caveat: the limiter's sliding window lives
    * in the task, so a task retry or speculative attempt starts a fresh
    * window and can briefly exceed the budget right after a failure; when
    * retries/speculation are enabled against a strict server limit, derive
    * the budget conservatively (e.g. ratePerMin/2).
    * Scaling out (`partitions = n`) multiplies the aggregate rate by n:
    * divide `ratePerMin` by n to stay inside a per-key server limit.
    * Columns: (doi, status, picked_doi, doi_matched, title, n_sections,
    * body_len, abstract_len, via). */
  def enrich(df: org.apache.spark.sql.DataFrame, doiCol: String,
             transport: BatchTransport,
             cfg: BatchConfig = BatchConfig(batchSize = 1, ratePerMin = 90),
             partitions: Int = 1): org.apache.spark.sql.DataFrame = {
    require(partitions >= 1, s"partitions must be >= 1: $partitions")
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val keys = df.select(col(doiCol).cast("string")).na.drop().distinct().as[String]
      .repartition(partitions)
    keys.mapPartitions { iter =>
      val limiter =
        if (cfg.ratePerMin > 0) new SlidingWindowRateLimiter(cfg.ratePerMin, cfg.rateWindowMs)
        else null
      iter.map { doi =>
        val res = HttpBatch.fetchWithRetry(transport, Seq(doi), cfg, limiter)
        val parsed = res.hits.get(doi) match {
          case None      => Left(res.fails.getOrElse(doi, "Springer: empty response"))
          case Some(xml) => parseResponse(xml, doi)
        }
        parsed match {
          case Left(err) =>
            (doi, err, null: String, false, null: String, 0L, 0L, 0L, null: String)
          case Right(a) =>
            (doi, "ok", a.pickedDoi.orNull, a.doiMatched, a.title, a.nSections,
              a.bodyLen, a.abstractText.map(_.length.toLong).getOrElse(0L), a.via)
        }
      }
    }.toDF(doiCol, "status", "picked_doi", "doi_matched", "title",
      "n_sections", "body_len", "abstract_len", "via")
  }
}

package graft.jats

import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Document, Element, Node, NodeList, Text}
import scala.collection.mutable.ListBuffer
import graft.chunk.SectionText

/** A parsed JATS article, flattened at the parse boundary (SURVEY.md §1.1):
  * the recursive section tree becomes `sections: List[(section_path, text)]`
  * with " / "-joined paths; the abstract rides alongside. */
final case class ParsedArticle(
    pmcid: Option[String],
    title: String,
    abstractText: Option[String],
    sections: List[SectionText])

/** JATS XML parser (SURVEY.md §2.6 X1-X6), built on the JDK's DOM parser —
  * no external deps, safe to ship into executor tasks for distributed
  * `mapPartitions` parsing of fetched XML batches.
  *
  * Reference semantics (file:line of /root/reference/src/ingestion_pipeline):
  *  - DROP_TAGS + section_to_nested_dict — preprocessing/xml_cleaning.py:6-28
  *  - collapse/linearize body            — preprocessing/xml_cleaning.py:30-55
  *  - extract_abstract_text              — preprocessing/xml_cleaning.py:72-106
  *  - _parse_article / _article_pmcid    — sources/pmc.py:111-152
  */
object Jats {

  /** Tags dropped from body text (xml_cleaning.py:6-10). */
  val DropTags: Set[String] = Set(
    "fig", "fig-group", "table", "table-wrap", "graphic", "media", "alternatives",
    "inline-formula", "disp-formula", "tex-math", "ref-list", "license", "permissions",
    "copyright-statement", "supplementary-material", "fn", "fn-group")

  // ------------------------------------------------------------------ DOM utils

  private def parseDom(xml: String): Document = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    // JATS ships DOCTYPEs pointing at NLM DTDs; never fetch them (zero egress).
    f.setFeature("http://apache.org/xml/features/nonvalidating/load-external-dtd", false)
    f.setFeature("http://xml.org/sax/features/external-general-entities", false)
    f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    val b = f.newDocumentBuilder()
    b.parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
  }

  /** X7: namespace-agnostic tag identity — `jats:article`, `ns2:body` and
    * plain `article` all match on the LOCAL name, exactly the reference's
    * `_find_ns` (sources/springer.py:96-103: `t.name.split(":")[-1]`).
    * Every matcher below goes through this, so the whole parser tolerates
    * prefixed JATS (Springer's API emits it; PMC's does not). */
  private[graft] def localName(e: Element): String = {
    val n = e.getTagName
    val i = n.lastIndexOf(':')
    if (i < 0) n else n.substring(i + 1)
  }

  private def children(e: Node): Vector[Element] = {
    val nl = e.getChildNodes
    (0 until nl.getLength).collect {
      case i if nl.item(i).isInstanceOf[Element] => nl.item(i).asInstanceOf[Element]
    }.toVector
  }

  private def childrenNamed(e: Node, name: String): Vector[Element] =
    children(e).filter(localName(_) == name)

  /** All descendant elements with the given LOCAL tag name (document order). */
  private def findAll(e: Element, names: Set[String]): Vector[Element] = {
    val out = ListBuffer.empty[Element]
    def walk(n: Element): Unit = {
      if (names.contains(localName(n))) out += n
      children(n).foreach(walk)
    }
    children(e).foreach(walk)
    out.toVector
  }

  private def findFirst(e: Element, name: String): Option[Element] = {
    var res: Option[Element] = None
    def walk(n: Element): Unit = if (res.isEmpty) {
      if (localName(n) == name) res = Some(n)
      else children(n).foreach(walk)
    }
    children(e).foreach(walk)
    res
  }

  /** X7 public faces (the `_find_ns`/`_find_all_ns` pair), used by the
    * Springer record-selection chain. */
  private[graft] def findNs(e: Element, local: String): Option[Element] = findFirst(e, local)
  private[graft] def findAllNs(e: Element, local: String): Vector[Element] = findAll(e, Set(local))

  /** BeautifulSoup `get_text(" ", strip=True)` equivalent: trim each text
    * node, drop empties, join with a single space — skipping dropped tags. */
  private def getText(e: Element, drop: Set[String] = Set.empty): String = {
    val parts = ListBuffer.empty[String]
    def walk(n: Node): Unit = n match {
      case t: Text =>
        val s = t.getData.trim
        if (s.nonEmpty) parts += s
      case el: Element if !drop.contains(localName(el)) =>
        val nl = el.getChildNodes
        (0 until nl.getLength).foreach(i => walk(nl.item(i)))
      case _ => ()
    }
    val nl = e.getChildNodes
    (0 until nl.getLength).foreach(i => walk(nl.item(i)))
    parts.mkString(" ")
  }

  /** BeautifulSoup `get_text(strip=True)` equivalent — NO separator: each
    * text node stripped, empties dropped, concatenated directly. The
    * reference uses this (not the " "-joined form) for titles and ids
    * (xml_cleaning.py:15,88-89; pmc.py:114,125), so inline markup like
    * `Intro<italic>duction</italic>` must not grow internal spaces. */
  private def getTextStrip(e: Element): String = {
    val parts = ListBuffer.empty[String]
    def walk(n: Node): Unit = n match {
      case t: Text =>
        val s = t.getData.trim
        if (s.nonEmpty) parts += s
      case el: Element =>
        val nl = el.getChildNodes
        (0 until nl.getLength).foreach(i => walk(nl.item(i)))
      case _ => ()
    }
    val nl = e.getChildNodes
    (0 until nl.getLength).foreach(i => walk(nl.item(i)))
    parts.mkString
  }

  /** Python `str.title()` — uppercase letter after any non-letter, used for
    * section titles (xml_cleaning.py:15). Differs from `initcap` on
    * apostrophes by design. */
  def pyTitle(s: String): String = {
    val sb = new StringBuilder(s.length)
    var prevLetter = false
    for (c <- s) {
      if (Character.isLetter(c)) {
        sb.append(if (prevLetter) Character.toLowerCase(c) else Character.toUpperCase(c))
        prevLetter = true
      } else { sb.append(c); prevLetter = false }
    }
    sb.toString
  }

  // ------------------------------------------------------------------ X1-X4

  /** X1: one <sec> subtree → flattened (path, text) rows. A section's own
    * text is the join of its direct <p> children's texts (noise tags
    * stripped); child <sec>s recurse with " / " path joining
    * (xml_cleaning.py:12-28 flattened per SURVEY.md §1.1). */
  def sectionToRows(sec: Element, path: List[String]): List[SectionText] = {
    val title = findFirst(sec, "title").map(t => pyTitle(getTextStrip(t))).filter(_.nonEmpty)
      .getOrElse("Untitled Section")
    val here = path :+ title
    val paras = childrenNamed(sec, "p").map(p => getText(p, DropTags)).filter(_.nonEmpty)
    val text = paras.mkString(" ").trim
    val own = if (text.nonEmpty) List(SectionText(here.mkString(" / "), text)) else Nil
    own ++ childrenNamed(sec, "sec").toList.flatMap(c => sectionToRows(c, here))
  }

  /** X2: section-less body collapsed to one "Full Text" block
    * (xml_cleaning.py:30-33). */
  def collapseBody(body: Element): List[SectionText] = {
    val t = getText(body, DropTags)
    if (t.nonEmpty) List(SectionText("Full Text", t)) else Nil
  }

  /** X3: linearize paragraphs + <list> items (bulleted) + quotes/boxed text
    * into a single "Full Text" section (xml_cleaning.py:35-55). */
  def linearizeBody(body: Element): List[SectionText] = {
    val chunks = ListBuffer.empty[String]
    findAll(body, Set("p")).filterNot(p => hasDroppedAncestor(p, body))
      .map(p => getText(p, DropTags)).filter(_.nonEmpty).foreach(chunks += _)
    findAll(body, Set("list")).filterNot(l => hasDroppedAncestor(l, body)).foreach { lst =>
      val items = childrenNamed(lst, "list-item").map(li => getText(li, DropTags)).filter(_.nonEmpty)
      if (items.nonEmpty) chunks += items.map(it => s"• $it").mkString("\n")
    }
    findAll(body, Set("disp-quote", "boxed-text")).filterNot(d => hasDroppedAncestor(d, body))
      .map(dq => getText(dq, DropTags)).filter(_.nonEmpty).foreach(chunks += _)
    val full = chunks.filter(_.nonEmpty).mkString("\n\n")
    if (full.nonEmpty) List(SectionText("Full Text", full)) else Nil
  }

  private def hasDroppedAncestor(e: Element, stop: Element): Boolean = {
    var cur: Node = e.getParentNode
    while (cur != null && cur != stop) {
      cur match {
        case el: Element if DropTags.contains(localName(el)) => return true
        case _ => ()
      }
      cur = cur.getParentNode
    }
    false
  }

  /** X4: abstract text from <abstract>/<trans-abstract>, structured or flat
    * (xml_cleaning.py:72-106). */
  def extractAbstract(root: Element): Option[String] = {
    val parts = ListBuffer.empty[String]
    findAll(root, Set("abstract", "trans-abstract")).foreach { ab =>
      val secs = childrenNamed(ab, "sec")
      if (secs.nonEmpty) {
        secs.foreach { sec =>
          findFirst(sec, "title").map(t => getTextStrip(t)).filter(_.nonEmpty).foreach(parts += _)
          childrenNamed(sec, "p").map(p => getText(p)).filter(_.nonEmpty).foreach(parts += _)
        }
      } else {
        val ps = childrenNamed(ab, "p")
        if (ps.isEmpty) { val t = getText(ab); if (t.nonEmpty) parts += t }
        else ps.map(p => getText(p)).filter(_.nonEmpty).foreach(parts += _)
      }
    }
    val text = parts.filter(_.nonEmpty).mkString("\n\n").trim
    if (text.nonEmpty) Some(text) else None
  }

  // ------------------------------------------------------------------ X5-X6

  /** X6: PMCID from <article-id pub-id-type="pmcid"> (pmc.py:111-117). */
  def articlePmcid(article: Element): Option[String] =
    findAll(article, Set("article-id")).collectFirst {
      case aid if Option(aid.getAttribute("pub-id-type")).exists(_.equalsIgnoreCase("pmcid")) &&
        getTextStrip(aid).nonEmpty => getTextStrip(aid)
    }

  /** X5: parse one <article> element (pmc.py:119-152): title from
    * title-group/article-title (default "Untitled"); abstract from <front>;
    * body from <body> else <sub-article>/<body>; never synthesized from the
    * whole article; top-level <sec>s → X1, else X3 linearization; no body →
    * abstract-only record with empty sections. Returns Left(reason) when
    * neither sections nor abstract exist ("No sections/text"). */
  def parseArticleElement(article: Element): Either[String, ParsedArticle] = {
    val title = findFirst(article, "title-group")
      .flatMap(tg => findFirst(tg, "article-title"))
      .map(t => getTextStrip(t)).filter(_.nonEmpty).getOrElse("Untitled")
    val front = findFirst(article, "front").getOrElse(article)
    val abs = extractAbstract(front)
    val body = findFirst(article, "body").orElse(
      findFirst(article, "sub-article").flatMap(sub => findFirst(sub, "body")))
    body match {
      case None =>
        Right(ParsedArticle(articlePmcid(article), title, abs, Nil))
      case Some(b) =>
        val secs = childrenNamed(b, "sec")
        val sections =
          if (secs.nonEmpty) secs.toList.flatMap(s => sectionToRows(s, Nil))
          else linearizeBody(b)
        if (sections.isEmpty && abs.isEmpty) Left("No sections/text")
        else Right(ParsedArticle(articlePmcid(article), title, abs, sections))
    }
  }

  /** Parse a JATS document that may contain one or many <article> elements
    * (EFetch batches return several — sources/pmc.py:213-256). */
  def parseDocument(xml: String): List[Either[String, ParsedArticle]] = {
    val doc = parseDom(xml)
    val root = doc.getDocumentElement
    val articles =
      if (localName(root) == "article") Vector(root)
      else findAll(root, Set("article"))
    articles.toList.map(parseArticleElement)
  }

  /** Parse an XML string to its root element (DTD-safe, zero-egress) —
    * the Springer chain re-parses unescaped inner payloads. */
  private[graft] def parseRoot(xml: String): Element =
    parseDom(xml).getDocumentElement
}

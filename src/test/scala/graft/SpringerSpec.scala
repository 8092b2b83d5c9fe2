package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.enrich.Springer

/** S10/J7/X7 unit coverage beyond the fixture-file oracle row: the
  * record-preference algebra, the three-step extraction chain, and the
  * reference's verbatim error strings (sources/springer.py:236-316). */
class SpringerSpec extends AnyFunSuite {

  private def art(doi: String, title: String, body: String, p: String = ""): String =
    s"<${p}article><${p}front><${p}article-meta>" +
      s"""<${p}article-id pub-id-type="doi">$doi</${p}article-id>""" +
      s"<${p}title-group><${p}article-title>$title</${p}article-title></${p}title-group>" +
      s"</${p}article-meta></${p}front>" +
      s"<${p}body><${p}sec><${p}title>s</${p}title><${p}p>$body</${p}p></${p}sec></${p}body>" +
      s"</${p}article>"

  test("J7: the DOI-matching record wins over an earlier non-matching one") {
    val xml = s"<resp><record>${art("10.1/a", "A", "body a")}</record>" +
      s"<record>${art("10.1/b", "B", "body b")}</record></resp>"
    val r = Springer.parseResponse(xml, "10.1/B").toOption.get // case-insensitive match
    assert(r.pickedDoi.contains("10.1/b") && r.doiMatched && r.title == "B")
  }

  test("J7 fallback: no DOI match -> FIRST extracted article, doiMatched=false") {
    val xml = s"<resp><record>${art("10.1/a", "A", "body a")}</record>" +
      s"<record>${art("10.1/b", "B", "body b")}</record></resp>"
    val r = Springer.parseResponse(xml, "10.1/zzz").toOption.get
    assert(r.pickedDoi.contains("10.1/a") && !r.doiMatched && r.title == "A")
  }

  test("X7: fully-prefixed JATS parses identically to unprefixed") {
    val plain = Springer.parseResponse(
      s"<resp><record>${art("10.1/x", "T", "same body")}</record></resp>", "10.1/x").toOption.get
    val prefixed = Springer.parseResponse(
      s"<resp><record>${art("10.1/x", "T", "same body", "jats:")}</record></resp>", "10.1/x").toOption.get
    assert(plain.copy(via = "") == prefixed.copy(via = ""))
    assert(plain.nSections == 1 && plain.bodyLen == "same body".length)
  }

  test("extraction chain: escaped <xml> wrapper and regex fallback both recover the article") {
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val a = art("10.1/w", "W", "wrapped")
    val viaWrapper = Springer.parseResponse(
      s"<resp><record><xml>${esc(esc(a))}</xml></record></resp>", "10.1/w").toOption.get
    assert(viaWrapper.via == "escaped-xml" && viaWrapper.title == "W")
    val viaRegex = Springer.parseResponse(
      s"<resp><record><blob>noise ${esc(a)} noise</blob></record></resp>", "10.1/w").toOption.get
    assert(viaRegex.via == "regex" && viaRegex.title == "W")
  }

  test("error strings match the reference verbatim") {
    assert(Springer.parseResponse("<resp><x/></resp>", "10.1/x") == Left("Springer: no <record>"))
    assert(Springer.parseResponse("<resp><record><other/></record></resp>", "10.1/x")
      == Left("Springer: no JATS <article> found"))
    val noText = "<resp><record><article><front/><body/></article></record></resp>"
    assert(Springer.parseResponse(noText, "10.1/x") == Left("Springer: no sections/text"))
  }

  test("body-less AND abstract-less article is a SUCCESS (springer.py:295-298)") {
    // The reference returns (title, {}, {"abstract": ""}) when the article
    // has no <body>, whatever the abstract — the "no sections/text" error
    // is reserved for articles WITH a body that yields nothing (:313-314).
    val xml = "<resp><record><article><front><article-meta>" +
      """<article-id pub-id-type="doi">10.1/empty</article-id>""" +
      "</article-meta></front></article></record></resp>"
    val r = Springer.parseResponse(xml, "10.1/empty")
    assert(r.isRight, s"expected abstract-only success, got $r")
    val a = r.toOption.get
    assert(a.nSections == 0 && a.abstractText.isEmpty && a.bodyLen == 0)
  }

  test("abstract-only article: no body -> zero sections, abstract carried") {
    val xml = "<resp><record><article><front><article-meta>" +
      """<article-id pub-id-type="doi">10.1/ab</article-id>""" +
      "<abstract><p>just this</p></abstract>" +
      "</article-meta></front></article></record></resp>"
    val r = Springer.parseResponse(xml, "10.1/ab").toOption.get
    assert(r.nSections == 0 && r.abstractText.contains("just this") && r.title == "Untitled")
  }
}

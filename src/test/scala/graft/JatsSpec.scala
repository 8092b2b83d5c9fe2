package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.jats.Jats

class JatsSpec extends AnyFunSuite {
  private def read(name: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"${TestSpark.fixtures}/jats/$name")), "UTF-8")

  test("X5/X1 structured body: sections, titles title-cased, noise dropped") {
    val parsed = Jats.parseDocument(read("PMC8000001.xml"))
    assert(parsed.size == 1)
    val a = parsed.head.toOption.get
    assert(a.pmcid.contains("PMC8000001"))
    assert(a.title == "Deep Learning for Genomic Sequence Analysis")
    val paths = a.sections.map(_.section_path)
    assert(paths.contains("Introduction"))
    assert(paths.contains("Introduction / Prior Approaches"))
    assert(paths.contains("Methods"))
    assert(a.sections.forall(s => !s.text.contains("NOISE")), "drop tags removed")
    // direct <p> join: intro has both paragraphs in one section text
    val intro = a.sections.find(_.section_path == "Introduction").get
    assert(intro.text.contains("transformed by deep learning") &&
      intro.text.contains("principal architectures"))
  }

  test("X4 structured abstract extraction with titles") {
    val a = Jats.parseDocument(read("PMC8000001.xml")).head.toOption.get
    val abs = a.abstractText.get
    assert(abs.contains("Background") && abs.contains("Deep learning transforms genomics."))
  }

  test("X3 linearization: paragraphs, bulleted lists, quotes; ref-list dropped") {
    val a = Jats.parseDocument(read("PMC8000002.xml")).head.toOption.get
    assert(a.sections.map(_.section_path) == List("Full Text"))
    val t = a.sections.head.text
    assert(t.contains("• Named entity recognition improves by eleven points."))
    assert(t.contains("Pretraining is all you need"))
    assert(!t.contains("NOISE"))
  }

  test("abstract-only article keeps empty sections (P7 gate routes it)") {
    val a = Jats.parseDocument(read("PMC8000005.xml")).head.toOption.get
    assert(a.sections.isEmpty)
    assert(a.abstractText.exists(_.contains("subgroup calibration")))
  }

  test("X5 sub-article body fallback") {
    val a = Jats.parseDocument(read("PMC8000006.xml")).head.toOption.get
    assert(a.sections.map(_.section_path) == List("Reviewer Comments"))
  }

  test("pyTitle matches Python str.title semantics") {
    assert(Jats.pyTitle("don't stop me-now") == "Don'T Stop Me-Now")
    assert(Jats.pyTitle("ALL CAPS") == "All Caps")
  }
}

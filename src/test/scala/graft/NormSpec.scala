package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.norm.Norm

class NormSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def norm1(s: String): String = {
    val r = Seq(s).toDF("doi").select(Norm.normalizeDoi(col("doi"))).head.getString(0)
    r
  }

  test("P1 normalizeDoi strips url prefixes, zwsp, case, whitespace") {
    assert(norm1("https://doi.org/10.1038/S41592-021-01000-1") == "10.1038/s41592-021-01000-1")
    assert(norm1("HTTP://DX.DOI.ORG/10.1093/jamia/OCAA123") == "10.1093/jamia/ocaa123")
    assert(norm1("  10.1007/x​  ") == "10.1007/x")
    assert(norm1("") == null)
    assert(norm1("   ​ ") == null)
  }

  test("P1 strips the prefix even with leading whitespace (trim-before-sub order)") {
    assert(norm1("  https://doi.org/10.1038/X  ") == "10.1038/x")
    assert(norm1("\thttp://dx.doi.org/10.1/Y") == "10.1/y")
  }

  test("P1 idempotence over random strings (seeded property)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "aZ09./:\u200b https://doi.org/DX"
    val samples = (1 to 60).map(_ =>
      (1 to (1 + rnd.nextInt(30))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val once = samples.toDF("doi").select(Norm.normalizeDoi(col("doi")).as("n")).collect().map(_.getString(0))
    val twice = once.filter(_ != null).toSeq.toDF("doi")
      .select(Norm.normalizeDoi(col("doi")).as("n")).collect().map(_.getString(0))
    assert(once.filter(_ != null).toSeq == twice.toSeq)
  }

  test("P2 stripBraces removes braces and collapses whitespace") {
    val r = Seq("{Deep}  Learning   {for} Genomics ").toDF("s")
      .select(Norm.stripBraces(col("s"))).head.getString(0)
    assert(r == "Deep Learning for Genomics")
    val empty = Seq("{ }").toDF("s").select(Norm.stripBraces(col("s"))).head.getString(0)
    assert(empty == null)
  }

  test("P3 doiExtract pulls the first DOI-shaped substring") {
    val r = Seq("see also 10.1148/ryai.2022.0042 (preprint)").toDF("s")
      .select(Norm.doiExtract(col("s"))).head.getString(0)
    assert(r == "10.1148/ryai.2022.0042")
    assert(Seq("no doi here").toDF("s").select(Norm.doiExtract(col("s"))).head.getString(0) == null)
  }

  test("P5 docId prefers doi, falls back to 16-hex sha256 hash") {
    val df = Seq(("10.1/x", "T", "J"), (null, "T", "J")).toDF("doi", "title", "journal")
      .select(Norm.docId(col("doi"), col("title"), col("journal")).as("k"))
    val keys = df.collect().map(_.getString(0))
    assert(keys(0) == "10.1/x")
    assert(keys(1).startsWith("hash:") && keys(1).length == "hash:".length + 16)
  }

  test("P9 pmcidCanonical strips non-digits and re-prefixes") {
    val r = Seq("pmc1234x5").toDF("s").select(Norm.pmcidCanonical(col("s"))).head.getString(0)
    assert(r == "PMC12345")
  }

  test("P10 html multi-unescape reaches fixpoint within 3 rounds") {
    assert(Norm.htmlMultiUnescape("&amp;amp;lt;tag&amp;amp;gt;") == "<tag>")
    assert(Norm.htmlMultiUnescape("&lt;sec&gt;&#65;&#x42;&apos;") == "<sec>AB'")
    assert(Norm.htmlMultiUnescape("plain text") == "plain text")
    assert(Norm.htmlMultiUnescape("&unknown;") == "&unknown;")
  }

  test("P4 coalesceArticle funnels id and full_text variants") {
    val df = graft.io.Readers.loadJsonl(spark, s"${TestSpark.fixtures}/articles.jsonl")
    val out = Norm.coalesceArticle(df).orderBy("doi").collect()
    assert(out.length == 5)
    val byDoi = out.map(r => (r.getAs[String]("doi"), r)).toMap
    assert(byDoi("10.1/beta").getAs[String]("id") == "PMC100")
    assert(byDoi("10.1/gamma").getAs[String]("id") == "200")
    assert(byDoi("10.1/noid").getAs[String]("id") == null)
    assert(byDoi("10.1/beta").getAs[String]("full_text").startsWith("beta body"))
  }
}

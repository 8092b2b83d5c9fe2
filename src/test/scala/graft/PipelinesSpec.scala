package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{BibParser, Readers}
import graft.pipelines.Pipelines

class PipelinesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("S4 bib parser: entries, brace titles, DOI from url/howpublished") {
    val df = Readers.loadBib(spark, s"${TestSpark.fixtures}/sample_refs.bib")
    val rows = df.collect().map(r => r.getAs[String]("cite_key") -> r).toMap
    assert(rows.size == 10)
    assert(rows("smith2021deep").getAs[String]("doi") == "10.1038/s41592-021-01000-1")
    assert(rows("smith2021deep").getAs[String]("title") == "Deep Learning for Genomic Sequence Analysis")
    // DOI only in url
    assert(rows("chen2019survey").getAs[String]("doi") == "10.1109/TNNLS.2019.290000")
    // DOI only in howpublished (inside \url{})
    assert(rows("patel2022multi").getAs[String]("doi") == "10.1148/ryai.2022.0042")
    // no DOI anywhere
    assert(rows("nodoi2018lost").getAs[String]("doi") == null)
    // whitespace collapse in journal
    assert(rows("smith2021deep").getAs[String]("journal") == "Nature Methods")
    assert(rows("kim2020graph").getAs[String]("entry_type") == "inproceedings")
  }

  test("fulltext pipeline: resume, enrichment, gate, failure taxonomy, summary") {
    val bib = Readers.loadBib(spark, s"${TestSpark.fixtures}/sample_refs.bib")
      .select(col("doi"), col("journal"), col("title"))
    val csv = Readers.loadCsv(spark, s"${TestSpark.fixtures}/input_dois.csv")
      .select(col("doi"), col("journal"), lit(null).cast("string").as("title"))
    val input = bib.unionByName(csv)
    val idMap = spark.read.option("header", "true").csv(s"${TestSpark.fixtures}/idconv_map.csv")
    val failMap = spark.read.option("header", "true").csv(s"${TestSpark.fixtures}/efetch_fail.csv")
    val articles = Pipelines.parseJatsDir(spark, s"${TestSpark.fixtures}/jats")
    val seen = Seq("10.1038/s41592-021-01000-1").toDF("doi_norm")
    val res = Pipelines.runFulltext(input, idMap, failMap, articles, seen)

    val recs = res.records.collect().map(_.getAs[String]("pmcid")).toSet
    assert(recs == Set("PMC8000002", "PMC8000003"), s"got $recs")

    val fails = res.failures.collect()
      .map(r => (r.getAs[String]("doi"), r.getAs[String]("reason"))).toMap
    assert(fails.values.toSet.contains("abstract_only"))
    assert(fails.values.toSet.contains("idconv: no PMCID"))
    assert(fails.values.toSet.contains("idconv HTTP 400"))
    assert(fails.values.toSet.contains("PMC fetch failed (batched only)"))
    assert(fails.values.toSet.contains("No PMCID"))

    val sm = res.summary.head
    assert(sm.getAs[Long]("skipped_existing") == 1L)
    assert(sm.getAs[Long]("appended") == 2L)
    assert(sm.getAs[Long]("input_unique_doi") ==
      sm.getAs[Long]("appended") + sm.getAs[Long]("skipped_existing") + sm.getAs[Long]("failures"))
  }

  test("ingest+embed pipeline: deterministic ids, upsert idempotence") {
    val records = Seq(
      ("10.1/a", Seq(("Intro", "alpha " * 120), ("Methods", "beta " * 200))),
      ("10.1/b", Seq(("Full Text", "gamma " * 50)))
    ).toDF("doc_id", "sections")
    val once = Pipelines.runIngestAndEmbed(records, None, chunkSize = 300, overlap = 30)
    val twice = Pipelines.runIngestAndEmbed(records, Some(once), chunkSize = 300, overlap = 30)
    val a = once.select("id").orderBy("id").collect().map(_.getString(0)).toList
    val b = twice.select("id").orderBy("id").collect().map(_.getString(0)).toList
    assert(a == b, "rerun upsert converges to the same keyed set")
    assert(a.head.contains("::c"))
    assert(once.count() == once.select("id").distinct().count())
  }

  test("resume source reads prior output and its seen set") {
    val (prior, seen) = Readers.loadExisting(spark, s"${TestSpark.fixtures}/fulltext_articles.json")
    assert(prior.count() == 3)
    assert(seen.collect().map(_.getString(0)).toSet ==
      Set("10.1038/s41592-021-01000-1", "10.1093/jamia/ocaa123", "10.1007/s10994-023-06330-z"))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{Readers, Tables, Writers}

/** VERDICT r16 task 8: the dir-shaped-source audit, extended past the
  * streaming readers. r16's bug pattern — a source written for a single
  * FILE silently reading a Spark-written DIRECTORY of part files as empty
  * (or near-empty) — is pinned here for every batch ingest surface: the
  * native-source readers (which handle directories by construction; this
  * spec keeps that true), the Tables layout loader, and the S11 resume
  * source, whose `multiLine` read really DID lose rows on its own
  * engine's JSONL sink output before r17 made it shape-adaptive. */
class DirShapedSourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val rows = Seq(
    ("10.1234/a", "J. One", "T1"),
    ("10.1234/b", "J. Two", "T2"),
    ("10.1234/c", null: String, "T3"))

  test("loadCsv reads a Spark-written multi-part CSV directory completely") {
    val dir = s"${tmp("graft_dircsv")}/in.csv"
    rows.toDF("doi", "journal", "title").repartition(3)
      .write.option("header", "true").csv(dir)
    val got = Readers.loadCsv(spark, dir)
    assert(got.count() == 3)
    assert(got.select("doi").as[String].collect().toSet ==
      rows.map(_._1).toSet)
  }

  test("loadJsonl reads a Spark-written multi-part JSONL directory completely") {
    val dir = s"${tmp("graft_dirjsonl")}/in.jsonl"
    rows.toDF("doi", "journal", "title").repartition(3).write.json(dir)
    assert(Readers.loadJsonl(spark, dir).count() == 3)
  }

  test("Tables loaders read a directory-shaped parquet table layout") {
    val base = tmp("graft_dirtables")
    Tables.documents(spark, TestSpark.sf0001).limit(7)
      .repartition(3).write.parquet(s"$base/documents.parquet")
    assert(Tables.documents(spark, base).count() == 7)
  }

  test("resume source adapts: reference single-file JSON array AND this engine's JSONL dir both resume losslessly") {
    val df = rows.toDF("doi", "journal", "title")
    // (a) the reference shape: ONE file holding a pretty-printed array
    val arrDir = tmp("graft_resume_arr")
    val arr = new java.io.File(arrDir, "existing.json")
    val body = rows.map { case (d, j, t) =>
      val jj = Option(j).map("\"" + _ + "\"").getOrElse("null")
      s"""  {"doi": "$d", "journal": $jj, "title": "$t"}"""
    }.mkString("[\n", ",\n", "\n]\n")
    java.nio.file.Files.writeString(arr.toPath, body)
    val (priorA, seenA) = Readers.loadExisting(spark, arr.getAbsolutePath)
    assert(priorA.count() == 3 && seenA.count() == 3)
    // (b) this engine's own sink shape: a multi-part JSONL directory. The
    // pre-r17 multiLine read parsed each part file as ONE document — a
    // 3-row prior output "resumed" with 1-2 seen DOIs and re-enriched the
    // rest. Lossless now.
    val jlDir = s"${tmp("graft_resume_jl")}/prior.json"
    Writers.jsonSink(df.repartition(3), jlDir)
    val (priorB, seenB) = Readers.loadExisting(spark, jlDir)
    assert(priorB.count() == 3, "every prior row must survive the resume read")
    assert(seenB.as[String].collect().toSet == seenA.as[String].collect().toSet,
      "seen-DOI set must be identical across both prior-output shapes")
  }

  test("sniffJsonArray: array file true, JSONL file false, JSONL dir false, _SUCCESS markers skipped") {
    val base = tmp("graft_sniff")
    val arr = new java.io.File(base, "a.json")
    java.nio.file.Files.writeString(arr.toPath, "\n  [ {\"x\": 1} ]")
    val jl = new java.io.File(base, "b.jsonl")
    java.nio.file.Files.writeString(jl.toPath, "{\"x\": 1}\n{\"x\": 2}\n")
    assert(Readers.sniffJsonArray(spark, arr.getAbsolutePath))
    assert(!Readers.sniffJsonArray(spark, jl.getAbsolutePath))
    val d = new java.io.File(base, "out"); d.mkdirs()
    // _SUCCESS first in listing order must not decide the shape
    java.nio.file.Files.writeString(new java.io.File(d, "_SUCCESS").toPath, "")
    java.nio.file.Files.writeString(new java.io.File(d, "part-00000.json").toPath,
      "{\"x\": 1}\n")
    assert(!Readers.sniffJsonArray(spark, d.getAbsolutePath))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.io.{Readers, Writers}
import graft.pipelines.Pipelines

/** Command-line surface (SURVEY.md §2.8 A6), mirroring the reference's
  * Typer commands (cli.py): `fulltext`, `chunk-fulltext`, `ingest`,
  * `chunk`, `embed`, `run` — each composed from the operator library.
  *
  * Usage (flags are `key=value` pairs after the command):
  *   runMain graft.Cli fulltext input=refs.bib idmap=idconv.csv \
  *     failmap=fails.csv jats=jats_dir out=out_dir [min_chars=200]
  *   runMain graft.Cli ingest input=articles.jsonl out=out_dir
  *   runMain graft.Cli chunk input=fulltext.json out=out_dir \
  *     [chunker=by_section] [chunk_size=1200] [overlap=120]
  *   runMain graft.Cli run input=fulltext.json out=out_dir
  */
object Cli {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Cli <fulltext|ingest|chunk|embed|run> key=value...")
    val cmd = args.head
    val opts = args.drop(1).flatMap { a =>
      a.split("=", 2) match { case Array(k, v) => Some(k -> v); case _ => None }
    }.toMap
    def req(k: String) = opts.getOrElse(k, sys.error(s"missing required option $k="))

    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    try cmd match {
      case "fulltext" =>
        val loaded = Readers.loadRecords(spark, req("input"))
        // CSV inputs carry only doi/journal (doi_utils.py:50-60) — title is
        // optional throughout the pipeline
        val input = (if (loaded.columns.contains("title")) loaded
          else loaded.withColumn("title", lit(null).cast("string")))
          .select(col("doi"), col("journal"), col("title"))
        val idMap = spark.read.option("header", "true").csv(req("idmap"))
        val failMap = spark.read.option("header", "true").csv(req("failmap"))
        val articles = Pipelines.parseJatsDir(spark, req("jats"))
        val seen = opts.get("resume") match {
          case Some(prior) => Readers.loadExisting(spark, prior)._2
          case None => spark.createDataFrame(
            java.util.List.of[org.apache.spark.sql.Row](),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("doi_norm",
                org.apache.spark.sql.types.StringType))))
        }
        val res = Pipelines.runFulltext(input, idMap, failMap, articles, seen,
          opts.getOrElse("min_chars", "200").toInt)
        val out = req("out")
        Writers.jsonSink(res.records.drop("sections"), s"$out/fulltext_articles", singleFile = true)
        // singleFile here too: the CLI targets the reference's fixture-scale
        // layout (one fulltext_skipped.csv); the distributed default is for
        // pipeline-scale use, where the failure channel is corpus-sized
        Writers.csvFailureSink(res.failures, s"$out/fulltext_skipped", singleFile = true)
        Writers.summarySink(res.summary, s"$out/fulltext_summary")
        res.summary.show(false)
      case "ingest" =>
        val records = Readers.loadRecords(spark, req("input"))
        Writers.jsonSink(graft.norm.Norm.coalesceArticle(records).drop("meta"), s"${req("out")}/articles")
      case "chunk" | "chunk-fulltext" =>
        import spark.implicits._
        val recs = sectionRecords(spark, req("input"))
        val chunked = recs.flatMap { case (docId, secs) =>
          graft.chunk.Chunkers.chunk(opts.getOrElse("chunker", "by_section"))(
            docId, secs, opts.getOrElse("chunk_size", "1200").toInt,
            opts.getOrElse("overlap", "120").toInt)
        }
        Writers.parquetSink(chunked.toDF(), s"${req("out")}/chunks")
      case "embed" =>
        val chunks = spark.read.parquet(req("input"))
        Writers.parquetSink(
          graft.embed.Embedders.embedColumn(chunks, opts.getOrElse("text_col", "text")),
          s"${req("out")}/embeddings")
      case "run" =>
        import spark.implicits._
        val recs = sectionRecords(spark, req("input"))
        val df = recs.map { case (d, s) => (d, s.map(x => (x.section_path, x.text))) }
          .toSeq.toDF("doc_id", "sections")
        val out = Pipelines.runIngestAndEmbed(df, None,
          opts.getOrElse("chunker", "by_section"),
          opts.getOrElse("chunk_size", "1200").toInt,
          opts.getOrElse("overlap", "120").toInt)
        val target = s"${req("out")}/vector_table"
        Writers.parquetSink(out, target)
        // count what was written — recounting `out` would re-embed everything
        println(s"""{"status":"ok","n_chunks":${spark.read.parquet(target).count()}}""")
      case other => sys.error(s"unknown command: $other")
    } finally spark.stop()
  }

  /** Load canonical fulltext JSON into (doc_id, sections) pairs on the
    * driver — CLI inputs are small control files; bulk data flows through
    * the DataFrame paths. */
  private def sectionRecords(spark: org.apache.spark.sql.SparkSession,
                             path: String): List[(String, List[graft.chunk.SectionText])] = {
    val text = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    graft.io.JsonTree.parseList(text).map { rec =>
      val m = rec.asInstanceOf[Map[String, Any]]
      val doi = Option(m.getOrElse("doi", null)).map(_.toString).getOrElse("")
      val docId = if (doi.nonEmpty) doi else "hash:" + Integer.toHexString(m.hashCode())
      (docId, graft.chunk.Chunkers.iterSectionTexts(m.getOrElse("sections", Map.empty)))
    }
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}
import graft.io.Tables

/** Ad-hoc stage profiler (not part of the driver contract). Current
  * target: the curation_full funnel, whose sf10→sf30 cell read 1.6x/decade
  * in the r15 sweep — per-stage wall time + row counts, plus the minhash
  * band-bucket size distribution of the gated corpus (the quadratic-term
  * suspect: curation_full runs minhashCandidates UNCAPPED, and docs whose
  * text cleans down to nothing share one signature → one giant bucket →
  * bucket² pair expansion). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // the curation_full stages, verbatim from SparkEntry
    val boilerSynth =
      "'subscribe to the ' || source || ' newsletter' || '\n' || " +
        "'promo code SAVE' || CAST(doc_id % 7 AS STRING) || '\n' || " +
        "replace(text, '. ', '\n') || '\n' || " +
        "'copyright ' || source || ' all rights reserved'"
    val docs = Tables.documents(spark, dir).withColumn("text", expr(boilerSynth))
    println(s"PROF dir=$dir docs=${docs.count()}")
    val noBoiler = t("boiler-removal") {
      val d = TextAnalysis.removeBoilerplateLines(docs, "doc_id", "text",
        "source", maxDocFreq = 10L).select(col("doc_id"), col("clean_text"))
      d.count(); d
    }
    val cleaned = t("span-removal+pin") {
      val d = Dedup.removeDuplicatedSpans(noBoiler, "doc_id", "clean_text", k = 5)
        .select(col("doc_id"), col("clean_text").as("text"))
        .join(Tables.documents(spark, dir).select(col("doc_id"), col("source")), "doc_id")
        .localCheckpoint(false)
      println(s"PROF   cleaned rows=${d.count()}")
      d
    }
    val gated = t("quality-gate+pin") {
      val d = cleaned
        .join(TextAnalysis.quality(cleaned, "doc_id", "text")
          .select(col("doc_id"), col("n_tokens"), col("quality_score")), "doc_id")
        .filter(col("quality_score") >= 45)
        .localCheckpoint(false)
      println(s"PROF   gated rows=${d.count()}")
      d
    }
    // bucket-size distribution of the gated corpus's band relation
    t("bucket-histogram") {
      val buckets = Dedup.minhashBands(
        Dedup.minhashSignatures(gated, "doc_id", "text", k = 3, numHashes = 16),
        "doc_id", 16)
        .groupBy(col("band_idx"), col("band_val")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2)
      val top = buckets.orderBy(col("n").desc).limit(10).collect()
      println("PROF   top buckets: " + top.map(_.getLong(2)).mkString(", "))
      // coalesce: sum over an empty relation is null — a corpus with no
      // colliding bands must profile as 0 pairs, not NPE
      val pairVol =
        buckets.agg(coalesce(sum(expr("n * (n - 1) / 2")), lit(0.0))).head().getDouble(0)
      println(f"PROF   uncapped candidate-pair volume=$pairVol%.0f")
    }
    val pairs = t("minhash-pairs-uncapped") {
      val p = Dedup.minhashCandidates(gated, "doc_id", "text", k = 3, numHashes = 16,
        maxBucket = Int.MaxValue)
      println(s"PROF   candidate pairs=${p.count()}")
      p
    }
    val reps = t("components+keepBest") {
      val r = Dedup.keepBest(
        graft.ops.Components.clusterDocuments(gated, "doc_id", pairs, "doc_a", "doc_b")
          .join(gated.select(col("doc_id"), col("source"), col("n_tokens"),
            col("quality_score")), "doc_id"),
        "cluster_id", "doc_id", "quality_score")
      println(s"PROF   reps rows=${r.count()}")
      r
    }
    t("token-budget") {
      val out = graft.ops.Sampling.tokenBudgetPerKey(reps, "source", "doc_id",
        "n_tokens", "quality_score", budget = 1000L)
      println(s"PROF   budget rows=${out.count()}")
    }
    spark.stop()
  }
}

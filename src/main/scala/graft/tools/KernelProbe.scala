package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.Dedup

/** Scratch decomposition probe for the optimization round (not part of the
  * driver contract): times each layer of the shingle→md5→conv→aggregate
  * kernel that underlies the dedup/curation families, with the noop sink
  * (guide §1.4) so the computation is what's timed. */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(name: String)(f: => DataFrame): Unit = {
      // warm once, then min of 2
      noop(f)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"KPROBE $name%-32s ${times.min}%8.3f s")
    }

    val docs = Tables.documents(spark, dir)
    println(s"KPROBE dir=$dir rows=${docs.count()}")

    t("scan_text")(docs.select(col("doc_id"), col("text")))
    t("tokens")(docs.select(col("doc_id"), Dedup.tokensCol(col("text")).as("toks")))
    t("shingles")(Dedup.shingles(docs, "doc_id", "text", 3, distinct = false))
    t("shingles_md5")(Dedup.shingles(docs, "doc_id", "text", 3, distinct = false)
      .select(col("doc_id"), md5(col("shingle")).as("_d")))
    t("shingles_md5_conv2")(Dedup.shingles(docs, "doc_id", "text", 3, distinct = false)
      .select(col("doc_id"), md5(col("shingle")).as("_d"))
      .select(col("doc_id"),
        graft.util.Hash.bits60OfHex(col("_d")).as("m1"),
        graft.util.Hash.bits56OfHex(col("_d")).as("m2")))
    t("minhash_sigs_full")(Dedup.minhashSignatures(docs, "doc_id", "text", 3, 16))

    // simhash decomposition: per-token md5 + 64 sums
    t("simhash_full")(Dedup.simhash(docs, "doc_id", "text"))

    // quality: regex + stopword HOF
    t("quality_full")(graft.ops.TextAnalysis.quality(docs, "doc_id", "text"))
    t("quality_regex_only")(docs
      .withColumn("_t", trim(regexp_replace(col("text"), "\\s+", " ")))
      .withColumn("punct_count", regexp_count(col("_t"), lit("[.,;:!?]")).cast("long"))
      .withColumn("upper_count", regexp_count(col("_t"), lit("[A-Z]")).cast("long"))
      .select(col("doc_id"), col("punct_count"), col("upper_count")))

    spark.stop()
  }
}

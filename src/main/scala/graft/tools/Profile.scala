package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.io.Tables

/** Ad-hoc stage profiler (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    docs.count() // warm scan
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    // bloom_contamination stage breakdown
    val shNoDist = Dedup.shingles(docs.filter(col("doc_id") % 97 =!= 0), "doc_id", "text", k = 3, distinct = false)
    t("probe-shingles-nodist")(shNoDist.count())
    t("probe-shingles-nodist2")(shNoDist.count())
    val sh = Dedup.shingles(docs.filter(col("doc_id") % 97 =!= 0), "doc_id", "text", k = 3)
    t("probe-shingles-distinct")(sh.count())
    t("probe-shingles-distinct2")(sh.count())
    val bench = Dedup.shingles(docs.filter(col("doc_id") % 97 === 0), "doc_id", "text", k = 3)
    var bloom: org.apache.spark.sql.DataFrame = null
    t("bloom-build")({ bloom = graft.ops.Bloom.build(bench, col("shingle"), numBits = 1 << 15, numHashes = 4); 1L })
    val probed = sh.crossJoin(broadcast(bloom))
      .withColumn("hit", graft.ops.Bloom.mightContain(col("bloom_words"), col("shingle"), 1 << 15, 4))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), sum(when(col("hit"), 1L).otherwise(0L)).as("n_bloom_hits"))
      .filter(col("n_bloom_hits") >= 1)
    t("probe+agg-full")(probed.count())
    t("probe+agg-full2")(probed.count())
    spark.stop()
  }
}

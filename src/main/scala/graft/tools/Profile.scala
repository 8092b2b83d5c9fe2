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
    val fp = Dedup.simhash(docs, "doc_id", "text")
    val bands = fp.select(col("doc_id"), explode(array(
      (0 to 3).map(i => struct(lit(i).as("band_idx"), col(s"band$i").as("band_val"))): _*)).as("b"))
      .select(col("doc_id"), col("b.band_idx").as("band_idx"), col("b.band_val").as("band_val"))
    t("bands")(bands.count())
    val cached = bands.cache()
    cached.count()
    val a = cached.select(col("doc_id").as("doc_a"), col("band_idx"), col("band_val"))
    val b = cached.select(col("doc_id").as("doc_b"), col("band_idx"), col("band_val"))
    val pre = a.join(b, Seq("band_idx", "band_val")).filter(col("doc_a") < col("doc_b"))
    t("join-predistinct")(pre.count())
    t("join-distinct")(pre.select("doc_a", "doc_b").distinct().count())
    t("pairs-uncached")(Dedup.simhashCandidates(docs, "doc_id", "text").count())
    spark.stop()
  }
}

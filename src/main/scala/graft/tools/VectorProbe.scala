package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
object VectorProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def t[A](name: String)(f: => A): A = {
      f // warm
      val t0 = System.nanoTime(); val r = f
      println(f"VPROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val emb = Tables.embeddings(spark, dir)
    println(s"VPROBE n=${emb.count()}")
    t("scan")(noop(emb))
    t("quantCol")(noop(emb.select(col("vec_id"), expr("transform(embedding, x -> cast(floor(cast(x as double) * 1048576.0D) as bigint))"))))
    val model = t("ivf_train_k8_i2")(graft.ops.Ivf.train(emb, "vec_id", "embedding", 8, 2))
    t("ivf_assign")(noop(graft.ops.Ivf.assign(emb, "vec_id", "embedding", model)))
    t("autoK_train")(graft.ops.Ivf.train(emb, "vec_id", "embedding", graft.ops.Ivf.autoK(5000L), 2))
    t("hier_train")(graft.ops.Ivf.trainHierarchical(emb, "vec_id", "embedding", k2 = 8))
    t("bitext_exact")(noop(graft.ops.Mining.bitextMine(emb, "vec_id", "embedding", col("vec_id") % 2 === 0, 4, 10000L)))
    // decomposition of the exact bitext tier
    val a = emb.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").cast("long").as("id_a"), col("embedding").as("_va"))
    val b = emb.filter(col("vec_id") % 2 =!= 0)
      .select(col("vec_id").cast("long").as("id_b"), col("embedding").as("_vb"))
    val rawPairs = a.crossJoin(b)
      .select(col("id_a"), col("id_b"),
        floor(graft.vector.VectorOps.cosine(col("_va"), col("_vb")) *
          lit(1048576.0)).cast("long").as("q"))
      .filter(col("q") > 0)
    t("bitext_pairs_noop")(noop(rawPairs))
    t("bitext_pairs_ckpt")(rawPairs.localCheckpoint(false).count())
    val ck = rawPairs.localCheckpoint(false)
    import org.apache.spark.sql.expressions.Window
    val wA = Window.partitionBy(col("id_a")).orderBy(col("q").desc, col("id_b"))
    val wB = Window.partitionBy(col("id_b")).orderBy(col("q").desc, col("id_a"))
    t("two_windows")(noop(ck.withColumn("rka", row_number().over(wA))
      .withColumn("rkb", row_number().over(wB)).filter(col("rka") <= 4 || col("rkb") <= 4)))
    spark.stop()
  }
}

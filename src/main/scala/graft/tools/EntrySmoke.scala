package graft.tools

import org.apache.spark.sql.SparkSession

/** Replicates the driver's entry() smoke check (rows > 0 at sf0.001). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"ENTRY rows=$n")
    spark.stop()
    if (n == 0) sys.exit(1) // mirror the driver: zero rows is a failure
  }
}

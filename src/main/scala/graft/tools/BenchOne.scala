package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query bench harness for iterating on one operator without paying
  * the full Bench sweep: `runMain graft.tools.BenchOne <q1,q2,...> [sfDir]`
  * warms each query at sf0.001 (codegen/JIT), then times it at the target
  * scale factor. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: runMain graft.tools.BenchOne <query[,query...]> [sfDir]")
      sys.exit(2)
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = args(0).split(",")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val small = "/root/testdata/sf0.001"
    val warmDir = if (new java.io.File(small).isDirectory) small else dir
    for (n <- names) graft.SparkEntry.queries(n)(spark, warmDir).count()
    // amortize persisted artifacts exactly like graft.Bench: a query with
    // a benchPrepare entry measures its steady-state probe, with the
    // build reported separately (this tool previously re-included the
    // build in the timed window, inflating scoped measurements)
    for (n <- names; prep <- graft.SparkEntry.benchPrepare.get(n)) {
      val t0 = System.nanoTime()
      prep(spark, dir)
      println(f"PREP   $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (n <- names) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir).count()
      println(f"TIMING $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

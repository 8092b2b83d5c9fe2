package graft.tools

import org.apache.spark.sql.SparkSession

/** AQE parity check for the hot query family: times each query with
  * adaptive execution ON (plus skew-join handling, the production 100 TB
  * posture) and OFF, in the same JVM and window, min-of-N per cell.
  *
  * Why this exists: PlanShapeSpec pins the static plan shapes with AQE
  * DISABLED (exchange counts are inspectable there), and `graft.Bench`
  * runs the session default (AQE on in Spark 3.2+). This tool closes the
  * loop between the two: it demonstrates the plan-shape claims don't
  * depend on AQE being off — the adaptive re-planner, including
  * skewedJoin splitting, neither degrades the hot family nor changes its
  * results. Recorded side-by-side in BASELINE.md.
  *
  * Usage: runMain graft.tools.AqeParity [q1,q2,...] [sfDir] [reps]
  * Defaults: dedup_neardup,curation_full,topk_per_key at sf0.1, 3 reps.
  */
object AqeParity {
  def main(args: Array[String]): Unit = {
    val names =
      (if (args.length > 0) args(0) else "dedup_neardup,curation_full,topk_per_key")
        .split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def reclaim(): Unit = { spark.catalog.clearCache(); System.gc() }
    val small = "/root/testdata/sf0.001"
    val warmDir = if (new java.io.File(small).isDirectory) small else dir
    for (n <- names) graft.SparkEntry.queries(n)(spark, warmDir).count()
    reclaim()
    // AQE off first, then on: if ambient load ramps DURING the run it
    // inflates the on-mode (the mode under test), never flatters it
    val results = for (aqe <- Seq(false, true); n <- names) yield {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe.toString)
      val counts = collection.mutable.Set.empty[Long]
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        counts += graft.SparkEntry.queries(n)(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        reclaim()
        dt
      }
      require(counts.size == 1, s"$n row count unstable across reps: $counts")
      println(f"AQE ${if (aqe) "on " else "off"} $n%-24s reps=${ts.map(t => f"$t%.2f").mkString(",")} min=${ts.min}%.2f rows=${counts.head}")
      (n, aqe, ts.min, counts.head)
    }
    for (n <- names) {
      val off = results.find(r => r._1 == n && !r._2).get
      val on = results.find(r => r._1 == n && r._2).get
      require(off._4 == on._4, s"$n: AQE changed the row count ${off._4} -> ${on._4}")
      println(f"PARITY $n%-24s off=${off._3}%.2f on=${on._3}%.2f ratio=${on._3 / off._3}%.2f rows_equal=true")
    }
    spark.stop()
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

class ProgressListenerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("B6: per-stage tqdm-shaped lines, bounded count, final line is k==n") {
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = ProgressListener.attach(spark, s => { lines.add(s); () }, maxLines = 4)
    try {
      spark.range(0, 1000).repartition(8).count()
      // listener bus is async: poll until the 8/8 line lands
      val deadline = System.currentTimeMillis() + 10000
      def all = { import scala.jdk.CollectionConverters._; lines.iterator().asScala.toVector }
      while (!all.exists(_.contains("8/8")) && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val ls = all
      assert(ls.nonEmpty, "progress lines were emitted")
      assert(ls.forall(_.startsWith("[progress] ")), s"tqdm-shaped prefix: $ls")
      val eight = ls.filter(_.contains("8/8"))
      assert(eight.nonEmpty, s"the 8-task stage reports completion: $ls")
      assert(eight.head.contains("(100%)"))
      // throttled: an 8-task stage at maxLines=4 emits every 2nd task -> <=4 lines
      assert(ls.count(_.matches(".*[0-9]/8 tasks.*")) <= 4,
        s"bounded lines per stage: $ls")
    } finally spark.sparkContext.removeSparkListener(l)
  }
}

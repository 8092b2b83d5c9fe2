package graft

import org.scalatest.funsuite.AnyFunSuite

class BenchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("timePreps records -1 for a failed prep, elapsed seconds for a good one") {
    var ran = 0
    val out = Bench.timePreps(spark, "unused-dir", Map(
      "good" -> ((_, _) => { ran += 1; () }),
      "bad" -> ((_, _) => sys.error("synthetic prep failure"))))
    assert(ran == 1, "good prep executed")
    assert(out("good") >= 0.0, "successful prep reports its elapsed time")
    assert(out("bad") == -1.0,
      "failed prep must report -1 (failed-query convention), not its time-to-failure — " +
        "otherwise a broken index build masquerades as a fast prep while the query " +
        "silently re-times the build")
  }
}

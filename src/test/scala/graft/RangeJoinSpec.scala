package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val points = Seq(
    ("u1", 1L, 5L), ("u1", 2L, 100L), ("u1", 3L, 250L),
    ("u2", 4L, 100L)
  ).toDF("k", "pid", "v")
  private lazy val intervals = Seq(
    ("u1", 10L, 0L, 100L),    // inclusive hi catches pid=2 at v=100
    ("u1", 11L, 90L, 260L),   // spans multiple buckets, catches 2 and 3
    ("u2", 12L, 200L, 300L),  // wrong range for u2's point
    ("u1", 13L, 500L, 400L)   // inverted: matches nothing
  ).toDF("k", "iid", "lo", "hi")

  private def run(width: Long) =
    RangeJoin.byBucket(points, intervals, "k", "v", "lo", "hi", width)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bucketed range join equals the plain inequality join") {
    val expected = points.join(intervals, Seq("k"))
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(64L) == expected)
    assert(expected == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L)))
  }

  test("result is bucket-width invariant (no duplicate pair across cells)") {
    val base = run(64L)
    assert(run(1L) == base)
    assert(run(1000L) == base)
  }

  test("plan is an equi-join, not a nested-loop product") {
    val plan = RangeJoin.byBucket(points, intervals, "k", "v", "lo", "hi", 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$plan")
  }
}

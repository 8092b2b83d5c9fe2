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

  private lazy val aIv = Seq(
    ("u1", 20L, 0L, 300L),    // long interval spanning many cells
    ("u1", 21L, 400L, 450L),
    ("u2", 22L, 0L, 50L),
    ("u1", 23L, 90L, 10L)     // inverted: matches nothing
  ).toDF("k", "aid", "a_lo", "a_hi")
  private lazy val bIv = Seq(
    ("u1", 30L, 250L, 500L),  // overlaps 20 (shares cells) AND 21
    ("u1", 31L, 301L, 350L),  // misses 20 by 1 (inclusive bounds)
    ("u1", 32L, 300L, 320L),  // touches 20 exactly at 300
    ("u2", 33L, 60L, 70L)     // same key, no overlap
  ).toDF("k", "bid", "b_lo", "b_hi")

  private def runOverlap(width: Long) =
    RangeJoin.overlapByBucket(aIv, bIv, "k", "a_lo", "a_hi", "b_lo", "b_hi", width)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("overlap join equals the plain theta join, each pair exactly once") {
    val expected = aIv.join(bIv, Seq("k"))
      .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected == Set((20L, 30L), (20L, 32L), (21L, 30L)))
    assert(runOverlap(64L) == expected)
    // width 64: 20×30 share cells ⌊250/64⌋..⌊300/64⌋ — exactly one emission
    val rows = RangeJoin.overlapByBucket(aIv, bIv, "k", "a_lo", "a_hi", "b_lo", "b_hi", 64L)
      .select("aid", "bid").collect()
    assert(rows.length == rows.toSet.size && rows.length == 3,
      "multi-cell overlaps must not duplicate")
  }

  test("overlap result is bucket-width invariant") {
    val base = runOverlap(64L)
    assert(runOverlap(1L) == base)
    assert(runOverlap(10000L) == base)
  }

  test("overlap join refuses colliding non-key columns and stays an equi-join") {
    intercept[IllegalArgumentException] {
      RangeJoin.overlapByBucket(aIv, aIv, "k", "a_lo", "a_hi", "a_lo", "a_hi", 64L)
    }
    val plan = RangeJoin.overlapByBucket(aIv, bIv, "k", "a_lo", "a_hi", "b_lo", "b_hi", 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"overlap join must stay an equi-join:\n$plan")
  }
}

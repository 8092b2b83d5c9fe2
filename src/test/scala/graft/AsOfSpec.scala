package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AsOf

class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val left = Seq(
    ("u1", 100L, 5L), ("u1", 200L, 6L), ("u1", 300L, 7L),
    ("u2", 150L, 8L), ("u3", 50L, 9L)
  ).toDF("k", "t", "lid")
  private lazy val right = Seq(
    ("u1", 100L, 1L), ("u1", 250L, 2L),
    ("u2", 100L, 3L), ("u2", 100L, 4L) // duplicate (key, ts): greatest rid wins
  ).toDF("k", "t", "rid")

  test("as-of semantics: latest right row at-or-before each left row") {
    val got = AsOf.asOfJoin(left, right, "k", "t", Seq("rid"), "rid")
      .collect().map(r => (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(got(5L) == Some(1L), "equal timestamp matches (<= semantics)")
    assert(got(6L) == Some(1L), "carries forward past unmatched gap")
    assert(got(7L) == Some(2L), "superseded by newer right row")
    assert(got(8L) == Some(4L), "duplicate (key,ts) resolves to greatest tie-break")
    assert(got(9L) == None, "no prior right row -> null")
  }

  test("left rows are never dropped or duplicated") {
    val out = AsOf.asOfJoin(left, right, "k", "t", Seq("rid"), "rid")
    assert(out.count() == left.count())
    assert(out.select("lid").distinct().count() == left.count())
  }

  test("plan is one exchange + window scan, no theta join") {
    val plan = AsOf.asOfJoin(left, right, "k", "t", Seq("rid"), "rid")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"as-of must not fall back to a product join:\n$plan")
  }

  test("null right keys/timestamps never match (equality-join null semantics)") {
    val nullRight = Seq(
      (Option.empty[String], Option(50L), 7L), // null key
      (Option("u3"), Option.empty[Long], 9L) // null ts
    ).toDF("k", "t", "rid")
    val nullLeft = Seq((Option.empty[String], 100L, 1L), (Option("u3"), 100L, 2L)).toDF("k", "t", "lid")
    val got = AsOf.asOfJoin(nullLeft, nullRight, "k", "t", Seq("rid"), "rid")
      .collect().map(r => (r.getLong(2), Option(r.get(3)))).toMap
    assert(got(1L).isEmpty, "null-key left row must not receive a null-key right payload")
    assert(got(2L).isEmpty, "null-ts right row can never be at-or-before anything")
    assert(got.size == 2, "left rows always survive")
  }

  test("valueCols colliding with left columns are rejected") {
    intercept[IllegalArgumentException] {
      AsOf.asOfJoin(left, right.withColumnRenamed("rid", "lid"), "k", "t", Seq("lid"), "lid")
    }
  }
}

package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TopK

class TopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def windowRef(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("key")).orderBy(col("ord").desc, col("id"))
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("key"), col("id"), col("ord"), col("rank").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
  }

  test("bounded-heap top-k equals the window formulation, ties and small groups included") {
    // ties on ord (id breaks them), groups smaller than k, duplicate ords
    val rows = (for {
      key <- 0L until 20L
      i <- 0L until (key % 7)
    } yield (key, key * 100 + i, (i * 37) % 5)) // many tied ords per key
    val df = rows.toDF("key", "id", "ord").repartition(13)
    val got = TopK.topKPerKey(df, "key", "id", "ord", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == windowRef(df, 3))
  }

  test("top-k is stable under repartitioning (merge-order-free)") {
    val df = (0L until 5000L).map(i => (i % 11, i, (i * 7919) % 1000)).toDF("key", "id", "ord")
    val a = TopK.topKPerKey(df.repartition(3), "key", "id", "ord", 5)
      .collect().map(_.toSeq).toSet
    val b = TopK.topKPerKey(df.repartition(29), "key", "id", "ord", 5)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("Long.MinValue ordinals rank correctly (no negation overflow) and nulls are dropped") {
    val df = Seq(
      (Some(1L), Some(10L), Some(Long.MinValue)),
      (Some(1L), Some(11L), Some(0L)),
      (Some(1L), Some(12L), Some(Long.MaxValue)),
      (Some(1L), Some(13L), Option.empty[Long]), // null ord → dropped
      (Option.empty[Long], Some(14L), Some(5L))) // null key → dropped
      .toDF("key", "id", "ord")
    val out = TopK.topKPerKey(df, "key", "id", "ord", 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(3))).toList
    assert(out == List((12L, 1), (11L, 2), (10L, 3)))
  }

  test("aggregation runs with map-side partials (the claimed ≤ keys×k exchange)") {
    val df = (0L until 1000L).map(i => (i % 7, i, i * 3)).toDF("key", "id", "ord")
    val plan = TopK.topKPerKey(df, "key", "id", "ord", 3)
      .queryExecution.executedPlan.toString
    // typed Aggregator compiles to ObjectHashAggregate with a partial pass
    // before the exchange — without it, every row would cross the shuffle
    assert(plan.contains("ObjectHashAggregate"), s"no object-hash aggregate in:\n$plan")
    val aggs = plan.split("\n").count(_.contains("ObjectHashAggregate"))
    assert(aggs >= 2, s"expected partial+final aggregate pair, saw $aggs:\n$plan")
  }

  test("rank is dense 1..min(k, group size) within every key") {
    val df = (0L until 100L).map(i => (i % 9, i, i)).toDF("key", "id", "ord")
    val out = TopK.topKPerKey(df, "key", "id", "ord", 4)
      .collect().map(r => (r.getLong(0), r.getInt(3)))
    out.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length))
    }
  }
}

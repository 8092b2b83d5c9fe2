package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val ids = (0L until 20000L).map(i => Tuple1(i)).toDF("id")

  test("split fractions land near 90/5/5 and cover every row exactly once") {
    val out = Sampling.hashSplit(ids, "id")
    assert(out.count() == 20000)
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(math.abs(counts("train") / 20000.0 - 0.90) < 0.01)
    assert(math.abs(counts("val") / 20000.0 - 0.05) < 0.01)
    assert(math.abs(counts("test") / 20000.0 - 0.05) < 0.01)
  }

  test("assignments are stable under repartitioning and corpus growth") {
    val a = Sampling.hashSplit(ids, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.hashSplit(ids.repartition(13), "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "partitioning must not move split assignments")
    val grown = (0L until 40000L).map(i => Tuple1(i)).toDF("id")
    val c = Sampling.hashSplit(grown, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ids.collect().forall(r => a(r.getLong(0)) == c(r.getLong(0))),
      "doubling the corpus must not reassign existing rows")
  }

  test("hashSample keeps a stable nested subset") {
    val s10 = Sampling.hashSample(ids, "id", 1000).collect().map(_.getLong(0)).toSet
    val s20 = Sampling.hashSample(ids, "id", 2000).collect().map(_.getLong(0)).toSet
    assert(s10.subsetOf(s20), "smaller sample is nested in the larger one")
    assert(math.abs(s10.size / 20000.0 - 0.10) < 0.01)
  }
}

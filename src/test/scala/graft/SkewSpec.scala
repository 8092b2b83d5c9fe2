package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 90% of fact rows share one hot key — the shape that stalls a plain
  // hash join at scale
  private lazy val facts = (0 until 2000).map { i =>
    (if (i % 10 == 0) s"key$i" else "HOT", s"payload$i")
  }.toDF("k", "payload")
  private lazy val dims = (Seq("HOT") ++ (0 until 2000 by 10).map(i => s"key$i"))
    .map(k => (k, s"dim_$k")).toDF("k", "label")

  test("salted inner join equals the plain join exactly") {
    val plain = facts.join(dims, Seq("k"), "inner")
      .select("k", "payload", "label").collect().toSet
    val salted = Skew.saltedJoin(facts, dims, "k", saltFactor = 8)
      .select("k", "payload", "label").collect().toSet
    assert(salted == plain)
    assert(plain.size == 2000)
  }

  test("salted left join preserves unmatched facts") {
    val extra = facts.unionByName(Seq(("NO_DIM", "orphan")).toDF("k", "payload"))
    val plain = extra.join(dims, Seq("k"), "left")
      .select("k", "payload", "label").collect().toSet
    val salted = Skew.saltedJoin(extra, dims, "k", saltFactor = 8, joinType = "left")
      .select("k", "payload", "label").collect().toSet
    assert(salted == plain)
    assert(plain.exists { r => r.getString(0) == "NO_DIM" })
  }

  test("salt spreads the hot key across sub-keys") {
    val salts = facts.filter(col("k") === "HOT")
      .withColumn("_salt", pmod(xxhash64(struct(facts.columns.map(col).toIndexedSeq: _*)), lit(8)))
      .select("_salt").distinct().count()
    assert(salts > 1, "hot key must not land on a single salted sub-key")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Kmv

class KmvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def setDf(name: String, vals: Seq[String]) =
    vals.map(v => (name, v)).toDF("source", "v")

  test("sketch is duplicate-insensitive and partitioning-invariant") {
    val once = setDf("a", (0 until 500).map(i => s"tok$i"))
    val dup = once.unionByName(once).unionByName(once.repartition(7))
    val s1 = Kmv.minSketch(once, Seq("source"), col("v"), 64)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val s2 = Kmv.minSketch(dup.repartition(13), Seq("source"), col("v"), 64)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(s1 == s2)
  }

  test("merge of disjoint slices equals the single-pass sketch") {
    val lo = setDf("a", (0 until 400).map(i => s"w$i"))
    val hi = setDf("a", (400 until 900).map(i => s"w$i"))
    val whole = Kmv.minSketch(lo.unionByName(hi), Seq("source"), col("v"), 64)
    val merged = Kmv.merge(Seq("source"),
      Kmv.minSketch(lo, Seq("source"), col("v"), 64),
      Kmv.minSketch(hi, Seq("source"), col("v"), 64))
    assert(whole.orderBy("bucket").collect().toSeq ==
      merged.orderBy("bucket").collect().toSeq)
  }

  test("cardinality estimate lands within 25% on 5k distinct values") {
    val df = setDf("a", (0 until 5000).map(i => s"item-$i"))
    val card = Kmv.cardinalityCard(
      Kmv.minSketch(df, Seq("source"), col("v"), 256), Seq("source"), 256)
      .collect().head
    val est = card.getAs[Long]("est_distinct")
    assert(math.abs(est - 5000.0) / 5000.0 < 0.25, s"estimate $est too far from 5000")
  }

  test("jaccard matrix: identical sets ~10000 bp, disjoint sets 0 bp, half overlap in band") {
    val a = setDf("a", (0 until 2000).map(i => s"t$i"))
    val b = setDf("b", (0 until 2000).map(i => s"t$i"))         // == a
    val c = setDf("c", (5000 until 7000).map(i => s"t$i"))      // disjoint
    val d = setDf("d", (1000 until 3000).map(i => s"t$i"))      // |a∩d|=1000, |a∪d|=3000 → J=3333bp
    val sk = Kmv.minSketch(a.unionByName(b).unionByName(c).unionByName(d),
      Seq("source"), col("v"), 256)
    val m = Kmv.jaccardMatrix(sk, "source").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("jaccard_est_bp")).toMap
    assert(m(("a", "b")) == 10000L, "identical sets must match in every co-occupied bucket")
    assert(m(("a", "c")) == 0L, "disjoint sets share no minima")
    val ad = m(("a", "d"))
    assert(ad > 2000L && ad < 4700L, s"J(a,d)=3333bp expected, est $ad out of band")
  }

  test("bucket count must be a power of two") {
    intercept[IllegalArgumentException] {
      Kmv.minSketch(setDf("a", Seq("x")), Seq("source"), col("v"), 100)
    }
  }

  test("marginalCard: a mirror source's marginal reads ~0, a unique source's reads its size") {
    val a = setDf("a", (0 until 3000).map(i => s"t$i"))
    val mirror = setDf("m", (0 until 3000).map(i => s"t$i"))         // copies a
    val uniq = setDf("u", (9000 until 11000).map(i => s"t$i"))       // 2000 novel
    val sk = Kmv.minSketch(a.unionByName(mirror).unionByName(uniq),
      Seq("source"), col("v"), 256)
    val card = Kmv.marginalCard(sk, "source", 256)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val union = card("a")._2
    assert(math.abs(union - 5000.0) / 5000.0 < 0.25, s"union est $union off 5000")
    assert(card("m")._3 < 500, s"mirror marginal should read ~0, got ${card("m")._3}")
    assert(math.abs(card("u")._3 - 2000.0) / 2000.0 < 0.35,
      s"unique marginal should read ~2000, got ${card("u")._3}")
  }

  test("marginalCard: single-group corpus reads est_without = 0, marginal = union") {
    val solo = Kmv.marginalCard(
      Kmv.minSketch(setDf("only", (0 until 1000).map(i => s"x$i")), Seq("source"), col("v"), 256),
      "source", 256).collect()
    assert(solo.length == 1)
    assert(solo.head.getLong(1) == 0L)
    assert(solo.head.getLong(3) == solo.head.getLong(2))
  }
}

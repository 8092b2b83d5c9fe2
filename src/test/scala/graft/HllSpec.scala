package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Hll

class HllSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("estimates are unbiased within HLL error bounds across groups") {
    // one group can legitimately land 3σ out (m=64 → σ≈13%); assert the
    // per-group worst case at 4σ and the cross-group MEAN at 2σ/√g
    val n = 5000
    val groups = 6
    val df = (0 until groups).flatMap(g => (0 until n).map(i => (s"g$g", s"g${g}_val$i")))
      .toDF("g", "v")
    val states = Hll.sketch(df, Seq("g"), col("v")).collect()
    assert(states.length == groups)
    val errs = states.map(r =>
      Hll.estimate(r.getAs[Int]("hll_zeros"), r.getAs[Long]("hll_denom_scaled")) / n - 1.0)
    val se = 1.04 / math.sqrt(Hll.NumRegisters) // ~13%
    assert(errs.forall(e => math.abs(e) < 4 * se), s"worst group err ${errs.map(math.abs).max}")
    assert(math.abs(errs.sum / groups) < 2 * se / math.sqrt(groups),
      s"mean err ${errs.sum / groups} suggests systematic bias")
  }

  test("duplicates don't move the sketch (distinct semantics)") {
    val once = (0 until 500).map(i => ("g", s"v$i")).toDF("g", "v")
    val tripled = once.unionByName(once).unionByName(once)
    val a = Hll.sketch(once, Seq("g"), col("v")).head
    val b = Hll.sketch(tripled, Seq("g"), col("v")).head
    assert(a.getAs[Int]("hll_zeros") == b.getAs[Int]("hll_zeros"))
    assert(a.getAs[Long]("hll_denom_scaled") == b.getAs[Long]("hll_denom_scaled"))
  }

  test("state is bit-reproducible across runs and partitionings") {
    val df = (0 until 2000).map(i => (s"g${i % 3}", s"v$i")).toDF("g", "v")
    val a = Hll.sketch(df, Seq("g"), col("v")).orderBy("g").collect().toSeq
    val b = Hll.sketch(df.repartition(17), Seq("g"), col("v")).orderBy("g").collect().toSeq
    assert(a == b, "register MAX state must not depend on partitioning")
  }

  test("null values are ignored, not folded into corrupt register state") {
    val clean = Seq(("g", "a"), ("g", "b")).toDF("g", "v")
    val withNulls = Seq(("g", "a"), ("g", null), ("g", "b"), ("g", null)).toDF("g", "v")
    val a = Hll.sketch(clean, Seq("g"), col("v")).head
    val b = Hll.sketch(withNulls, Seq("g"), col("v")).head
    assert(a.getAs[Int]("hll_zeros") == b.getAs[Int]("hll_zeros"))
    assert(a.getAs[Long]("hll_denom_scaled") == b.getAs[Long]("hll_denom_scaled"))
  }

  test("merged register slices equal the single-pass sketch, even with overlap") {
    val df = (0 until 3000).map(i => (s"g${i % 2}", s"v$i")).toDF("g", "v")
    val whole = Hll.sketch(df, Seq("g"), col("v")).orderBy("g").collect().toSeq
    // disjoint halves
    val a = Hll.registers(df.filter(expr("substring(v, 2) % 2 = 0")), Seq("g"), col("v"))
    val b = Hll.registers(df.filter(expr("substring(v, 2) % 2 = 1")), Seq("g"), col("v"))
    val merged = Hll.collapse(Hll.merge(Seq("g"), a, b), Seq("g")).orderBy("g").collect().toSeq
    assert(merged == whole, "disjoint merge must equal single pass")
    // overlapping slices (max is idempotent)
    val c = Hll.registers(df.filter(expr("substring(v, 2) % 3 != 1")), Seq("g"), col("v"))
    val overlapped = Hll.collapse(Hll.merge(Seq("g"), a, b, c), Seq("g")).orderBy("g").collect().toSeq
    assert(overlapped == whole, "overlap must not change the state")
  }

  test("small groups fall into linear counting and stay sane") {
    val df = Seq(("g", "a"), ("g", "b"), ("g", "c")).toDF("g", "v")
    val s = Hll.sketch(df, Seq("g"), col("v")).head
    val est = Hll.estimate(s.getAs[Int]("hll_zeros"), s.getAs[Long]("hll_denom_scaled"))
    assert(est > 0 && est < 10, s"tiny-cardinality estimate $est")
  }
}

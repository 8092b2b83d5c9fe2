package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Quantize

class QuantizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rng = new scala.util.Random(7)
  private def randVec(dim: Int): Seq[Float] =
    Seq.fill(dim)((rng.nextDouble() * 2 - 1).toFloat)

  test("SQL int8 codes match the pure-Scala kernel on random vectors") {
    val vecs = (0L until 50L).map(i => (i, randVec(64)))
    val out = Quantize.int8Codes(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    vecs.foreach { case (id, v) =>
      val (amax, codes) = Quantize.int8CodesLocal(v)
      assert(out(id)._1 == amax, s"amax mismatch for $id")
      assert(out(id)._2 == codes, s"codes mismatch for $id")
    }
  }

  test("NaN clamps to +2^34 and saturates at 127 in BOTH kernels") {
    // SQL least/greatest order NaN above every number (Spark and DuckDB
    // agree), so the clamp sends NaN to +2^34; the local twin must mirror
    // that, not propagate the NaN into a 0 code
    val v = Seq(0.5f, Float.NaN, -0.25f)
    val (amaxL, codesL) = Quantize.int8CodesLocal(v)
    val out = Quantize.int8Codes(Seq((0L, v)).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
      .collect().map(r => (r.getLong(1), r.getSeq[Long](2))).head
    assert(out == ((amaxL, codesL)), "SQL and local kernels diverged on NaN")
    assert(codesL(1) == 127L, "NaN element must saturate at the +clamp code")
    assert(amaxL == 17179869184L * 1048576L, "amax must be the +2^34 clamp in 2^-20 units")
  }

  test("codes stay in int8 range; zero vector quantizes to all zeros") {
    val vecs = Seq((0L, randVec(64)), (1L, Seq.fill(64)(0.0f)), (2L, Seq.fill(64)(1.0f)))
    val out = Quantize.int8Codes(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    out.values.foreach { case (_, codes) =>
      assert(codes.forall(c => c >= -127 && c <= 127)) }
    assert(out(1L) == (0L, Seq.fill(64)(0L)), "zero vector → amax 0, zero codes")
    assert(out(2L)._2.forall(_ == 127L), "uniform max vector saturates at 127")
  }

  test("dequantized reconstruction is within the half-step bound and preserves cosine") {
    val vecs = (0L until 30L).map(i => (i, randVec(64)))
    val df = vecs.toDF("vec_id", "embedding")
    val deq = Quantize.int8Codes(df, "vec_id", "embedding")
      .withColumn("deq", Quantize.dequantCol(col("codes"), col("amax_q")))
      .select("vec_id", "deq", "amax_q")
      .collect().map(r => r.getLong(0) -> (r.getSeq[Double](1), r.getLong(2))).toMap
    vecs.foreach { case (id, v) =>
      val (d, amaxQ) = deq(id)
      val amax = amaxQ.toDouble / 1048576.0
      // |x - deq| ≤ half an int8 step (amax/254) + the 2^-20 floor error
      val bound = amax / 254.0 + 2.0 / 1048576.0
      v.zip(d).foreach { case (x, y) =>
        assert(math.abs(x - y) <= bound, s"vec $id: |$x - $y| > $bound") }
      val dot = v.zip(d).map { case (a, b) => a * b }.sum
      val na = math.sqrt(v.map(a => a.toDouble * a).sum)
      val nb = math.sqrt(d.map(b => b * b).sum)
      assert(dot / (na * nb) > 0.999, s"vec $id: cosine degraded past SQ8 expectations")
    }
  }
}

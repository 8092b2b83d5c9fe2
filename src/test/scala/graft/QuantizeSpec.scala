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

  test("binaryCodes packs sign bits little-endian into 64-bit words, bit 63 included") {
    val allPos = Seq.fill(64)(1.0f)
    val alt = Seq.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val d70 = Seq.tabulate(70)(i => if (i < 64) -1.0f else 1.0f)
    val zero = Seq.fill(3)(0.0f)
    val out = Quantize.binaryCodes(
      Seq((0L, allPos), (1L, alt), (2L, d70), (3L, zero)).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(0L) == Seq(-1L), "all 64 bits set wraps to -1 (bit 63 = sign bit)")
    assert(out(1L) == Seq(0x5555555555555555L), "even dims set → alternating bits")
    assert(out(2L) == Seq(0L, 63L), "dims 65-70 land in word 1, bits 0-5")
    assert(out(3L) == Seq(7L), "zero components count as non-negative")
  }

  test("hammingCol sums xor popcounts across words") {
    val df = Seq((Seq(-1L, 0L), Seq(0L, 1L)), (Seq(5L, 5L), Seq(5L, 5L)))
      .toDF("a", "b")
    val out = df.select(Quantize.hammingCol(col("a"), col("b"))).collect().map(_.getLong(0))
    assert(out.toSeq == Seq(65L, 0L), "64 bits from word 0 + 1 from word 1; identical codes → 0")
  }

  test("binaryHammingRerank with a corpus-wide shortlist reproduces brute-force top-k") {
    val vecs = (0L until 60L).map(i => (i, randVec(64)))
    val df = vecs.toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val funnel = Quantize.binaryHammingRerank(df, "vec_id", "embedding",
      q, "qid", "qvec", k = 5, shortlist = 59)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val truth = graft.vector.VectorOps.knnCosine(df, "vec_id", "embedding",
      q, "qid", "qvec", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(funnel == truth, "shortlist = corpus ⇒ the rescore IS brute force")
  }

  test("binaryHammingRerank shortlist bounds the rescore; requires shortlist >= k") {
    val vecs = (0L until 40L).map(i => (i, randVec(64)))
    val df = vecs.toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val out = Quantize.binaryHammingRerank(df, "vec_id", "embedding",
      q, "qid", "qvec", k = 10, shortlist = 10).collect()
    assert(out.length == 10, "exactly k survivors when shortlist = k")
    assertThrows[IllegalArgumentException] {
      Quantize.binaryHammingRerank(df, "vec_id", "embedding", q, "qid", "qvec",
        k = 10, shortlist = 5)
    }
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

  test("jlProject equals an independent driver-side fold over the sign planes") {
    val data = Seq(0L -> Seq(1.0f, -0.5f, 0.25f, 0.0f), 1L -> Seq(-1.0f, 2.0f, 0.125f, -0.75f))
    val out = Quantize.jlProject(data.toDF("vec_id", "embedding"), "vec_id", "embedding",
        inDims = 4, outDims = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val planes = graft.ops.Similarity.hyperplanes(4, 1, 3, 42L)(0)
    for ((id, v) <- data) {
      val vq = v.map(x => math.floor(x.toDouble * 1048576.0).toLong)
      val exp = planes.toSeq.map(p =>
        vq.zip(p.toSeq.map(_.toLong)).map { case (a, s) => a * s }.sum)
      assert(out(id) == exp, s"vec $id")
    }
    // sign matrix is ±1 only — a 0 weight would silently drop a dimension
    assert(planes.flatten.forall(w => w == 1.0 || w == -1.0))
  }

  test("jlShortlistRerank with full-width shortlist equals brute-force cosine ranking") {
    val corpus = (0L until 8L).map(i => (i, randVec(8))).toSeq
    val df = corpus.toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val out = Quantize.jlShortlistRerank(df, "vec_id", "embedding", q, "qid", "qvec",
        k = 3, shortlist = 7, inDims = 8, outDims = 4)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(2)))
    // shortlist covers every candidate, so the rescore IS brute force
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val qv = corpus.head._2
    val expect = corpus.tail.map { case (id, v) => (id, cos(v, qv)) }
      .sortBy { case (id, s) => (-s, id) }.take(3).map(_._1)
    assert(out.map(_._1).toSeq == expect, "exact top-3 after rescore")
    assert(out.map(_._2).toSeq == Seq(1, 2, 3))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Pq

class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 20 deterministic 8-dim vectors in two well-separated families, plus a
  // planted near-duplicate pair (ids 10 and 11 identical)
  private lazy val emb = (0L until 20L).map { i =>
    val base = if (i % 2 == 0) 1.0f else -1.0f
    val v = (0 until 8).map { d =>
      if (i == 11L) (10f + d) / 17f // == vector 10's values
      else if (i == 10L) (10f + d) / 17f
      else base * (1f + ((i.toInt * 7 + d * 3) % 5) / 10f)
    }
    (i, v)
  }.toDF("vec_id", "embedding")

  test("training is reproducible and codebooks keep k entries per subspace") {
    val m1 = Pq.train(emb, "vec_id", "embedding", m = 2, k = 4, iters = 1)
    val m2 = Pq.train(emb.repartition(7), "vec_id", "embedding", m = 2, k = 4, iters = 1)
    assert(m1.subDim == 4)
    assert(m1.books.forall(_.size == 4))
    for (s <- m1.books.indices; cid <- m1.books(s).keys) {
      assert(m1.books(s)(cid)._1.toSeq == m2.books(s)(cid)._1.toSeq,
        "integer centroid state must not depend on partitioning")
      assert(m1.books(s)(cid)._2 == m2.books(s)(cid)._2)
    }
  }

  test("identical vectors encode to identical codes; encoding is partition-stable") {
    val model = Pq.train(emb, "vec_id", "embedding", m = 2, k = 4, iters = 1)
    val codes = Pq.encode(emb, "vec_id", "embedding", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(10L) == codes(11L), "planted duplicates share all subspace codes")
    assert(codes.values.forall(_.length == 2))
    val again = Pq.encode(emb.repartition(5), "vec_id", "embedding", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes == again)
  }

  test("ADC search matches an independently computed table-lookup ranking") {
    val model = Pq.train(emb, "vec_id", "embedding", m = 2, k = 4, iters = 1)
    val out = Pq.searchAdc(emb, "vec_id", "embedding", model,
      queryIds = Seq(10L), k = 5)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(2))).toList
    assert(out.forall(_._1 != 10L), "query never its own neighbor")
    assert(out.length == 5)
    // reference ranking computed directly from the model: score(x) =
    // Σ_s dot(q_s, centroid_{s, code_s(x)}), ties by neighbor id
    val qv = emb.filter(col("vec_id") === 10L).select("embedding")
      .head().getSeq[Float](0)
    val codes = Pq.encode(emb, "vec_id", "embedding", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    def score(cs: Seq[Int]): Double =
      model.books.indices.map { s =>
        val (sums, n) = model.books(s)(cs(s))
        (0 until model.subDim).map(i =>
          (sums(i).toDouble / n) * qv(s * model.subDim + i).toDouble).sum
      }.sum
    val expected = codes.toSeq.filter(_._1 != 10L)
      .map { case (id, cs) => (id, score(cs)) }
      .sortBy { case (id, sc) => (-sc, id) }
      .take(5).zipWithIndex.map { case ((id, _), i) => (id, i + 1) }.toList
    assert(out == expected, s"ADC ranking diverged: got $out expected $expected")
    // the planted duplicate (11) shares every code with the query, so its
    // score equals the query's own reconstruction score — a self-consistency
    // anchor for the encode/table plumbing
    assert(score(codes(11L)) == score(codes(10L)))
  }

  test("full-probe IVF-PQ equals plain ADC search; narrow probe is a subset") {
    val pq = Pq.train(emb, "vec_id", "embedding", m = 2, k = 4, iters = 1)
    val coarse = graft.ops.Ivf.train(emb, "vec_id", "embedding", k = 4, iters = 1)
    val full = Pq.searchAdcIvf(emb, "vec_id", "embedding", pq, coarse,
      queryIds = Seq(10L), k = 5, nprobe = 4)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    val plain = Pq.searchAdc(emb, "vec_id", "embedding", pq, queryIds = Seq(10L), k = 5)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    assert(full == plain, "probing every cluster must reduce to brute-force ADC")
    val narrow = Pq.searchAdcIvf(emb, "vec_id", "embedding", pq, coarse,
      queryIds = Seq(10L), k = 5, nprobe = 1)
      .collect().map(r => r.getLong(1)).toSet
    assert(narrow.nonEmpty && narrow.forall(n => n != 10L))
  }
}

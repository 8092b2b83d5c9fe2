package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.vector.VectorOps

/** IVF (inverted-file) approximate nearest neighbor — the codebook-based
  * scale path next to [[Similarity.annCosineLsh]]'s hash-based one.
  *
  * Train: deterministic seed centroids + a few Lloyd iterations, all as
  * DataFrame ops (assignment is a narrow map against broadcast centroids;
  * the centroid update is one groupBy over (cluster, dim)). The codebook is
  * tiny (k × dim doubles) and ships with the plan like an id-map broadcast.
  *
  * Search: probe the `nprobe` centroids nearest to each query, then exact
  * cosine only within the probed clusters — the corpus is scanned once with
  * a cluster-membership semi-filter instead of a full cross join. With
  * `nprobe == k` results equal brute force (test-asserted).
  */
object Ivf {

  final case class Model(centroids: Map[Int, Array[Double]]) extends Serializable

  /** Nearest-centroid assignment of every vector: (id, cluster). */
  def assign(emb: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model.centroids.toArray.sortBy(_._1))
    emb.select(col(idCol).cast("long"), col(vecCol).cast("array<double>")).as[(Long, Seq[Double])]
      .mapPartitions { iter =>
        val cents = bc.value
        iter.map { case (id, v) =>
          var best = -1; var bestSim = Double.NegativeInfinity
          for ((cid, c) <- cents) {
            val s = cosineStatic(c, v)
            if (s > bestSim) { bestSim = s; best = cid }
          }
          (id, best)
        }
      }.toDF(idCol, "cluster")
  }

  private def cosineStatic(a: Array[Double], b: Seq[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) { val x = a(i); val y = b(i); dot += x * y; na += x * x; nb += y * y; i += 1 }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  /** Train a k-centroid codebook: seed with the k lowest-id vectors
    * (deterministic), then `iters` Lloyd rounds of assign → per-dimension
    * mean. Means are computed via posexplode + groupBy (cluster, dim) —
    * partial aggregation keeps the shuffle at k × dim rows. */
  def train(emb: DataFrame, idCol: String, vecCol: String,
            k: Int, iters: Int = 2): Model = {
    val spark = emb.sparkSession
    import spark.implicits._
    val seedRows = emb.orderBy(col(idCol)).limit(k)
      .select(col(idCol), col(vecCol).cast("array<double>")).as[(Long, Seq[Double])]
      .collect()
    var model = Model(seedRows.zipWithIndex.map { case ((_, v), i) => i -> v.toArray }.toMap)
    val dim = seedRows.headOption.map(_._2.length).getOrElse(0)
    val meanAgg = new graft.vector.VectorMean(dim).toColumn
    for (_ <- 1 to iters) {
      val assigned = assign(emb, idCol, vecCol, model)
        .join(emb.select(col(idCol), col(vecCol).cast("array<double>").as("_v")), idCol)
      // single-pass typed aggregate: partial vector sums map-side, one
      // (cluster → dim doubles) row per group over the exchange
      val means = assigned.select(col("cluster"), col("_v")).as[(Int, Seq[Double])]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(meanAgg.name("centroid"))
        .collect()
      // keep stale centroids for clusters that emptied this round — the
      // codebook must stay at k entries (standard k-means behavior)
      model = Model(model.centroids ++ means.map { case (cid, c) => cid -> c.toArray }.toMap)
    }
    model
  }

  /** ANN search: queries (subset of the corpus by id) probe their `nprobe`
    * nearest clusters; exact cosine re-ranks within probed clusters only. */
  def search(emb: DataFrame, idCol: String, vecCol: String, model: Model,
             queryIds: Seq[Long], k: Int, nprobe: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val queries = emb.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>")).as[(Long, Seq[Double])]
      .collect()
    val probes: Seq[(Long, Int)] = queries.toSeq.flatMap { case (qid, qv) =>
      model.centroids.toSeq
        .map { case (cid, c) => (cid, cosineStatic(c, qv)) }
        .sortBy { case (cid, s) => (-s, cid) }
        .take(nprobe)
        .map { case (cid, _) => (qid, cid) }
    }
    val probeDf = probes.toDF("query_id", "cluster")
    val assigned = assign(emb, idCol, vecCol, model)
    val members = assigned.join(broadcast(probeDf), Seq("cluster"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"))
    val qVecs = emb.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
    val rescored = members
      .join(emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("_nv")), "neighbor_id")
      .join(broadcast(qVecs), "query_id")
      .withColumn("sim", VectorOps.cosine(col("_nv"), col("_qv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    rescored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }
}

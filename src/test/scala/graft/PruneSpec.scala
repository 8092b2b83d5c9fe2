package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Ivf, Prune}

class PruneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // two well-separated blobs on orthogonal axes: ids 0-9 hug (1, 0, ...)
  // with growing off-axis noise, ids 10-19 hug (0, 1, ...) likewise —
  // so within each blob, LOWER id = closer to the blob center
  private lazy val emb = (0L until 20L).map { i =>
    val off = (i % 10).toFloat / 20f
    val v = if (i < 10) Seq(1f, off, 0f, 0f) else Seq(off, 1f, 0f, 0f)
    (i, v ++ Seq.fill(4)(0f))
  }.toDF("vec_id", "embedding")

  test("assignWithSim matches assign's clusters and adds the winning similarity") {
    val model = Ivf.train(emb, "vec_id", "embedding", k = 2, iters = 2)
    val plain = Ivf.assign(emb, "vec_id", "embedding", model)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val withSim = Prune.assignWithSim(emb, "vec_id", "embedding", model)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(withSim.map(t => t._1 -> t._2).toMap == plain)
    assert(withSim.forall(t => t._3 > 0.0 && t._3 <= 1.0 + 1e-12))
  }

  test("oodCard: a planted far-tail vector is its cell's only OOD; clean cells read zero") {
    // the two blobs plus one genuinely lost vector: between the blobs AND
    // carrying an off-plane component no centroid has — it wins SOME cell
    // but at a cosine far below the blob members'
    val lost = Seq((99L, Seq(0.6f, 0.6f, 0.5f, 0f) ++ Seq.fill(4)(0f)))
      .toDF("vec_id", "embedding")
    val corpus = emb.unionByName(lost)
    val out = Prune.oodCard(corpus, "vec_id", "embedding", k = 2, iters = 2,
        oodBp = 8500L)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.map(_._3).sum == 1L, s"exactly the lost vector flags, got $out")
    val oodCell = out.find(_._3 == 1L).get
    assert(oodCell._4 < 8500L && oodCell._5 == 10000L * 1 / oodCell._2)
    assert(out.filter(_._3 == 0L).forall(_._4 >= 8500L),
      "clean cells' minimum winning sim sits above the gate")
  }

  test("prototypes drops the ceil-quota MOST prototypical per cell, keeps the diverse tail") {
    val out = Prune.prototypes(emb, "vec_id", "embedding", k = 2, iters = 2, dropBp = 2500)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.length == 20, "every vector appears with a verdict")
    out.groupBy(_._1).foreach { case (cell, rows) =>
      val n = rows.length
      assert(rows.forall(_._3 == n), s"n_cell must equal the cell size in cell $cell")
      assert(rows.map(_._4).sorted.toSeq == (1L to n).toSeq, s"ranks contiguous in cell $cell")
      val dropped = rows.filter(_._5 == 1L)
      assert(dropped.length == (n * 2500 + 9999) / 10000, s"ceil quota in cell $cell")
      // the dropped set is exactly the best-ranked (most prototypical) prefix
      assert(dropped.map(_._4).sorted.toSeq == (1L to dropped.length).toSeq)
    }
    // the rank must BE the similarity order: recompute (cluster, sim) with
    // the same trained model and check rank 1 is each cell's max-sim member
    // (centroids are cluster MEANS, so "most prototypical" is the member
    // nearest the mean — not necessarily the axis vector)
    val model = Ivf.train(emb, "vec_id", "embedding", k = 2, iters = 2)
    val sims = Prune.assignWithSim(emb, "vec_id", "embedding", model)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    sims.groupBy(_._2).foreach { case (cell, rows) =>
      val bySim = rows.sortBy(t => (-t._3, t._1)).map(_._1)
      val byRank = out.filter(_._1 == cell).sortBy(_._4).map(_._2)
      assert(byRank.toSeq == bySim.toSeq, s"rank order must be sim order in cell $cell")
    }
  }

  test("dropBp=0 drops nothing; dropBp=10000 drops everything") {
    val none = Prune.prototypes(emb, "vec_id", "embedding", k = 2, iters = 1, dropBp = 0)
    assert(none.filter(col("dropped") === 1L).count() == 0)
    val all = Prune.prototypes(emb, "vec_id", "embedding", k = 2, iters = 1, dropBp = 10000)
    assert(all.filter(col("dropped") === 0L).count() == 0)
  }
}

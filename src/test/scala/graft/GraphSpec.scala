package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Scale = 1000000000L

  /** Independent driver-side replay of the exact-integer iteration — the
    * oracle the distributed plan must match digit for digit. */
  private def refPageRank(nodes: Seq[Long], edges: Seq[(Long, Long)],
                          iters: Int, scale: Long = Scale): Map[Long, Long] = {
    val e = edges.filter(p => p._1 != p._2).distinct
    val odeg = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n = nodes.size.toLong
    var pr = nodes.map(v => v -> scale / n).toMap
    for (_ <- 1 to iters) {
      val contribs = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(ed => pr(ed._1) / odeg(ed._1)).sum
      }
      val dmass = nodes.filterNot(odeg.contains).map(pr).sum
      pr = nodes.map(v => v ->
        ((15 * scale / 100) / n + (85 * (contribs.getOrElse(v, 0L) + dmass / n)) / 100)).toMap
    }
    pr
  }

  private def runPr(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRank(nodes.toDF("node"), edges.toDF("src", "dst"), iters = iters)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("pr_nano")).toMap

  test("pageRank: a 2-cycle is an exact fixed point at scale/2") {
    val pr = runPr(Seq(0L, 1L), Seq((0L, 1L), (1L, 0L)), iters = 3)
    assert(pr == Map(0L -> Scale / 2, 1L -> Scale / 2))
  }

  test("pageRank: dangling mass redistributes uniformly (hand-computed)") {
    // A→B, B dangling. After 1 iter: A = 75e6 + 85%·(0 + 250e6),
    // B = 75e6 + 85%·(500e6 + 250e6) — exact integers, mass preserved.
    val pr = runPr(Seq(0L, 1L), Seq((0L, 1L)), iters = 1)
    assert(pr == Map(0L -> 287500000L, 1L -> 712500000L))
    assert(pr.values.sum == Scale)
  }

  test("pageRank: equals the independent driver-side fold on a mixed graph") {
    // hub (4 in-links), a chain, a dangling sink, duplicate + self-loop
    // edges that must be dropped
    val nodes = (0L to 6L).toSeq
    val edges = Seq((0L, 4L), (1L, 4L), (2L, 4L), (3L, 4L), (4L, 5L), (5L, 6L),
      (1L, 2L), (2L, 3L), (1L, 2L), (3L, 3L))
    for (k <- Seq(1, 3)) {
      assert(runPr(nodes, edges, k) == refPageRank(nodes, edges, k),
        s"divergence from the reference fold at iters=$k")
    }
  }

  test("pageRank: out_degree column counts distinct non-loop out-edges") {
    val out = Graph.pageRank(Seq(0L, 1L, 2L).toDF("node"),
        Seq((0L, 1L), (0L, 2L), (0L, 1L), (1L, 1L)).toDF("src", "dst"), iters = 1)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("out_degree")).toMap
    assert(out == Map(0L -> 2L, 1L -> 0L, 2L -> 0L))
  }

  test("personalizedPageRank: teleport and dangling mass land on seeds only; unreachable = 0") {
    // 2-cycle {0,1} with seed 0, plus isolated node 2. After 2 iters:
    // pr(0) = 150e6 + 85%·722.5e6... hand-folded below; node 2 exactly 0.
    val out = Graph.personalizedPageRank(
        Seq(0L, 1L, 2L).toDF("node"),
        Seq((0L, 1L), (1L, 0L)).toDF("src", "dst"),
        Seq(0L).toDF("node"), iters = 2)
      .collect().map(r => r.getLong(0) -> ((r.getAs[Long]("is_seed"), r.getAs[Long]("pr_nano")))).toMap
    assert(out == Map(0L -> ((1L, 872500000L)), 1L -> ((0L, 127500000L)), 2L -> ((0L, 0L))))
  }

  test("personalizedPageRank: dangling mass re-teleports to the seed set") {
    // 0→1 with 1 dangling: after iter 2 the mass parked on 1 flows back
    // to seed 0 through the dangling term, not uniformly
    val out = Graph.personalizedPageRank(
        Seq(0L, 1L).toDF("node"), Seq((0L, 1L)).toDF("src", "dst"),
        Seq(0L).toDF("node"), iters = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("pr_nano")).toMap
    assert(out == Map(0L -> 872500000L, 1L -> 127500000L))
  }

  test("degreeHistogram: log2 buckets, bit-exact, share in bp") {
    val edges = Seq((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L), (5L, 6L))
    val got = Graph.degreeHistogram(edges.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_nodes"), r.getAs[Long]("min_deg"),
        r.getAs[Long]("max_deg"), r.getAs[Long]("share_bp")))).toMap
    // six degree-1 nodes in bucket 0, the hub (deg 4) alone in bucket 2
    assert(got == Map(0L -> ((6L, 1L, 1L, 8571L)), 2L -> ((1L, 4L, 4L, 1428L))))
  }

  test("incremental legs: maintained state + delta batch equals the from-scratch replay; re-crawled links are idempotent") {
    // base graph, then a frontier batch that RE-DELIVERS two base edges
    // (a re-crawl) plus genuinely new ones — the anti-join must absorb
    // the repeats, the additive merges must land the rest exactly.
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L), (9L, 1L), (9L, 2L), (5L, 6L))
    val delta = Seq((2L, 3L), (5L, 6L), (9L, 3L), (9L, 4L), (7L, 1L), (7L, 7L))
    val all = base ++ delta
    val allNodes = all.flatMap(p => Seq(p._1, p._2)).distinct.map(Tuple1(_)).toDF("node")
    // degree leg
    val und = Graph.canonicalUndirected(base.toDF("src", "dst")).localCheckpoint()
    val deg = Graph.degreesOf(und)
    val fresh = Graph.newUndirectedEdges(und, delta.toDF("src", "dst"))
    assert(fresh.count() == 3, "re-crawled (2,3) and (5,6) and the self-loop (7,7) must not survive")
    val incHist = Graph.histogramOfDegrees(Graph.mergeDegrees(deg, Graph.degreesOf(fresh)))
      .collect().map(_.toSeq).toSet
    val fullHist = Graph.degreeHistogram(all.toDF("src", "dst")).collect().map(_.toSeq).toSet
    assert(incHist == fullHist)
    // pagerank leg
    val e = Graph.canonicalDirected(base.toDF("src", "dst")).localCheckpoint()
    val freshE = Graph.newDirectedEdges(e, delta.toDF("src", "dst")).localCheckpoint()
    val odegAll = Graph.mergeOutDegrees(Graph.outDegreesOf(e), Graph.outDegreesOf(freshE))
    val incPr = Graph.pageRankOnState(allNodes, e.unionByName(freshE), odegAll, iters = 3)
      .collect().map(_.toSeq).toSet
    val fullPr = Graph.pageRank(allNodes, all.toDF("src", "dst"), iters = 3)
      .collect().map(_.toSeq).toSet
    assert(incPr == fullPr)
  }

  test("incremental triangles: delta wedge-closure equals the from-scratch count; multi-fresh-edge triangles count once") {
    // K4 assembled across the boundary: base holds a path + one triangle,
    // the delta closes MANY triangles including ones with 2 and 3 fresh
    // edges (the designated-counter cases), re-delivers a base edge and
    // throws in a self-loop.
    val base = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L))
    val delta = Seq((1L, 3L), (2L, 4L), (1L, 4L), (2L, 3L), (5L, 5L), (20L, 21L))
    val all = base ++ delta
    def fullState(edges: Seq[(Long, Long)]) =
      Graph.triangleCounts(edges.toDF("src", "dst")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val und = Graph.canonicalUndirected(base.toDF("src", "dst")).localCheckpoint()
    val deg = Graph.degreesOf(und).localCheckpoint()
    val tri = Graph.triangleStateOf(und, deg)
    val fresh = Graph.newUndirectedEdges(und, delta.toDF("src", "dst")).localCheckpoint()
    val degAll = Graph.mergeDegrees(deg, Graph.degreesOf(fresh)).localCheckpoint()
    val triAll = Graph.mergeTriangles(tri, Graph.newTriangleCounts(und, fresh, degAll))
    val inc = Graph.triangleOutput(degAll, triAll).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(inc == fullState(all))
    // sanity on the hand-checkable part: {1,2,3,4} is K4 after the delta
    // (1-2,2-3,3-4 base; 1-3,2-4,1-4 delta) — every node in 3 triangles
    val k4 = inc.filter(t => Set(1L, 2L, 3L, 4L)(t._1))
    assert(k4.forall(t => t._3 == 3L && t._2 == 3L))
  }

  private def runTri(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] =
    Graph.triangleCounts(edges.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("degree"),
        r.getAs[Long]("n_triangles"), r.getAs[Long]("clustering_bp")))).toMap

  test("triangleCounts: K3 plus a pendant — counts and coefficients by hand") {
    val got = runTri(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert(got == Map(
      1L -> ((2L, 1L, 10000L)),
      2L -> ((2L, 1L, 10000L)),
      3L -> ((3L, 1L, 3333L)), // 2·1·10000 div (3·2)
      4L -> ((1L, 0L, 0L))))
  }

  test("triangleCounts: C4 has none, K4 has every node in three") {
    val c4 = runTri(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)))
    assert(c4.values.forall { case (d, t, c) => d == 2L && t == 0L && c == 0L })
    val k4 = runTri(for { i <- 0L to 3L; j <- (i + 1) to 3L } yield (i, j))
    assert(k4.values.forall { case (d, t, c) => d == 3L && t == 3L && c == 10000L })
  }

  test("triangleCounts: direction, duplicates and self-loops are irrelevant") {
    val canonical = runTri(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    val messy = runTri(Seq((2L, 1L), (1L, 2L), (3L, 2L), (1L, 3L), (3L, 1L), (2L, 2L)))
    assert(canonical == messy)
  }

  private def runLpa(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.labelPropagation(nodes.toDF("node"), edges.toDF("src", "dst"), iters = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("labelPropagation: two triangles joined by one bridge split into two communities") {
    // K3 {1,2,3} — bridge 3–4 — K3 {4,5,6}: LPA must keep the two dense
    // cores apart even though the graph is ONE connected component
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (4L, 6L))
    val lbl = runLpa(1L to 6L, edges, iters = 4)
    assert(lbl(1L) == lbl(2L) && lbl(2L) == lbl(3L), "left triangle is one community")
    assert(lbl(4L) == lbl(5L) && lbl(5L) == lbl(6L), "right triangle is one community")
    assert(lbl(1L) != lbl(4L), "the bridge must not merge the cores")
  }

  test("labelPropagation: min-label ties, synchronous schedule, isolated node keeps its label") {
    // path 1–2: after round 1 both adopt the other's label SIMULTANEOUSLY
    // (1→2, 2→1); round 2 swaps back — the synchronous 2-cycle, pinned so
    // an accidental async rewrite shows up as a failure here
    assert(runLpa(Seq(1L, 2L), Seq((1L, 2L)), iters = 1) == Map(1L -> 2L, 2L -> 1L))
    assert(runLpa(Seq(1L, 2L), Seq((1L, 2L)), iters = 2) == Map(1L -> 1L, 2L -> 2L))
    // star 1..4 around 5: neighbors of 5 all tie at count 1 → min label 1
    val star = runLpa(1L to 5L, Seq((5L, 1L), (5L, 2L), (5L, 3L), (5L, 4L)), iters = 1)
    assert(star(5L) == 1L, "tie breaks to the smallest label")
    // isolated node 9 never changes
    assert(runLpa(Seq(1L, 2L, 9L), Seq((1L, 2L)), iters = 3)(9L) == 9L)
  }

  test("labelPropagation: community_size counts the final label partition") {
    val out = Graph.labelPropagation((1L to 6L).toDF("node"),
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (4L, 6L)).toDF("src", "dst"),
      iters = 4).collect()
    val byLabel = out.groupBy(_.getLong(1))
    byLabel.foreach { case (_, rows) =>
      assert(rows.forall(_.getAs[Long]("community_size") == rows.length.toLong))
    }
  }
}

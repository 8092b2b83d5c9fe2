package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Components

class ComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chains, cliques, and separate components resolve to min labels") {
    // chain 1-2-3-4, clique {10,11,12}, pair {20,21}
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("edge orientation, duplicates, self-loops, and nulls don't matter") {
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 3L)).toDF("a", "b")
      .unionByName(Seq((Option.empty[Long], Some(9L)), (Some(9L), Option.empty[Long]))
        .toDF("a", "b"))
    val got = Components.connectedComponents(messy, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 9 only appears on null edges → dropped entirely; 3's self-loop alone
    // would drop it too, but 2-3 keeps it
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("a long path converges (diameter rounds) and matches") {
    val path = (1L until 12L).map(i => (i, i + 1))
    assert(cc(path) == (1L to 12L).map(_ -> 1L).toMap)
  }

  test("empty edge list yields empty labeling, no crash") {
    assert(cc(Seq.empty) == Map.empty)
  }

  test("distributed pointer-jumping path agrees with the driver union-find path") {
    // chains + cliques + randomish cross links, forced down BOTH code paths
    val edges = ((1L until 40L).map(i => (i, i + 1)) ++
      Seq((100L, 141L), (141L, 103L), (100L, 103L), (200L, 201L), (7L, 141L))).toDF("a", "b")
    def run(threshold: Long) =
      Components.connectedComponents(edges, "a", "b", localEdgeThreshold = threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = run(Long.MaxValue)
    val dist = run(0L)
    assert(local == dist)
    assert(local(141L) == 1L && local(201L) == 200L)
  }

  test("crossover threshold resolves through the session conf when the arg is defaulted") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    def labels = Components.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L)
    spark.conf.set(Components.LocalEdgeThresholdConf, "0") // forces the distributed path
    try assert(labels == expected)
    finally spark.conf.unset(Components.LocalEdgeThresholdConf)
    assert(labels == expected) // conf unset -> default local path, same answer
  }

  test("union-find capacity: oversized threshold overrides clamp to 2^29, never hang the driver") {
    // VERDICT r16 task 3: the driver union-find table caps at 2^30 slots;
    // past 2^29 symmetrized entries the probe load would exceed 50% and a
    // full table spins idx() forever — a HANG, so the crossover must be
    // un-raisable past the safe ceiling through EVERY resolution route.
    assert(Components.resolveEdgeThreshold(spark, Long.MaxValue) == (1L << 29))
    assert(Components.resolveEdgeThreshold(spark, (1L << 29) + 1L) == (1L << 29))
    assert(Components.resolveEdgeThreshold(spark, 42L) == 42L)
    spark.conf.set(Components.LocalEdgeThresholdConf, Long.MaxValue.toString)
    try {
      assert(Components.resolveEdgeThreshold(spark, -1L) == (1L << 29))
      // and end-to-end: an absurd conf override still answers correctly
      // (falls to the local path for this tiny graph — threshold is
      // clamped, not rejected — rather than hanging or erroring)
      val got = cc(Seq((1L, 2L), (2L, 3L)))
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    } finally spark.conf.unset(Components.LocalEdgeThresholdConf)
    assert(Components.resolveEdgeThreshold(spark, -1L) == Components.LocalEdgeThreshold)
  }

  test("clusterDocuments labels singletons, sizes clusters, keeps one canonical per cluster") {
    val docs = (1L to 6L).map(Tuple1(_)).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 5L)).toDF("doc_a", "doc_b")
    val out = Components.clusterDocuments(docs, "doc_id", pairs, "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(_._1)
    assert(out.toList == List(
      (1L, 1L, 3L, 1), (2L, 1L, 3L, 0), (3L, 3L, 1L, 1),
      (4L, 4L, 1L, 1), (5L, 1L, 3L, 0), (6L, 6L, 1L, 1)))
    val canonPerCluster = out.groupBy(_._2).map { case (_, rs) => rs.count(_._4 == 1) }
    assert(canonPerCluster.forall(_ == 1), "exactly one canonical per cluster")
  }

  test("clusterSizeHistogram: sizes, cluster counts and corpus shares, hand-computed") {
    // 6 docs: one 3-cluster {1,2,5}, three singletons {3} {4} {6}
    val docs = (1L to 6L).map(Tuple1(_)).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 5L)).toDF("doc_a", "doc_b")
    val clustered = Components.clusterDocuments(docs, "doc_id", pairs, "doc_a", "doc_b")
    val out = Components.clusterSizeHistogram(clustered)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      1L -> ((3L, 3L, 5000L)), // 3 singletons: 3 docs of 6 = 5000 bp
      3L -> ((1L, 3L, 5000L))))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 90% of fact rows share one hot key — the shape that stalls a plain
  // hash join at scale
  private lazy val facts = (0 until 2000).map { i =>
    (if (i % 10 == 0) s"key$i" else "HOT", s"payload$i")
  }.toDF("k", "payload")
  private lazy val dims = (Seq("HOT") ++ (0 until 2000 by 10).map(i => s"key$i"))
    .map(k => (k, s"dim_$k")).toDF("k", "label")

  test("salted inner join equals the plain join exactly") {
    val plain = facts.join(dims, Seq("k"), "inner")
      .select("k", "payload", "label").collect().toSet
    val salted = Skew.saltedJoin(facts, dims, "k", saltFactor = 8)
      .select("k", "payload", "label").collect().toSet
    assert(salted == plain)
    assert(plain.size == 2000)
  }

  test("salted left join preserves unmatched facts") {
    val extra = facts.unionByName(Seq(("NO_DIM", "orphan")).toDF("k", "payload"))
    val plain = extra.join(dims, Seq("k"), "left")
      .select("k", "payload", "label").collect().toSet
    val salted = Skew.saltedJoin(extra, dims, "k", saltFactor = 8, joinType = "left")
      .select("k", "payload", "label").collect().toSet
    assert(salted == plain)
    assert(plain.exists { r => r.getString(0) == "NO_DIM" })
  }

  test("salt spreads the hot key across sub-keys") {
    val salts = facts.filter(col("k") === "HOT")
      .withColumn("_salt", pmod(xxhash64(struct(facts.columns.map(col).toIndexedSeq: _*)), lit(8)))
      .select("_salt").distinct().count()
    assert(salts > 1, "hot key must not land on a single salted sub-key")
  }

  test("AQE splits a hot simhash band at runtime (the claimed 100x-scale escape hatch)") {
    // 300 identical docs collapse every band to ONE key — the degenerate
    // bucket shape. With skew thresholds scaled down to fixture size, AQE
    // must recognize the hot partition in the band self-join and split it;
    // at production thresholds the same plan handles a hot band without a
    // recompile, which is what ops/Dedup.scala's simhashCandidates doc
    // promises.
    val hot = (0L until 300L).map(i =>
      (i, "identical boilerplate license header repeated verbatim on every page of the crawl"))
    val cold = (1000L until 1050L).map(i => (i, s"unique document number $i about topic ${i % 7} entirely"))
    val df = (hot ++ cold).toDF("doc_id", "text")
    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
      "spark.sql.adaptive.coalescePartitions.enabled" ->
        spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // Int.MaxValue = the deliberately UNCAPPED path: this test is about
      // AQE rescuing a hot band that slipped past (or opted out of) the
      // DefaultMaxBucket pre-filter — the second line of defense
      val pairs = graft.ops.Dedup.simhashCandidates(df, "doc_id", "text",
        maxBucket = Int.MaxValue)
      // collect() (not count()) so the inspected QueryExecution is the one
      // that ran — count() would execute a different aggregate plan
      val n = pairs.collect().length
      assert(n >= 300 * 299 / 2, s"hot band must still yield all its pairs, got $n")
      // inspect the plan TREE, not its string form (formatting and the
      // "skew=true" marker are not API): collect every AQEShuffleReadExec —
      // descending through AdaptiveSparkPlanExec leaves, whose executed
      // subtree is not a child — and ask the reads themselves whether any
      // partition was skew-split (hasSkewedPartition = a
      // PartialReducerPartitionSpec is present)
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec, QueryStageExec}
      def skewReads(p: SparkPlan): Seq[AQEShuffleReadExec] = p.collect {
        case a: AdaptiveSparkPlanExec => skewReads(a.executedPlan)
        case s: QueryStageExec => skewReads(s.plan)
        case r: AQEShuffleReadExec if r.hasSkewedPartition => Seq(r)
      }.flatten
      assert(skewReads(pairs.queryExecution.executedPlan).nonEmpty,
        s"expected AQE to skew-split the band join's shuffle read, final plan:\n" +
          pairs.queryExecution.executedPlan)
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val ids = (0L until 20000L).map(i => Tuple1(i)).toDF("id")

  test("split fractions land near 90/5/5 and cover every row exactly once") {
    val out = Sampling.hashSplit(ids, "id")
    assert(out.count() == 20000)
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(math.abs(counts("train") / 20000.0 - 0.90) < 0.01)
    assert(math.abs(counts("val") / 20000.0 - 0.05) < 0.01)
    assert(math.abs(counts("test") / 20000.0 - 0.05) < 0.01)
  }

  test("assignments are stable under repartitioning and corpus growth") {
    val a = Sampling.hashSplit(ids, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.hashSplit(ids.repartition(13), "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "partitioning must not move split assignments")
    val grown = (0L until 40000L).map(i => Tuple1(i)).toDF("id")
    val c = Sampling.hashSplit(grown, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ids.collect().forall(r => a(r.getLong(0)) == c(r.getLong(0))),
      "doubling the corpus must not reassign existing rows")
  }

  test("hashSample keeps a stable nested subset") {
    val s10 = Sampling.hashSample(ids, "id", 1000).collect().map(_.getLong(0)).toSet
    val s20 = Sampling.hashSample(ids, "id", 2000).collect().map(_.getLong(0)).toSet
    assert(s10.subsetOf(s20), "smaller sample is nested in the larger one")
    assert(math.abs(s10.size / 20000.0 - 0.10) < 0.01)
  }

  test("null keys bucket deterministically and identically in split and sample") {
    val withNull = Seq(Some(1L), None, Some(2L), None).map(Tuple1(_)).toDF("id")
    val split = Sampling.hashSplit(withNull, "id")
    assert(split.count() == 4, "hashSplit must keep every row, null keys included")
    val nullSplits = split.filter(col("id").isNull).select("split")
      .collect().map(_.getString(0)).toSet
    assert(nullSplits.size == 1, "all null keys share one deterministic bucket")
    // the empty-string sentinel: null and '' land in the SAME bucket, so
    // sample keep/drop agrees with split membership for null keys
    val emptyBucket = Sampling.hashSplit(Seq(Tuple1("")).toDF("id"), "id")
      .head.getAs[String]("split")
    assert(nullSplits.head == emptyBucket)
    val sampledAll = Sampling.hashSample(withNull, "id", 10000).count()
    assert(sampledAll == 4, "keepBp=10000 must keep null-key rows too")
  }

  test("capPerKey enforces the quota deterministically by hash order") {
    val df = (0L until 1000L).map(i => (s"src${i % 3}", i)).toDF("src", "id")
    val capped = graft.ops.Sampling.capPerKey(df, "src", "id", 50)
    val counts = capped.groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.size == 3, "every source must survive the cap (guards vacuous pass)")
    assert(counts.values.forall(_ == 50L))
    val again = graft.ops.Sampling.capPerKey(df.repartition(7), "src", "id", 50)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == capped.select("id").collect().map(_.getLong(0)).toSet,
      "survivor set must not depend on partitioning")
  }

  test("hashSampleStratified keeps per-stratum fractions, nested and agreeing with hashSample") {
    val df = (0L until 9000L).map(i => (s"s${i % 3}", i)).toDF("src", "id")
    val out = Sampling.hashSampleStratified(df, "src", "id",
      Map("s0" -> 10000, "s1" -> 2000), defaultBp = 500)
    val counts = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("s0") == 3000L, "bp=10000 keeps the whole stratum")
    assert(math.abs(counts("s1") / 3000.0 - 0.20) < 0.03)
    assert(math.abs(counts.getOrElse("s2", 0L) / 3000.0 - 0.05) < 0.02)
    // within a stratum the decision is the same row-hash as hashSample
    val plain = Sampling.hashSample(df.filter(col("src") === "s1"), "id", 2000)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out.filter(col("src") === "s1").select("id").collect()
      .map(_.getLong(0)).toSet == plain)
  }

  test("temperature mixing flattens the source distribution toward sqrt weights") {
    // sources with 8000 / 2000 / 500 rows; τ=0.5 at a 50% budget
    val df = ((0L until 8000L).map(i => (i, "big")) ++
      (8000L until 10000L).map(i => (i, "mid")) ++
      (10000L until 10500L).map(i => (i, "small"))).toDF("id", "src")
    val out = Sampling.temperatureMix(df, "src", "id", totalKeepBp = 5000)
    val kept = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fBig = kept("big") / 8000.0
    val fMid = kept("mid") / 2000.0
    val fSmall = kept("small") / 500.0
    assert(fSmall > fMid && fMid > fBig, s"flattening should favor the tail: $kept")
    // expected keep fraction per stratum: K·w_s/(Σw·n_s) with w = sqrt(n)
    val ws = Map("big" -> math.sqrt(8000), "mid" -> math.sqrt(2000), "small" -> math.sqrt(500))
    val k = 0.5 * 10500
    for ((s, n) <- Seq(("big", 8000.0), ("mid", 2000.0), ("small", 500.0))) {
      val expect = math.min(1.0, k * ws(s) / (ws.values.sum * n))
      assert(math.abs(kept(s) / n - expect) < 0.03, s"$s: got ${kept(s) / n}, want ~$expect")
    }
    // total lands near the budget
    assert(math.abs(kept.values.sum / 10500.0 - 0.5) < 0.03)
    // nested within stratum: same row-hash rule as hashSample
    val sub = out.filter(col("src") === "mid").select("id").collect().map(_.getLong(0)).toSet
    val again = Sampling.temperatureMix(df, "src", "id", totalKeepBp = 5000)
      .filter(col("src") === "mid").select("id").collect().map(_.getLong(0)).toSet
    assert(sub == again, "deterministic across runs")
  }

  test("keepBpExpr stays exact at corpus scales where BIGINT products overflow") {
    // 2B-row corpus, 1.5B-row dominant stratum: the raw product
    // totalKeepBp·_totn·_wq ≈ 1e4 · 2e9 · 4.1e13 ≈ 8e26 is ~1e8× past
    // Long.MaxValue — the DECIMAL(38,0) path must agree with BigInt math
    val totn = 2000000000L
    val nBig = 1500000000L
    val nSmall = totn - nBig
    def wq(n: Long): BigInt = BigInt(math.floor(math.sqrt(n.toDouble) * 1048576.0).toLong)
    val sumw = (wq(nBig) + wq(nSmall)).toLong
    for ((n, w) <- Seq((nBig, wq(nBig).toLong), (nSmall, wq(nSmall).toLong))) {
      val row = Seq((totn, w, sumw, n)).toDF("_totn", "_wq", "_sumw", "_n")
      val got = row.select(Sampling.keepBpExpr(5000).as("bp")).head.getLong(0)
      val expect = (BigInt(5000) * totn * w / (BigInt(sumw) * n)).min(10000).toLong
      assert(got == expect, s"n=$n: decimal path gave $got, BigInt says $expect")
      assert(got > 0 && got <= 10000, s"n=$n: keep fraction out of range: $got")
    }
  }

  test("packOffsets assigns contiguous budget-sized sequences per group") {
    val chunks = Seq(
      ("g", 1L, 0, 600L), ("g", 1L, 1, 600L), ("g", 2L, 0, 600L),
      ("g", 3L, 0, 600L), ("h", 9L, 0, 100L)
    ).toDF("grp", "doc", "idx", "n_tokens")
    val out = graft.ops.Packing.packOffsets(chunks, "grp", Seq("doc", "idx"), "n_tokens", budget = 1000L)
      .orderBy("grp", "doc", "idx")
      .collect().map(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset"))).toList
    // cum_before: 0, 600, 1200, 1800 in g; 0 in h
    assert(out == List((0L, 0L), (0L, 600L), (1L, 200L), (1L, 800L), (0L, 0L)))
  }

  test("packGreedyNoSplit: fill/open/oversized semantics; matches a sequential local fold") {
    // crafted: [4,4,4]@10 → bins 0,0,1; an oversized 12 holds a bin alone
    val items = Seq(
      ("a", 1L, 4L), ("a", 2L, 4L), ("a", 3L, 4L),
      ("b", 1L, 12L), ("b", 2L, 3L))
      .toDF("grp", "ord", "cost")
    val out = graft.ops.Packing.packGreedyNoSplit(items, "grp", "ord", "cost", budget = 10L)
      .orderBy("grp", "ord")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    assert(out == List(
      ("a", 1L, 0L, 4L), ("a", 2L, 0L, 8L), ("a", 3L, 1L, 4L),
      ("b", 1L, 0L, 12L), ("b", 2L, 1L, 3L)))
    // property: distributed result == the sequential fold, per group
    val rng = new scala.util.Random(11)
    val rand = (0 until 200).map(i => (s"g${i % 5}", i.toLong, (rng.nextInt(900) + 50).toLong))
    val got = graft.ops.Packing.packGreedyNoSplit(
      rand.toDF("grp", "ord", "cost"), "grp", "ord", "cost", budget = 2048L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    rand.groupBy(_._1).foreach { case (g, items) =>
      var bin = 0L; var fill = 0L; var first = true
      items.sortBy(_._2).foreach { case (_, ord, cost) =>
        if (first) { fill = cost; first = false }
        else if (fill + cost > 2048L) { bin += 1; fill = cost }
        else fill += cost
        assert(got((g, ord)) == (bin, fill), s"mismatch at ($g, $ord)")
      }
    }
  }

  test("batchPlan: longest-first fill, per-batch pad accounting, hand-computed waste") {
    import graft.ops.Packing
    // one bucket (width 100): lengths 90,80,70,10 at batchSize 2 →
    // batches {90,80} pad 2·90=180 real 170, {70,10} pad 140 real 80
    val rows = Seq((1L, 90L), (2L, 80L), (3L, 70L), (4L, 10L)).toDF("doc_id", "w")
    val out = Packing.batchPlan(rows, "doc_id", "w", batchSize = 2, bucketWidth = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq((0L, 4L, 2L, 250L, 320L, 2187L)),
      "padded 180+140=320, waste floor(10000*70/320)=2187")
    // naive single-batch-order comparison: shuffled fill {90,10},{80,70}
    // would pad 2·90+2·80=340 — longest-first is strictly better here
  }

  test("shardPlan: manifest equals the sequential cumsum assignment; partition count is invisible") {
    import graft.ops.Packing
    // weights 30,70,50,60,40,90,10,50 at target 100:
    // starts 0,30,100,150,210,250,340,350 → shards 0,0,1,1,2,2,3,3
    val rows = Seq((1L, 30L), (2L, 70L), (3L, 50L), (4L, 60L),
      (5L, 40L), (6L, 90L), (7L, 10L), (8L, 50L)).toDF("doc_id", "w")
    val expect = Set(
      (0L, 2L, 100L, 10000L, 1L, 2L),
      (1L, 2L, 110L, 11000L, 3L, 4L),
      (2L, 2L, 130L, 13000L, 5L, 6L),
      (3L, 2L, 60L, 6000L, 7L, 8L))
    for (p <- Seq(1, 3, 8)) {
      val out = Packing.shardPlan(rows, "doc_id", "w", 100L, numPartitions = p)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet
      assert(out == expect, s"numPartitions=$p must not change the plan")
    }
  }

  test("shardPlan: a doc larger than the target still lands in exactly one shard") {
    import graft.ops.Packing
    val rows = Seq((1L, 250L), (2L, 30L)).toDF("doc_id", "w")
    val out = Packing.shardPlan(rows, "doc_id", "w", 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1 starts at 0 → shard 0 (fill 250, 2.5x over — honest greedy);
    // doc 2 starts at 250 → shard 2; shard 1 is simply empty
    assert(out == Set((0L, 1L, 250L), (2L, 1L, 30L)))
  }

  test("tokenBudgetPerKey admits a deterministic best-first PREFIX within budget") {
    val rows = Seq(
      ("a", 1L, 500L, 90L), ("a", 2L, 600L, 80L), ("a", 3L, 1000L, 70L), ("a", 4L, 100L, 60L),
      ("b", 5L, 3000L, 99L), ("b", 6L, 100L, 50L)
    ).toDF("source", "doc_id", "n_tokens", "quality_score")
    val kept = Sampling.tokenBudgetPerKey(rows, "source", "doc_id",
      "n_tokens", "quality_score", budget = 2000L)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cum_tokens"))).toMap
    // 'a': 500 → 1100 admitted; doc 3 crosses (2100) and the cut is a strict
    // PREFIX of the score order — doc 4 (cum 2200 including the dropped doc 3)
    // is also out, so admission never depends on what later docs would fit
    assert(kept == Map(1L -> 500L, 2L -> 1100L))
    // 'b': the best doc alone exceeds the budget → the key contributes nothing
    assert(!kept.contains(5L) && !kept.contains(6L))
  }

  test("concatSpans tiles every example exactly; per-doc spans sum to its token count") {
    import graft.ops.Packing
    val rows = Seq(
      ("a", 1L, 300L), ("a", 2L, 300L), ("a", 3L, 500L), ("a", 4L, 0L), ("a", 5L, 1200L),
      ("b", 6L, 512L), ("b", 7L, 1L)
    ).toDF("source", "doc_id", "n_tokens")
    val out = Packing.concatSpans(rows, "source", "doc_id", "n_tokens", ctx = 512L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // zero-token docs vanish
    assert(!out.exists(_._3 == 4L))
    // per-doc span lengths sum to the doc's token count
    val byDoc = out.groupBy(_._3).view.mapValues(_.map(_._5).sum).toMap
    assert(byDoc == Map(1L -> 300L, 2L -> 300L, 3L -> 500L, 5L -> 1200L, 6L -> 512L, 7L -> 1L))
    // every example except the group's last is tiled to exactly ctx tokens
    out.groupBy(t => (t._1, t._2)).foreach { case ((g, ex), spans) =>
      val lastEx = out.filter(_._1 == g).map(_._2).max
      val total = spans.map(_._5).sum
      if (ex < lastEx) assert(total == 512L, s"example ($g, $ex) must be full, got $total")
      else assert(total >= 1 && total <= 512L)
    }
    // a straddling doc's second span starts where the first ended
    val doc3 = out.filter(_._3 == 3L).sortBy(_._2)
    assert(doc3.map(s => (s._4, s._5)).toSeq == Seq((0L, 424L), (424L, 76L)),
      "doc 3 (offset 600, 500 tokens) splits 424/76 at the 1024 boundary")
  }

  test("epochRepeat: copy counts are full-epochs plus a seeded fractional bit, partition-invariant") {
    val docs = (0L until 2000L).map(i => (i, 23000L)).toDF("doc_id", "factor_bp")
    val out = Sampling.epochRepeat(docs, "doc_id", "factor_bp", seed = 23)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val counts = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(counts.values.forall(n => n == 2 || n == 3), "2.3 epochs -> 2 or 3 copies")
    val frac = counts.values.count(_ == 3).toDouble / counts.size
    assert(math.abs(frac - 0.3) < 0.04, s"fractional copies must track 0.3, got $frac")
    out.groupBy(_._1).values.foreach(c =>
      assert(c.map(_._2).sorted.toSeq == (0L until c.length).toSeq, "copy_idx contiguous from 0"))
    val re = Sampling.epochRepeat(docs.repartition(7), "doc_id", "factor_bp", seed = 23)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(re == out.sorted.toSeq, "copies are a pure function of (id, seed)")
    // a 0.0-fraction factor below one epoch can drop a row entirely
    val thin = Sampling.epochRepeat((0L until 100L).map(i => (i, 4000L)).toDF("doc_id", "factor_bp"),
      "doc_id", "factor_bp", seed = 23).collect()
    assert(thin.length > 20 && thin.length < 60, s"0.4 epochs keeps ~40%, got ${thin.length}")
    // a negative factor fails the job (Spark truncates div/% toward zero
    // where DuckDB floors, so the engines would silently diverge) — the
    // in-plan raise_error surfaces as a SparkException at action time
    val neg = Seq((0L, 23000L), (1L, -100L)).toDF("doc_id", "factor_bp")
    val e = intercept[Exception] {
      Sampling.epochRepeat(neg, "doc_id", "factor_bp", seed = 23).collect()
    }
    assert(e.getMessage.contains("non-negative"), s"must name the guard: ${e.getMessage}")
  }

  test("shardOrder: every row sharded once, positions contiguous per shard, seed-determined") {
    val small = (0L until 1000L).map(Tuple1(_)).toDF("id")
    val out = Sampling.shardOrder(small, "id", seed = 17, nShards = 8)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    assert(out.length == 1000, "every row appears exactly once")
    assert(out.map(_._2).distinct.sorted.toSeq == (0L until 8L))
    out.groupBy(_._2).foreach { case (sh, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $sh positions must be the contiguous 1..n")
    }
    // same seed → identical assignment regardless of input partitioning
    val re = Sampling.shardOrder(small.repartition(7), "id", seed = 17, nShards = 8)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    assert(re.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
    // a different seed is a different epoch: some in-shard order must move
    val other = Sampling.shardOrder(small, "id", seed = 18, nShards = 8)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    assert(other.sortBy(_._1).toSeq != out.sortBy(_._1).toSeq)
  }

  test("unimaxAllocations: hand-computed waterfill, both min() branches, exact budget drain") {
    // the sf0.01 language histogram, budget = corpus, cap 1.2 epochs
    val counts = Seq("en" -> 218L, "zh" -> 75L, "es" -> 73L, "de" -> 70L, "fr" -> 64L)
    val out = Sampling.unimaxAllocations(counts, budget = 500L, maxEpochsBp = 12000L)
    assert(out.map(_._1) == Seq("fr", "de", "es", "zh", "en"), "visit order is ascending size")
    assert(out.map(_._3) == Seq(76L, 84L, 87L, 90L, 163L))   // fr..zh cap-bound, en budget-bound
    assert(out.map(_._4) == Seq(11875L, 12000L, 11917L, 12000L, 7477L))
    assert(out.map(_._3).sum == 500L, "this instance drains the budget exactly")
    // budget-rich regime: everyone takes the epoch cap
    val rich = Sampling.unimaxAllocations(counts, budget = 100000L, maxEpochsBp = 12000L)
    assert(rich.forall { case (_, n, alloc, _) => alloc == n * 12000L / 10000L })
    // size ties break on the key so the schedule is a pure function of counts
    val tied = Sampling.unimaxAllocations(Seq("b" -> 10L, "a" -> 10L), 12L, 10000L)
    assert(tied.map(_._1) == Seq("a", "b") && tied.map(_._3) == Seq(6L, 6L))
    intercept[IllegalArgumentException](Sampling.unimaxAllocations(counts, -1L, 10000L))
  }

  test("mixUnimax: materialized copies track each key's allocation, schedule columns carried") {
    val rows = (0L until 300L).map(i =>
      (i, if (i < 200) "big" else "small")).toDF("id", "key")
    val out = Sampling.mixUnimax(rows, "id", "key", budget = 300L, maxEpochsBp = 20000L, seed = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // waterfill: small: min(100*2, 300/2=150) = 150? no — 100*20000/10000 = 200 > 150 → 150
    // then big: min(400, 150) = 150
    val byKey = out.groupBy(_._1)
    assert(byKey("small").head._3 == 150L && byKey("big").head._3 == 150L)
    // copies per key land within ±n of the allocation (floor(factor) or +1 per doc)
    byKey.foreach { case (_, g) =>
      val (n, alloc) = (g.head._2, g.head._3)
      assert(math.abs(g.length - alloc) <= n, s"copies ${g.length} too far from alloc $alloc")
    }
  }

  test("curriculum: value-banded phases, contiguous per-(phase,shard) positions, seed-pure") {
    val rows = (0L until 200L).map(i => (i, (i * 7) % 101)).toDF("id", "score")
    val out = Sampling.curriculum(rows, "id", "score", cuts = Seq(70L, 40L), seed = 23, nShards = 4)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("score"), r.getAs[Long]("phase"),
        r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    // phase is the value band, nothing else
    out.foreach { case (_, s, p, _, _) =>
      val expect = if (s >= 70) 1L else if (s >= 40) 2L else 3L
      assert(p == expect, s"score $s in phase $p")
    }
    // positions are the contiguous 1..n inside every (phase, shard)
    out.groupBy(t => (t._3, t._4)).foreach { case (k, g) =>
      assert(g.map(_._5).sorted.toSeq == (1L to g.length).toSeq, s"gap in $k")
    }
    // pure function of (corpus, cuts, seed): partitioning-invariant
    val re = Sampling.curriculum(rows.repartition(7), "id", "score", Seq(70L, 40L), 23, 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("phase"), r.getAs[Long]("pos")))
    assert(re.sortBy(_._1).toSeq ==
      out.map(t => (t._1, t._3, t._5)).sortBy(_._1).toSeq)
    // a different seed reorders WITHIN phases but never moves a phase
    val reseeded = Sampling.curriculum(rows, "id", "score", Seq(70L, 40L), 24, 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("phase"), r.getAs[Long]("pos")))
    assert(reseeded.sortBy(_._1).map(_._2).toSeq == out.sortBy(_._1).map(_._3).toSeq)
    assert(reseeded.sortBy(_._1).toSeq != out.map(t => (t._1, t._3, t._5)).sortBy(_._1).toSeq)
    // cuts must descend strictly
    intercept[IllegalArgumentException](
      Sampling.curriculum(rows, "id", "score", Seq(40L, 70L), 23, 4))
  }

  test("prioritySample: fixed size, heavy row included, unbiased-ish totals, stability") {
    val rows = (0L until 5000L).map(i => (i, 10L)).toDF("id", "w")
      .unionByName(Seq((999999L, 1000000L)).toDF("id", "w"))
    val out = Sampling.prioritySample(rows, "id", col("w"), k = 64).collect()
    assert(out.length == 64)
    assert(out.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 64L).toSeq)
    assert(out.exists(_.getAs[Long]("id") == 999999L),
      "the dominant-weight row must be sampled")
    // sum of est_w over the sample estimates the true total (DLT):
    // 5000·10 + 1e6 = 1,050,000; k=64 → relative σ ≈ 1/√(k−1) ≈ 13%
    val est = out.map(_.getAs[Long]("est_w")).sum
    assert(math.abs(est - 1050000.0) / 1050000.0 < 0.40,
      s"subset-sum estimate $est too far from 1,050,000")
    // pure function of (corpus, k, seed)
    val re = Sampling.prioritySample(rows.repartition(11), "id", col("w"), k = 64)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("id"))).sorted.toSeq
    assert(re == out.map(r => (r.getAs[Long]("rank"), r.getAs[Long]("id"))).sorted.toSeq)
  }

  test("prioritySample: corpus smaller than k returns all rows at est_w = w") {
    val rows = (0L until 10L).map(i => (i, 5L + i)).toDF("id", "w")
    val out = Sampling.prioritySample(rows, "id", col("w"), k = 64)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("w"), r.getAs[Long]("est_w")))
    assert(out.length == 10)
    assert(out.forall { case (_, w, e) => e == w }, "tau is 0 when nothing is excluded")
  }

  test("rendezvousShard: in-range, pure, and growth moves rows ONLY to the new shard") {
    val rows = (0L until 10000L).map(Tuple1(_)).toDF("id")
    val assigned = rows
      .withColumn("s16", Sampling.rendezvousShard(col("id"), 16))
      .withColumn("s17", Sampling.rendezvousShard(col("id"), 17))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(assigned.forall { case (_, a, b) => a >= 0 && a < 16 && b >= 0 && b < 17 })
    // THE rendezvous property: a row either stays put or moves to the
    // brand-new shard 16 — nothing reshuffles between old shards
    assert(assigned.forall { case (_, a, b) => b == a || b == 16L },
      "growth must only move rows to the new shard")
    val moved = assigned.count { case (_, a, b) => a != b }
    assert(math.abs(moved / 10000.0 - 1.0 / 17) < 0.01,
      s"expected ~1/17 of rows to move, got $moved/10000")
    // pure function of (id, n): partitioning-invariant
    val re = rows.repartition(7).withColumn("s16", Sampling.rendezvousShard(col("id"), 16))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assigned.forall { case (id, a, _) => re(id) == a })
    intercept[IllegalArgumentException](Sampling.rendezvousShard(col("id"), 2000))
  }

  test("prioritySample rejects non-positive and over-domain weights in-plan") {
    val bad = Seq((1L, 0L)).toDF("id", "w")
    val e = intercept[Exception](
      Sampling.prioritySample(bad, "id", col("w"), k = 4).collect())
    assert(e.getMessage != null)
    val big = Seq((1L, (1L << 20) + 1L)).toDF("id", "w")
    intercept[Exception](
      Sampling.prioritySample(big, "id", col("w"), k = 4).collect())
  }

  test("uniformSample: fixed size, partition-invariant, and growth only EVICTS the max") {
    val base = (1L to 500L).map(Tuple1(_)).toDF("id")
    def ids(df: org.apache.spark.sql.DataFrame, k: Int) =
      Sampling.uniformSample(df, "id", k).collect().map(_.getLong(1)).toSet
    val s10 = ids(base, 10)
    assert(s10.size == 10)
    assert(ids(base.repartition(13), 10) == s10, "membership must be order/partition-free")
    // mergeability/stability: growing the corpus can only REPLACE current
    // members with lower-hash newcomers, never reshuffle survivors —
    // the grown sample is a subset of (old sample ∪ new rows)
    val grown = base.union((501L to 1000L).map(Tuple1(_)).toDF("id"))
    val g10 = ids(grown, 10)
    assert(g10.size == 10)
    assert(g10.subsetOf(s10 ++ (501L to 1000L)),
      "growth must not admit an old row that was previously evicted")
    // nested-k: the k=5 sample is exactly the first 5 of the k=10 ranking
    val r10 = Sampling.uniformSample(base, "id", 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val r5 = Sampling.uniformSample(base, "id", 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(r10.take(5).toSeq == r5.toSeq)
    // corpus smaller than k: everything sampled, ranks contiguous
    val tiny = Sampling.uniformSample((1L to 3L).map(Tuple1(_)).toDF("id"), "id", 10)
      .collect().map(_.getLong(0)).toSeq
    assert(tiny == Seq(1L, 2L, 3L))
  }
}

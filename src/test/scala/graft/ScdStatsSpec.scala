package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Scd, Stats}

class ScdStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("scd2 history compresses no-ops, closes intervals, flags the open one") {
    val snaps = Seq(
      (1L, "en", 1), (1L, "EN", 2), (1L, "EN", 3), (1L, "en", 4), // change, no-op, change-back
      (2L, "de", 1),                                              // never changes
      (3L, "fr", 2), (3L, "fr", 5)                                // late first version, no-op
    ).toDF("id", "lang", "version")
    val got = Scd.history(snaps, Seq("id"), "version", Seq("lang"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        Option(r.get(3)).map(_.asInstanceOf[Int]), r.getInt(4)))
      .sortBy(t => (t._1, t._3)).toList
    assert(got == List(
      (1L, "en", 1, Some(2), 0), (1L, "EN", 2, Some(4), 0), (1L, "en", 4, None, 1),
      (2L, "de", 1, None, 1),
      (3L, "fr", 2, None, 1)))
  }

  test("scd2 null attributes compare null-safe (no phantom changes)") {
    val snaps = Seq((1L, Option.empty[String], 1), (1L, Option.empty[String], 2),
      (1L, Some("x"), 3)).toDF("id", "lang", "version")
    val got = Scd.history(snaps, Seq("id"), "version", Seq("lang"))
      .orderBy("version_from").collect()
    assert(got.length == 2, "null==null must compress, null→x must not")
    assert(got(0).isNullAt(1) && got(0).getInt(2) == 1)
    assert(got(1).getString(1) == "x" && got(1).getInt(4) == 1)
  }

  test("quantilesDisc nearest-rank values are exact per group") {
    // group g: 1..10 → p25=3 (ceil(2.5)), p50=5, p90=9, p100=10
    val df = (1 to 10).map(v => ("g", v)).toDF("k", "v")
    val got = Stats.quantilesDisc(df, Seq("k"), col("v"), Seq(2500, 5000, 9000, 10000))
      .collect().map(r => r.getInt(1) -> r.getInt(2)).toMap
    assert(got == Map(2500 -> 3, 5000 -> 5, 9000 -> 9, 10000 -> 10))
  }

  test("quantilesDisc ignores nulls and is stable under value ties and repartitioning") {
    val df = (Seq.fill(50)(7) ++ Seq.fill(50)(9)).zipWithIndex
      .map { case (v, i) => ("g", if (i == 0) None else Some(v)) }
      .toDF("k", "v")
    val got = Stats.quantilesDisc(df.repartition(13), Seq("k"), col("v"), Seq(5000, 9900))
      .collect().map(r => r.getInt(1) -> r.getInt(2)).toMap
    // 99 non-null values: 49×7 then 50×9 → p50 at rank 50 = 9, p99 at rank 99 = 9
    assert(got == Map(5000 -> 9, 9900 -> 9))
  }

  test("profileColumns: one row per column — rows, nulls, exact NDV, TYPED min/max") {
    val df = Seq(
      (9L, Some("b")), (10L, Some("a")), (2L, None), (9L, Some("a"))
    ).toDF("id", "tag")
    val got = Stats.profileColumns(df, Seq("id", "tag"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    // id: 4 rows, 0 nulls, NDV 3; min/max computed as LONGS then rendered —
    // max is "10", not the lexicographic "9"
    assert(got("id") == ((4L, 0L, 3L, "2", "10")))
    assert(got("tag") == ((4L, 1L, 2L, "a", "b")), "nulls excluded from NDV and min/max")
  }

  test("profileColumns refuses unknown columns and plans as a single scan") {
    val df = Seq((1L, "x")).toDF("id", "tag")
    val e = intercept[IllegalArgumentException](Stats.profileColumns(df, Seq("id", "nope")))
    assert(e.getMessage.contains("nope"))
    val plan = Stats.profileColumns(df, Seq("id", "tag"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Union"), "single-pass agg+pivot, not one subtree per column")
  }

  test("Mv: merge(aggState(A), aggState(B)) == aggState(A ∪ B), any split, any order") {
    import graft.ops.Mv
    val rng = new scala.util.Random(5)
    val rows = (0L until 300L).map(i => (i, s"src${i % 7}", rng.nextInt(5000).toLong))
    val all = rows.toDF("doc_id", "source", "n_chars")
    def state(df: org.apache.spark.sql.DataFrame) =
      Mv.aggState(df, "source", "n_chars").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val full = state(all)
    val a = all.filter(col("doc_id") % 3 === 0)
    val b = all.filter(col("doc_id") % 3 =!= 0)
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val merged = asMap(Mv.merge(Mv.aggState(a, "source", "n_chars"),
      Mv.aggState(b, "source", "n_chars"), "source"))
    assert(merged == full, "merge must equal the full recompute")
    val mergedFlip = asMap(Mv.merge(Mv.aggState(b, "source", "n_chars"),
      Mv.aggState(a, "source", "n_chars"), "source"))
    assert(mergedFlip == full, "merge is commutative")
    // a key present only in the delta appears with the delta's state
    val novel = Seq((900L, "srcNEW", 42L)).toDF("doc_id", "source", "n_chars")
    val withNovel = asMap(Mv.merge(Mv.aggState(all, "source", "n_chars"),
      Mv.aggState(novel, "source", "n_chars"), "source"))
    assert(withNovel("srcNEW") == ((1L, 42L, 42L)))
  }

  test("scoreFrontier: hand-computed cutoffs, tie overshoot, full-keep tier") {
    // scores: 10 docs at 90 (w 10 each), 10 at 50 (w 20), 20 at 10 (w 5)
    // n=40, W=100+200+100=400
    val rows = ((1 to 10).map(i => (90L, 10L)) ++ (1 to 10).map(_ => (50L, 20L)) ++
      (1 to 20).map(_ => (10L, 5L))).toDF("score", "w")
    val out = graft.ops.Stats.scoreFrontier(rows, "score", "w", Seq(2500, 5000, 10000))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    // 25% of 40 = 10 → cutoff 90 reaches it exactly: 10 docs, weight 100
    assert(out(2500L) == ((90L, 10L, 100L)))
    // 50% of 40 = 20 → cutoff 50: 20 docs, weight 300
    assert(out(5000L) == ((50L, 20L, 300L)))
    // 100% → cutoff = min score, everything kept
    assert(out(10000L) == ((10L, 40L, 400L)))
    // tie overshoot: target 30% of 40 = 12 docs — the 50-tie class cannot
    // split, so the gate keeps all 20 scoring ≥ 50
    val over = graft.ops.Stats.scoreFrontier(rows, "score", "w", Seq(3000))
      .collect().head
    assert(over.getLong(1) == 50L && over.getLong(2) == 20L)
  }

  test("giniBp: uniform reads 0, hand-computed two-group split, tie order irrelevant") {
    def gini(xs: Seq[Long]): Long =
      graft.ops.Stats.giniBp(xs.map(Tuple1(_)).toDF("n"), "n").collect().head.getLong(2)
    assert(gini(Seq(7L, 7L, 7L, 7L)) == 0L, "perfect balance is 0")
    // (1, 999): Σ(2i−1)x = 1 + 3·999 = 2998; G = (2998 − 2·1000)·10000/2000 = 4990
    assert(gini(Seq(1L, 999L)) == 4990L)
    assert(gini(Seq(999L, 1L)) == 4990L, "input order must not matter")
    // heavy ties: (5,5,10) in any order — Σ(2i−1)x over the tie block is
    // order-invariant: 5+15+50=70; G=(70−60)·10000/60=1666
    assert(gini(Seq(10L, 5L, 5L)) == 1666L)
  }

  test("corrCard: hand-computed numerators, sign cases, single-point group") {
    // group a: perfectly correlated (y = 2x) over x = 1,2,3
    //   n=3 Σx=6 Σy=12 Σxx=14 Σyy=56 Σxy=28
    //   cov_num = 3·28 − 6·12 = 12; varx = 3·14 − 36 = 6; vary = 3·56 − 144 = 24
    //   (and r² = 12²/(6·24) = 1 — the reader-side ratio)
    // group b: anti-correlated (x,y) = (1,3),(2,2),(3,1) → cov_num = −6
    // group c: one point → all numerators 0, sign 0
    val rows = Seq(
      ("a", 1L, 2L), ("a", 2L, 4L), ("a", 3L, 6L),
      ("b", 1L, 3L), ("b", 2L, 2L), ("b", 3L, 1L),
      ("c", 5L, 9L)).toDF("g", "x", "y")
    val out = graft.ops.Stats.corrCard(rows, "g", col("x"), col("y"))
      .orderBy(col("g")).collect()
      .map(r => r.getString(0) -> (r.getLong(7), r.getLong(8), r.getLong(9), r.getLong(10)))
      .toMap
    assert(out("a") == ((12L, 6L, 24L, 1L)))
    assert(out("b") == ((-6L, 6L, 6L, -1L)))
    assert(out("c") == ((0L, 0L, 0L, 0L)))
  }

  test("corrCard: a numerator past BIGINT range fails loudly, not NULL") {
    // two rows at x = y = 2^31 · 3 ≈ 6.4e9: sum_xx = 2·x² ≈ 8.3e19 > 2^63−1,
    // so the non-ANSI DECIMAL→BIGINT boundary cast would silently yield
    // NULL — the guard must convert that into an in-plan error instead
    val x = (1L << 31) * 3L
    val rows = Seq(("a", x, x), ("a", x, x)).toDF("g", "x", "y")
    val e = intercept[Exception] {
      graft.ops.Stats.corrCard(rows, "g", col("x"), col("y")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("exceeds BIGINT range")))
    // and the documented envelope still passes clean: 2^20-domain signals
    val ok = Seq(("a", 1048576L, 1048576L), ("a", 1L, 2L)).toDF("g", "x", "y")
    assert(graft.ops.Stats.corrCard(ok, "g", col("x"), col("y")).count() == 1L)
  }
}

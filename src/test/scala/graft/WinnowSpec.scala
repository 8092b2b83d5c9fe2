package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Winnow

class WinnowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fps(rows: Seq[(Long, String)], k: Int = 5, w: Int = 4) =
    Winnow.fingerprints(rows.toDF("doc_id", "text"), "doc_id", "text", k, w)

  test("the winnowing guarantee: a shared k+w-1-token substring always shares a fingerprint") {
    // 8 shared tokens = k+w-1 with k=5, w=4 — the paper's coverage bound
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    val rows = Seq(
      1L -> s"one two three $shared nine ten eleven twelve",
      2L -> s"completely different preamble here $shared and a different tail entirely")
    val byDoc = fps(rows).collect().groupBy(_.getLong(0))
    val common = byDoc(1L).map(_.getLong(2)).toSet intersect byDoc(2L).map(_.getLong(2)).toSet
    assert(common.nonEmpty, "guaranteed shared fingerprint missing")
  }

  test("selection is position-deterministic, distinct, and in gram range") {
    val text = (1 to 40).map(i => s"tok$i").mkString(" ") + " tok5 tok6 tok7 tok8 tok9"
    val out = fps(Seq(10L -> text)).collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).distinct.length == out.length, "duplicate positions selected")
    val nGrams = 45 - 5 + 1
    assert(out.forall { case (p, _) => p >= 0 && p < nGrams })
    // density: at most one pick per window start
    assert(out.length <= nGrams - 4 + 1)
    val again = fps(Seq(10L -> text)).collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)), "selection not deterministic")
  }

  test("documents shorter than k tokens fingerprint their whole text at pos 0") {
    val out = fps(Seq(5L -> "tiny doc")).collect()
    assert(out.length == 1 && out(0).getLong(1) == 0L)
    // and equals the hash of the collapsed text, not of any gram
    val direct = spark.sql(
      "SELECT CAST(conv(substring(md5('tiny doc'), 1, 15), 16, 10) AS BIGINT) AS h")
      .head().getLong(0)
    assert(out(0).getLong(2) == direct)
  }

  test("candidatePairs finds planted partial overlap and counts shared fingerprints") {
    val overlap = "november oscar papa quebec romeo sierra tango uniform victor whiskey"
    val rows = Seq(
      1L -> s"aa bb cc dd ee ff gg hh $overlap ii jj kk ll mm nn oo pp",
      2L -> s"qq rr ss tt uu vv ww xx $overlap yy zz a1 b1 c1 d1 e1 f1",
      3L -> "totally unrelated text with its own words going on for a while longer here")
    val pairs = Winnow.candidatePairs(fps(rows), "doc_id").collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 2L)
    assert(pairs(0).getLong(2) >= 2L)
  }

  test("posting cap drops boilerplate-hot fingerprints instead of fanning out pairs") {
    // 12 IDENTICAL boilerplate docs: every fingerprint is shared by all 12
    // (posting = 12 > cap 10), so the cap must kill the 66-pair fan-out —
    // while a genuine 2-doc overlap (13, 14) survives untouched
    val boiler = "standard footer text appears on every single page of this entire site always"
    val overlap = "golf hotel india juliet kilo lima mike november oscar papa"
    val rows = (1L to 12L).map(i => i -> boiler) ++ Seq(
      13L -> s"aa bb cc dd ee ff $overlap gg hh ii jj kk",
      14L -> s"ll mm nn oo pp qq $overlap rr ss tt uu vv")
    val capped = Winnow.candidatePairs(fps(rows), "doc_id", maxPosting = 10, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSeq == Seq((13L, 14L)),
      s"cap must keep only the genuine pair, got ${capped.mkString(",")}")
    val uncapped = Winnow.candidatePairs(fps(rows), "doc_id", maxPosting = 50, minShared = 1)
    assert(uncapped.count() == 66 + 1, "without the cap the boilerplate fans out all 66 pairs")
  }

  test("recall at the cap boundary: posting = maxPosting is kept, +1 is dropped") {
    // a phrase shared by EXACTLY maxPosting docs sits ON the boundary —
    // between(2, maxPosting) is inclusive, so its pairs must all surface;
    // the same corpus with one more sharer must lose them. This is the
    // template-heavy-corpus honesty check: the cap is a strict posting
    // bound, not an off-by-one that silently eats the last legal bucket.
    // identical docs so the winnowed SELECTION is identical too — with
    // doc-unique tails the per-doc window competition differs and a
    // phrase shared by N docs can emit fps with posting < N (that
    // partial-posting behavior is the previous test's subject)
    val quad = "qq ww ee rr tt yy uu ii oo pp aa ss"
    def corpus(sharers: Int) = (1L to sharers.toLong).map(i => i -> quad)
    val atCap = Winnow.candidatePairs(fps(corpus(4)), "doc_id",
      maxPosting = 4, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)).toSet
    assert(atCap == all4, s"posting == cap must keep all 6 pairs, got $atCap")
    val overCap = Winnow.candidatePairs(fps(corpus(5)), "doc_id",
      maxPosting = 4, minShared = 1).count()
    assert(overCap == 0, "posting == cap + 1 must drop the bucket entirely")
  }

  test("boilerplate-heavy recall: planted unique overlaps survive a 90%-template corpus") {
    // every doc is ~90% shared template; pairs (2i, 2i+1) additionally
    // share a pair-unique phrase. With the template hot (posting = 20 >
    // cap), candidate pairs must be EXACTLY the planted ones — fan-out
    // stays capped and recall on the unique overlaps is total.
    val template = (0 until 40).map(t => s"boil$t").mkString(" ")
    val rows = (0L until 20L).map { i =>
      val pair = i / 2
      val uniq = (0 until 12).map(t => s"u${pair}tok$t").mkString(" ")
      i -> s"$template $uniq end$i"
    }
    val pairs = Winnow.candidatePairs(fps(rows), "doc_id",
      maxPosting = 10, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until 10L).map(p => (2 * p, 2 * p + 1)).toSet
    assert(pairs == planted, s"expected exactly the 10 planted pairs, got $pairs")
  }

  test("attributeSpans: a lifted quote attributes to its source; unrelated probes yield no row") {
    val quote = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val corpus = Seq(
      (1L, s"irrelevant preamble $quote and some trailing context here"),
      (2L, "a completely different document about other matters entirely"),
      (3L, s"this one also contains $quote but padded with far more other text " +
        "so it shares fewer distinct fingerprints than the source overall"))
      .toDF("doc_id", "text")
    val probes = Seq(
      (100L, quote),                              // verbatim lift
      (200L, "nothing in common with anything here at all")).toDF("doc_id", "text")
    val out = Winnow.attributeSpans(probes, corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.contains(100L), "the lifted quote must attribute")
    val (src, shared, nFp, shareBp) = out(100L)
    assert(Set(1L, 3L).contains(src), s"attribution must point at a quote carrier, got $src")
    assert(shared >= 1L && shared <= nFp && shareBp == 10000L * shared / nFp)
    assert(!out.contains(200L), "no shared fingerprints → no attribution row")
  }

  test("attributeSpans: ties break to the lower source id; totals come from the probe side") {
    val t = "one two three four five six seven eight"
    val corpus = Seq((7L, s"$t tail a"), (5L, s"$t tail b")).toDF("doc_id", "text")
    val probes = Seq((9L, t)).toDF("doc_id", "text")
    val rows = Winnow.attributeSpans(probes, corpus, "doc_id", "text").collect()
    assert(rows.length == 1)
    // both corpus docs share the identical quote fingerprints; the tie
    // must resolve to source 5 deterministically
    assert(rows.head.getLong(1) == 5L)
  }

  test("probeIndex refuses an index built with different fingerprint parameters") {
    val t = "graft_test_winnow_params"
    Winnow.writeIndex(Seq(1L -> "one two three four five six seven")
      .toDF("doc_id", "text"), "doc_id", "text", t, k = 5, w = 4)
    try {
      val e = intercept[IllegalArgumentException] {
        Winnow.probeIndex(Seq(2L -> "eight nine ten").toDF("doc_id", "text"),
          "doc_id", "text", t, k = 4, w = 4)
      }
      assert(e.getMessage.contains("k=5"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("probeIndex: increment finds its corpus-side overlap through the persisted index") {
    val overlap = "zulu yankee xray whiskey victor uniform tango sierra romeo quebec"
    val corpus = Seq(
      1L -> s"c one two three four five $overlap six seven eight nine ten",
      2L -> "corpus noise document with completely unrelated content words here")
    val batch = Seq(10L -> s"n alpha beta gamma delta epsilon $overlap zeta eta theta iota kappa")
    val t = "graft_test_winnow_posts"
    Winnow.writeIndex(corpus.toDF("doc_id", "text"), "doc_id", "text", t)
    try {
      val pairs = Winnow.probeIndex(batch.toDF("doc_id", "text"), "doc_id", "text", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((10L, 1L)),
        s"expected exactly the planted cross-side pair, got ${pairs.mkString(",")}")
      assert(pairs.head._3 >= 1L)
      // a cap of 1 still keeps it: the overlap fingerprints post once per side
      assert(Winnow.probeIndex(batch.toDF("doc_id", "text"), "doc_id", "text", t,
        maxPosting = 1).count() == 1)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("parameter validation") {
    intercept[IllegalArgumentException](Winnow.fingerprints(Seq(1L -> "x").toDF("doc_id", "text"), "doc_id", "text", k = 0))
    intercept[IllegalArgumentException](Winnow.candidatePairs(fps(Seq(1L -> "x")), "doc_id", maxPosting = 1))
    intercept[IllegalArgumentException](Winnow.postingCurve(fps(Seq(1L -> "x")), "doc_id", Seq.empty))
    intercept[IllegalArgumentException](Winnow.postingCurve(fps(Seq(1L -> "x")), "doc_id", Seq(1)))
  }

  test("postingCurve equality contract: full-corpus tier matches candidatePairs exactly") {
    // the tuning posture's honesty tooth: when the input IS the corpus,
    // each cap tier's (n_pairs, shared_total) must equal the exact
    // candidatePairs run at that cap — the estimate degrades only via
    // SAMPLING, never via different arithmetic
    val overlap = "november oscar papa quebec romeo sierra tango uniform victor whiskey"
    val boiler = "this footer repeats on every page of the same crawl domain forever"
    val rows = Seq(
      1L -> s"aa bb cc dd ee ff gg hh $overlap ii jj kk ll mm nn oo pp",
      2L -> s"qq rr ss tt uu vv ww xx $overlap yy zz a1 b1 c1 d1 e1 f1",
      3L -> s"g1 h1 i1 j1 k1 l1 m1 n1 $overlap o1 p1 q1 r1 s1 t1 u1 v1",
      4L -> "totally unrelated text with its own words going on for a while here") ++
      (10L to 21L).map(i => i -> boiler)
    val f = fps(rows)
    val curve = Winnow.postingCurve(f, "doc_id", Seq(2, 10, 50), minShared = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(curve.keySet == Set(2L, 10L, 50L))
    for (cap <- Seq(2, 10, 50)) {
      val exact = Winnow.candidatePairs(f, "doc_id", maxPosting = cap, minShared = 2)
        .agg(count(lit(1)), coalesce(sum(col("n_shared")), lit(0L)))
        .head()
      assert(curve(cap.toLong)._3 == exact.getLong(0),
        s"cap=$cap n_pairs: curve=${curve(cap.toLong)._3} exact=${exact.getLong(0)}")
      assert(curve(cap.toLong)._4 == exact.getLong(1),
        s"cap=$cap shared_total: curve=${curve(cap.toLong)._4} exact=${exact.getLong(1)}")
    }
    // counts formulation: volume at the widest cap covers the 12-doc
    // boilerplate cluster (C(12,2)=66 from its postings) plus the overlap
    assert(curve(50L)._2 >= 66L)
    // the tightest cap drops the boilerplate cluster's postings entirely
    assert(curve(2L)._2 < curve(50L)._2)
  }
}

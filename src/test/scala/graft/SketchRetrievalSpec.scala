package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Bloom, Bm25, Cms, Dedup, Fusion}

class SketchRetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---------------- Count-Min ----------------

  test("CMS estimates never under-count and are exact for a sparse stream") {
    val stream = (Seq.fill(50)("alpha") ++ Seq.fill(7)("beta") ++ Seq("gamma"))
      .map(Tuple1(_)).toDF("v")
    val counters = Cms.sketch(stream, col("v"), depth = 4, width = 256)
    val probes = Seq("alpha", "beta", "gamma", "never-seen").map(Tuple1(_)).toDF("v")
    val est = Cms.estimate(counters, probes, "v", depth = 4, width = 256)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 3 distinct values in a 4x256 grid: collision probability is ~0 per
    // row and the min over 4 rows kills any single collision → exact
    assert(est("alpha") == 50 && est("beta") == 7 && est("gamma") == 1)
    assert(est("never-seen") == 0)
  }

  test("CMS counters merge by addition (sketch of union = summed grids)") {
    val a = Seq.fill(30)("x").map(Tuple1(_)).toDF("v")
    val b = (Seq.fill(12)("x") ++ Seq.fill(5)("y")).map(Tuple1(_)).toDF("v")
    val merged = Cms.sketch(a, col("v")).unionByName(Cms.sketch(b, col("v")))
      .groupBy("row_idx", "bucket").agg(sum("cnt").as("cnt"))
    val whole = Cms.sketch(a.unionByName(b), col("v"))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("CMS ignores null values") {
    val counters = Cms.sketch(Seq(Some("a"), None, Some("a")).map(Tuple1(_)).toDF("v"), col("v"))
    val est = Cms.estimate(counters, Seq("a").map(Tuple1(_)).toDF("v"), "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("a") == 2)
  }

  // ---------------- Bloom ----------------

  test("Bloom has no false negatives and a sane false-positive rate") {
    val members = (0 until 500).map(i => Tuple1(s"member-$i")).toDF("v")
    val bloom = Bloom.build(members, col("v"), numBits = 1 << 15, numHashes = 4)
    val words = bloom.head().getSeq[Long](0)
    assert(words.length == (1 << 15) / 64)
    val probes = ((0 until 500).map(i => s"member-$i") ++
      (0 until 2000).map(i => s"stranger-$i")).map(Tuple1(_)).toDF("v")
    val hits = probes.crossJoin(broadcast(bloom))
      .withColumn("hit", Bloom.mightContain(col("bloom_words"), col("v"), 1 << 15, 4))
      .filter(col("hit")).select("v").as[String].collect().toSet
    assert((0 until 500).forall(i => hits(s"member-$i")), "no false negatives")
    val fp = hits.count(_.startsWith("stranger-"))
    // m=32768, n=500, k=4 → theoretical fpp ~1e-5; allow lots of slack
    assert(fp <= 20, s"false-positive count out of range: $fp")
  }

  test("Bloom build ignores nulls and is deterministic") {
    val df = Seq(Some("a"), None, Some("b")).map(Tuple1(_)).toDF("v")
    val w1 = Bloom.build(df, col("v")).head().getSeq[Long](0)
    val w2 = Bloom.build(df.repartition(7), col("v")).head().getSeq[Long](0)
    assert(w1 == w2)
    assert(w1.map(java.lang.Long.bitCount(_)).sum <= 8, "at most 2 values x 4 hashes bits set")
  }

  // ---------------- BM25 ----------------

  test("BM25 ranks docs by query-term coverage and respects k") {
    val docs = Seq(
      (1L, "spark spark spark join window shuffle"),
      (2L, "spark join"),
      (3L, "cat dog fish bird " * 10),
      (4L, "window")).toDF("doc_id", "text")
    val out = Bm25.search(docs, "doc_id", "text", Seq("spark", "join", "window"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.length == 3)
    assert(out.map(_._1).toSet == Set(1L, 2L, 4L), "doc 3 has no query terms")
    val byRank = out.sortBy(_._3).map(_._1)
    assert(byRank.head == 1L, "doc with all three terms (and repeats) ranks first")
    assert(out.forall(_._2 > 0L), "scores are positive")
  }

  test("BM25 term frequencies count within-doc occurrences and doc length") {
    val tf = Bm25.termFrequencies(Seq((1L, "a a b")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(tf == Set(("a", 2L, 3L), ("b", 1L, 3L)))
  }

  test("rocchioSearch: expansion recalls docs the raw query cannot name") {
    val docs = Seq(
      (1L, "apple banana banana"),
      (2L, "apple cherry"),
      (3L, "cherry durian cherry"), // no query term — only expansion can reach it
      (4L, "unrelated words entirely")).toDF("doc_id", "text")
    val out = Bm25.rocchioSearch(docs, "doc_id", "text", Seq("apple"),
        k0 = 2, expandTerms = 2, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // seeds {1,2}; their vocab minus 'apple' = {banana, cherry}; both
    // expand, so doc 3 (cherry-only) now scores — vocabulary-mismatch
    // recall — while doc 4 stays out
    assert(out.map(_._1).toSet == Set(1L, 2L, 3L))
    assert(out.forall(_._2 > 0L))
  }

  test("rocchioSearch: expandTerms = 0 preserves the plain BM25 ranking") {
    val docs = Seq(
      (1L, "spark spark spark join window shuffle"),
      (2L, "spark join"),
      (4L, "window")).toDF("doc_id", "text")
    val plain = Bm25.search(docs, "doc_id", "text", Seq("spark", "join"), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    val rocchio = Bm25.rocchioSearch(docs, "doc_id", "text", Seq("spark", "join"),
        k0 = 2, expandTerms = 0, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    assert(plain.map(_._1) == rocchio.map(_._1))
    assert(plain == rocchio, "same docs, same ranks — weights only rescale scores")
  }

  test("searchIncremental: persisted index + delta equals from-scratch search, ranks and scores") {
    val corpus = Seq(
      (1L, "spark join window shuffle"),
      (2L, "spark spark join"),
      (3L, "window table scan")).toDF("doc_id", "text")
    val delta = Seq(
      (4L, "spark join join window"),   // changes df AND adds a contender
      (5L, "unrelated words")).toDF("doc_id", "text")
    val table = "graft_tf_posts_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    Bm25.writeTfIndex(corpus, "doc_id", "text", table)
    val inc = Bm25.searchIncremental(spark, table, delta, "doc_id", "text",
        Seq("spark", "join"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val scratch = Bm25.search(corpus.unionByName(delta), "doc_id", "text",
        Seq("spark", "join"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(inc == scratch,
      "doc-disjoint postings are a mergeable monoid — index ∪ delta must be exact")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("gazetteerMatch: one pass matches all entities; nesting and shared terms stay independent") {
    val docs = Seq(
      (1L, "call john smith now"),          // e_js at pos 1
      (2L, "smith john called"),            // reversed: no match
      (3L, "john smith met jane doe and john smith"), // e_js twice, e_jd once
      (4L, "doe jane nothing")).toDF("doc_id", "text")
    val out = Bm25.gazetteerMatch(docs, "doc_id", "text", Seq(
        "e_js" -> Seq("john", "smith"),
        "e_jd" -> Seq("jane", "doe"),
        "e_jsm" -> Seq("john", "smith", "met"))) // shares both e_js terms
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out((1L, "e_js")) == ((1L, 1L)))
    assert(!out.contains((2L, "e_js")), "token order is part of the entity")
    assert(out((3L, "e_js")) == ((2L, 0L)), "both occurrences count; first_pos is the earliest")
    assert(out((3L, "e_jd")) == ((1L, 3L)))
    assert(out((3L, "e_jsm")) == ((1L, 0L)), "the nested longer entity matches independently")
    assert(!out.exists(_._1._1 == 4L), "scrambled tokens never anchor")
  }

  test("evalCard: hand-computed metrics; word-order blindness shows up as zero recall") {
    val docs = Seq(
      (1L, "alpha beta gamma x"),   // phrase "alpha beta" present
      (2L, "beta alpha other words"), // bag match, NOT the phrase
      (3L, "alpha beta"),            // phrase present, shortest doc
      (4L, "nothing here")).toDF("doc_id", "text")
    val out = Bm25.evalCard(docs, "doc_id", "text", Seq(
        "q0" -> Seq("alpha", "beta"),  // truth {1,3}; top-2 = {3,1} (dl ties by id)
        "q1" -> Seq("beta", "alpha"),  // same bag ranking, truth {2} — missed
        "q2" -> Seq("zeta", "eta")),   // no terms anywhere: the zero-guard path
        k = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out("q0") == ((2L, 2L, 10000L, 10000L, 10000L)))
    assert(out("q1") == ((1L, 0L, 0L, 0L, 0L)),
      "bag ranking cannot see token order — the card measures exactly that miss")
    assert(out("q2") == ((0L, 0L, 0L, 0L, 0L)), "undefined metrics pin to zero")
  }

  test("evalCardBatched: the one-pass tier equals the per-query exact tier") {
    // the default-path equality the r14 verdict asked for: the batched
    // form (single gazetteer truth pass + single battery-broadcast
    // ranking + bounded-heap top-k) must reproduce evalCard's card
    // exactly — including the no-term query, boundary ties, and a truth
    // doc outside the top-k
    val docs = (0L until 40L).map { i =>
      val body = if (i % 4 == 0) "alpha beta shared filler" else s"word$i other filler text"
      (i, s"$body pad${i % 7} tail")
    }.toDF("doc_id", "text")
    val battery = Seq(
      "q0" -> Seq("alpha", "beta"),
      "q1" -> Seq("beta", "alpha"),      // same bag, different phrase truth
      "q2" -> Seq("filler", "text"),     // broad truth, larger than k
      "q3" -> Seq("zeta", "eta"))        // no terms anywhere
    for (k <- Seq(3, 10)) {
      val exact = Bm25.evalCard(docs, "doc_id", "text", battery, k).collect().toSeq
      val fast = Bm25.evalCardBatched(docs, "doc_id", "text", battery, k).collect().toSeq
      assert(fast == exact, s"k=$k: $fast != $exact")
    }
  }

  test("phraseSearch: hand-computed anchors; bag match without adjacency is NOT a phrase hit") {
    val docs = Seq(
      (1L, "the quick brown fox THE Quick brown cat"), // 2 hits (case-folded)
      (2L, "brown quick the"),                         // bag match only
      (3L, "x the quick brown")).toDF("doc_id", "text")
    val out = Bm25.phraseSearch(docs, "doc_id", "text", Seq("the", "quick", "brown"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(1L -> (2L, 0L), 3L -> (1L, 1L)),
      "doc 2's unordered bag must not match; doc 1 matches at 0 and 4")
  }

  test("phraseSearch: duplicate terms in the phrase need one occurrence PER SLOT") {
    val docs = Seq(
      (1L, "the quick brown"), // has 'the' once — can't satisfy two 'the' slots adjacently
      (2L, "a the the quick b")).toDF("doc_id", "text")
    val out = Bm25.phraseSearch(docs, "doc_id", "text", Seq("the", "the", "quick"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(2L -> (1L, 1L)),
      "only the doc with adjacent 'the the quick' matches, anchored at 1")
  }

  test("phraseSearch: single-term phrase degenerates to occurrence counting") {
    val docs = Seq((1L, "a b a"), (2L, "b")).toDF("doc_id", "text")
    val out = Bm25.phraseSearch(docs, "doc_id", "text", Seq("a"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(1L -> (2L, 0L)))
    assertThrows[IllegalArgumentException] {
      Bm25.phraseSearch(docs, "doc_id", "text", Seq.empty)
    }
  }

  // ---------------- incremental dedup ----------------

  test("incremental near-dedup finds cross-slice dups only") {
    val base = "the quick brown fox jumps over the lazy dog again and again in the park"
    val docs = Seq(
      (10L, base), // new batch (10 % 5 == 0)
      (11L, base), // corpus dup of 10
      (12L, base), // corpus dup of 10 — also a within-corpus dup of 11
      (13L, "completely different text with no shared shingles at all whatsoever today"),
      (15L, "another unrelated new document about streaming watermarks and state stores"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalNearDuplicates(
      docs.filter(col("doc_id") % 5 === 0), docs.filter(col("doc_id") % 5 =!= 0),
      "doc_id", "text", minJaccardBp = 5000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(t => (t._1, t._2)).toSet == Set((10L, 11L), (10L, 12L)),
      "only new→corpus pairs, never corpus×corpus (11,12) or self pairs")
    assert(out.forall(_._3 == 10000L), "identical texts score 10000 bp")
  }

  test("reciprocal rank fusion: shared docs outrank single-list docs, absent list scores 0") {
    import spark.implicits._
    // doc 1 is rank 1 lexically and rank 2 in vectors; doc 2 only lexical;
    // doc 3 only vector. rrf: d1 = 1e6/61 + 1e6/62 = 16393+16129 = 32522,
    // d2 = 1e6/62 = 16129, d3 = 1e6/61 = 16393
    val lex = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank")
    val vec = Seq((3L, 1), (1L, 2)).toDF("doc_id", "rank")
    val fused = Fusion.reciprocalRankFusion(lex, vec, "doc_id")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("rrf_score"), r.getAs[Int]("rank")))
      .sortBy(_._3).toList
    assert(fused == List((1L, 32522L, 1), (3L, 16393L, 2), (2L, 16129L, 3)))
    // reserved-name guards: an id column named like an output/temp column
    // would clobber the join key — refuse instead of fusing garbage
    val bad = Seq((1L, 1)).toDF("rank", "score")
    intercept[IllegalArgumentException] {
      Fusion.reciprocalRankFusion(bad, bad, "rank", rankCol = "score")
    }
    intercept[IllegalArgumentException] {
      Fusion.reciprocalRankFusion(lex, vec, "doc_id", rankCol = "doc_id")
    }
  }
}

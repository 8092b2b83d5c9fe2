package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Bpe

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("word frequencies: lowercased [a-z]+ runs, char-spaced seq with </w>") {
    val w = Bpe.wordFrequencies(docs("Low low LOWER, lowest!")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(w.keySet == Set("low", "lower", "lowest"))
    assert(w("low") == ((2L, "l o w </w>")))
    assert(w("lower")._2 == "l o w e r </w>")
  }

  test("pair counts are weighted by word frequency and include the end marker") {
    val words = Bpe.wordFrequencies(docs("ab ab ab ac"))
    val pairs = Bpe.pairCounts(words).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // "ab"×3 → (a,b)=3, (b,</w>)=3 ; "ac"×1 → (a,c)=1, (c,</w>)=1
    assert(pairs(("a", "b")) == 3L && pairs(("b", "</w>")) == 3L)
    assert(pairs(("a", "c")) == 1L && pairs(("c", "</w>")) == 1L)
  }

  test("learnMerges reproduces the hand-computed merge sequence") {
    // corpus: "low"×4 "lower"×2 — pair counts round 1:
    //   (l,o)=6 (o,w)=6 (w,</w>)=4 (w,e)=2 (e,r)=2 (r,</w>)=2
    // tie (l,o) vs (o,w) at 6 → lexicographic x: "l" < "o" → (l,o).
    // round 2: (lo,w)=6 wins; round 3: (low,</w>)=4.
    val words = Bpe.wordFrequencies(docs(Seq.fill(4)("low").mkString(" ") + " lower lower"))
    val (merges, encoded) = Bpe.learnMerges(words, rounds = 3)
    assert(merges == Seq((1, "l", "o", 6L), (2, "lo", "w", 6L), (3, "low", "</w>", 4L)))
    val seqs = encoded.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(seqs("low") == "low</w>")
    assert(seqs("lower") == "low e r </w>")
  }

  test("merge application reaches the two-pass fixpoint on consecutive occurrences") {
    // "abab…" gives consecutive ' a b ' occurrences whose leading spaces
    // overlap — pass 1 alone merges only alternate ones
    val words = Seq(("abababab", 1L, "a b a b a b a b </w>")).toDF("word", "n", "seq")
    val out = Bpe.applyMerge(words, "a", "b").collect()(0).getString(2)
    assert(out == "ab ab ab ab </w>")
  }

  test("repeated-symbol chains stay deterministic (leftmost replace rule)") {
    val words = Seq(("aaaaa", 1L, "a a a a a </w>")).toDF("word", "n", "seq")
    val out = Bpe.applyMerge(words, "a", "a").collect()(0).getString(2)
    // documented divergence from tokenwise greedy: replace's leftmost
    // non-overlapping matching merges (1,2) then (4,5), leaving token 3
    assert(out == "aa a aa </w>")
  }

  test("vocab counts after merges are weighted symbol totals") {
    val words = Bpe.wordFrequencies(docs("ab ab b"))
    val (_, encoded) = Bpe.learnMerges(words, rounds = 1) // (a,b)? counts: (a,b)=2,(b,</w>)=3 → (b,</w>) wins
    val vocab = Bpe.vocabCounts(encoded).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab("b</w>") == 3L) // "ab"→ a b</w> ×2, "b" → b</w> ×1
    assert(vocab("a") == 2L)
  }

  test("encodeTokenCounts: per-doc BPE token totals under the merged vocab") {
    val corpus = docs("low low lower", "lowest low")
    val words = Bpe.wordFrequencies(corpus)
    val (_, encoded) = Bpe.learnMerges(words, rounds = 3)
    // merges (see the hand-computed suite): low→"low</w>"-ish sequencing;
    // recompute expected totals directly from the encoded word table
    val symCount = encoded.collect().map(r => r.getString(0) -> r.getString(2).split(" ").length).toMap
    val out = Bpe.encodeTokenCounts(corpus, encoded).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(0L) == ((3L, (2 * symCount("low") + symCount("lower")).toLong)))
    assert(out(1L) == ((2L, (symCount("lowest") + symCount("low")).toLong)))
  }

  test("learnMerges drains gracefully when the pair space empties") {
    val words = Seq(("a", 5L, "a </w>")).toDF("word", "n", "seq")
    val (merges, _) = Bpe.learnMerges(words, rounds = 10)
    assert(merges == Seq((1, "a", "</w>", 5L))) // after that no pairs remain
  }

  test("learnMergesBatched: batch=1 is byte-identical to the sequential trainer") {
    val corpus = docs("the cat sat on the mat", "the rat ate the cheese",
      "a cat and a rat met", "low lower lowest lowly")
    val w1 = Bpe.wordFrequencies(corpus)
    val (seq6, wseq) = Bpe.learnMerges(w1, rounds = 6)
    val (bat6, wbat) = Bpe.learnMergesBatched(w1, rounds = 6, batch = 1)
    assert(bat6 == seq6)
    val a = wseq.orderBy("word").collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    val b = wbat.orderBy("word").collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(a == b, "final word tables must agree at batch=1")
  }

  test("train (the default batched trainer) pins the oracle-scale schedule") {
    // the production default is learnMergesBatched at DefaultBatch. Its
    // schedule legitimately diverges from the sequential oracle form once
    // a batch outruns derived-pair promotion (verified here: at rounds=6
    // on real sf0.001 text, sequential's 2nd pick (e,</w>) shares 'e'
    // with (e,r) and is conflict-skipped by the batch) — so the pin is a
    // HAND-REPLAY of the default path's own contract on oracle-scale
    // data: with rounds <= DefaultBatch the whole schedule is ONE
    // pair-count snapshot's greedy symbol-disjoint prefix, independently
    // recomputed below. Any change to the pick rule, tie order, conflict
    // rule, or snapshot-count exactness breaks this.
    val corpus = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val words = Bpe.wordFrequencies(corpus)
    val snapshot = Bpe.pairCounts(words)
      .orderBy(desc("cnt"), asc("x"), asc("y")).limit(24).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val used = scala.collection.mutable.Set.empty[String]
    val expected = snapshot.iterator.filter { case (x, y, _) =>
      val ok = !used(x) && !used(y) && !used(x + y)
      if (ok) { used += x; used += y; used += (x + y) }
      ok
    }.take(6).toSeq
    assert(expected.size == 6, "fixture too small to fill the batch")
    val (defM, _) = Bpe.train(words, rounds = 6)
    assert(defM.map { case (_, x, y, c) => (x, y, c) } == expected,
      "default trainer schedule diverged from the hand-replayed batch rule")
    // and the divergence from the sequential oracle form is real and of
    // the documented class (same first pick, conflict-skip after)
    val (seqM, _) = Bpe.learnMerges(words, rounds = 6)
    assert(seqM.head._2 == defM.head._2 && seqM.head._3 == defM.head._3)
  }

  test("learnMergesBatched: per-batch picks are symbol-disjoint with exact snapshot counts") {
    val corpus = docs("the cat sat on the mat", "the rat ate the cheese",
      "a cat and a rat met", "banana bandana cabana")
    val w0 = Bpe.wordFrequencies(corpus)
    val batch = 3
    val (merges, _) = Bpe.learnMergesBatched(w0, rounds = 9, batch = batch)
    assert(merges.map(_._1) == (1 to merges.length), "rounds number sequentially")
    // replay: before each batch, recompute true pair counts and check each
    // applied pair's recorded cnt equals its snapshot count, and that the
    // batch's symbol sets (incl. merged strings) are pairwise disjoint
    var words = w0
    merges.grouped(batch).foreach { g =>
      val snap = Bpe.pairCounts(words).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val seen = scala.collection.mutable.Set.empty[String]
      g.foreach { case (_, x, y, c) =>
        assert(snap((x, y)) == c, s"($x,$y) recorded $c, snapshot ${snap((x, y))}")
        assert(!seen(x) && !seen(y) && !seen(x + y), s"conflict in batch at ($x,$y)")
        seen ++= Seq(x, y, x + y)
        words = Bpe.applyMerge(words, x, y)
      }
    }
  }

  test("learnMergesBatched: symbol mass is conserved and the table still encodes") {
    val corpus = docs("aa aa aa bb bb cc", "aa bb cc dd ee ff")
    val w0 = Bpe.wordFrequencies(corpus)
    val (_, merged) = Bpe.learnMergesBatched(w0, rounds = 5, batch = 2)
    // every word's symbol count only shrinks, never below 1
    val lens = merged.select(col("word"),
      org.apache.spark.sql.functions.size(split(col("seq"), " ")).as("k")).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(lens.values.forall(_ >= 1))
    assert(lens("aa") <= 3)
    val enc = Bpe.encodeTokenCounts(corpus, merged).collect()
    assert(enc.nonEmpty && enc.forall(r => r.getLong(2) >= r.getLong(1)),
      "bpe_tokens >= n_words for [a-z]+ words")
  }
}

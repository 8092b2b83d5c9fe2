package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Eval

class EvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String, String)]) =
    Eval.tokenF1(rows.toDF("id", "gold", "pred"), "id", "gold", "pred")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getAs[Long]("precision_bp"), r.getAs[Long]("recall_bp"), r.getAs[Long]("f1_bp"))).toMap

  test("tokenF1: exact match, multiset overlap, and hand-computed partial credit") {
    val out = run(Seq(
      (1L, "the cat sat", "The  Cat SAT"),        // case/space-insensitive exact
      (2L, "a a b", "a b b"),                      // multiset: min(2,1)+min(1,2)=2
      (3L, "alpha beta gamma delta", "alpha beta") // truncation: P=10000 R=5000
    ))
    assert(out(1L) == ((3L, 3L, 3L, 10000L, 10000L, 10000L)))
    // pair 2: n=3 both sides, overlap 2 → P=R=F1=6666
    assert(out(2L) == ((3L, 3L, 2L, 6666L, 6666L, 6666L)))
    // pair 3: F1 = 2·2·10000/(4+2) = 6666
    assert(out(3L) == ((4L, 2L, 2L, 10000L, 5000L, 6666L)))
  }

  test("tokenF1: empty-side conventions (SQuAD agreement rule)") {
    val out = run(Seq(
      (1L, "", ""),          // both empty → perfect agreement
      (2L, "word", ""),      // empty pred against real gold → all zero
      (3L, "", "word")       // hallucinated answer to empty gold → all zero
    ))
    assert(out(1L) == ((0L, 0L, 0L, 10000L, 10000L, 10000L)))
    assert(out(2L) == ((1L, 0L, 0L, 0L, 0L, 0L)))
    assert(out(3L) == ((0L, 1L, 0L, 0L, 0L, 0L)))
  }

  test("tokenF1: a disjoint prediction scores zero everywhere") {
    val out = run(Seq((1L, "alpha beta", "gamma delta epsilon")))
    assert(out(1L) == ((2L, 3L, 0L, 0L, 0L, 0L)))
  }

  test("bigramEncode + tokenF1 is ROUGE-2: word order matters, short texts have no bigrams") {
    import org.apache.spark.sql.functions.col
    def rouge2(rows: Seq[(Long, String, String)]) = {
      val enc = rows.toDF("id", "gold", "pred").select(col("id"),
        Eval.bigramEncode(col("gold")).as("gold"),
        Eval.bigramEncode(col("pred")).as("pred"))
      Eval.tokenF1(enc, "id", "gold", "pred")
        .collect().map(r => r.getLong(0) -> r.getAs[Long]("f1_bp")).toMap
    }
    val out = rouge2(Seq(
      (1L, "the cat sat down", "the cat sat down"), // identical → 10000
      (2L, "alpha beta", "beta alpha"),             // unigram-perfect, bigram-zero
      (3L, "one", "one"),                           // no bigrams either side → 10000 by convention
      (4L, "a b c d", "a b x d")))                  // bigrams: ab|bc|cd vs ab|bx|xd → overlap 1 → F1 3333
    assert(out(1L) == 10000L)
    assert(out(2L) == 0L, "reversed order must score zero at the bigram tier")
    assert(out(3L) == 10000L)
    assert(out(4L) == 3333L)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dsir

class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ilog2q fragment is the exponent+mantissa integer log2, within 0.086 of true log2") {
    val ns = Seq(1L, 2L, 3L, 7L, 8L, 1023L, 1024L, 1025L, 999999L, (1L << 40) + 12345L)
    val got = ns.toDF("n")
      .selectExpr("n", Dsir.ilog2qSql("n", duck = false) + " AS q")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ns.foreach { n =>
      val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
      val expected = e * 1024L + ((n * 1024L) >> e) - 1024L
      assert(got(n) == expected, s"fragment disagrees with the kernel at n=$n")
      val err = math.abs(got(n) / 1024.0 - math.log(n.toDouble) / math.log(2.0))
      assert(err <= 0.086 + 1e-9, s"approximation error $err too large at n=$n")
    }
  }

  test("bigramsCol: pairs adjacent non-empty tokens; 0/1-token and null texts are safe") {
    val df = Seq(
      (0L, "alpha beta gamma"),
      (1L, "word"),
      (2L, ""),
      (3L, "  spaced   out  "),
      (4L, null.asInstanceOf[String])
    ).toDF("id", "text").select(col("id"), Dsir.bigramsCol(col("text")).as("bg"))
    val got = df.collect().map(r => r.getLong(0) -> Option(r.getSeq[String](1))).toMap
    assert(got(0L).get == Seq("alpha beta", "beta gamma"))
    assert(got(1L).get == Seq.empty)
    assert(got(2L).get == Seq.empty)
    assert(got(3L).get == Seq("spaced out"))
    assert(got(4L).isEmpty) // null text -> null bigrams (explode_outer keeps the doc)
  }

  test("importanceScores ranks target-vocabulary docs above off-target; zero-bigram docs score 0") {
    val docs = Seq(
      (0L, "src0", "quantum flux capacitor quantum flux"),
      (1L, "src0", "quantum flux capacitor engaged"),
      (2L, "srcX", "quantum flux capacitor quantum flux"), // raw doc in target vocabulary
      (3L, "srcX", "mundane ordinary plain mundane ordinary"),
      (4L, "srcX", "word"), // no bigrams
      (5L, "srcX", "")
    ).toDF("doc_id", "source", "text")
    val scored = Dsir.importanceScores(docs, "doc_id", "text", col("source") === "src0")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(scored.size == 6, "every document must appear, including bigram-free ones")
    assert(scored(4L) == ((0L, 0L)) && scored(5L) == ((0L, 0L)))
    // the target-vocabulary raw doc must outscore the off-target one
    assert(scored(2L)._2 > scored(3L)._2,
      s"target-like doc should outrank off-target: ${scored(2L)} vs ${scored(3L)}")
    // selection keeps the highest scorers in rank order
    val top = Dsir.selectTop(
      Dsir.importanceScores(docs, "doc_id", "text", col("source") === "src0"),
      "doc_id", 3).collect().map(r => (r.getLong(0), r.getInt(4)))
    assert(top.map(_._2).toSeq == Seq(1, 2, 3))
    assert(!top.map(_._1).contains(3L), "off-target doc must not make the top-3")
  }

  test("bucketWeights + scoreWith == one-shot importanceScores; weights survive the table roundtrip") {
    val docs = Seq(
      (0L, "src0", "quantum flux capacitor quantum flux"),
      (1L, "srcX", "mundane ordinary plain mundane ordinary"),
      (2L, "srcX", "quantum flux capacitor"),
      (3L, "srcX", "")
    ).toDF("doc_id", "source", "text")
    val tgt = col("source") === "src0"
    val oneShot = Dsir.importanceScores(docs, "doc_id", "text", tgt)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val w = Dsir.bucketWeights(docs, "doc_id", "text", tgt)
    val split = Dsir.scoreWith(w, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(split == oneShot, "the two-call split must equal the fused form")
    // persisted model: write → read → score must be identical (exact
    // integer state, no float crosses the parquet boundary)
    val table = "graft_dsir_spec_" +
      spark.sparkContext.applicationId.replaceAll("[^a-zA-Z0-9]", "_")
    Dsir.writeWeights(spark, w, table)
    val viaTable = Dsir.scoreWith(Dsir.readWeights(spark, table), docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(viaTable == oneShot)
    // a batch with out-of-model vocabulary still yields a row per doc;
    // its bigrams land in unseen buckets and contribute the 0 prior
    val novel = Seq((9L, "srcY", "xylophone zebra xylophone")).toDF("doc_id", "source", "text")
    val scoredNovel = Dsir.scoreWith(w, novel, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(scoredNovel.length == 1 && scoredNovel.head._2 == 2L)
    assert(scoredNovel.head._3 == 0L, "unseen-bucket bigrams must score the neutral 0")
  }

  test("non-default bucket count: same ranking mechanism, train/score counts must pair") {
    val docs = Seq(
      (0L, "src0", "quantum flux capacitor quantum flux"),
      (1L, "srcX", "mundane ordinary plain mundane ordinary"),
      (2L, "srcX", "quantum flux capacitor"),
      (3L, "srcX", "")
    ).toDF("doc_id", "source", "text")
    val tgt = col("source") === "src0"
    // the mechanism is bucket-count independent: at 509 buckets (prime, far
    // from the 8192 default) the target-vocabulary doc still outranks the
    // off-target one and the bigram-free doc still scores the neutral 0
    val scored = Dsir.importanceScores(docs, "doc_id", "text", tgt, buckets = 509L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(scored(2L) > scored(1L), s"ranking must survive a bucket resize: $scored")
    assert(scored(3L) == 0L)
    // split form at the same count equals the fused form at the same count
    val w509 = Dsir.bucketWeights(docs, "doc_id", "text", tgt, buckets = 509L)
    val split = Dsir.scoreWith(w509, docs, "doc_id", "text", buckets = 509L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(split == scored)
  }

  test("a missing carry column fails eagerly with a named-column message") {
    val noSource = Seq((0L, "alpha beta")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dsir.importanceScores(noSource, "doc_id", "text", lit(false))
    }
    assert(e.getMessage.contains("source"), s"message must name the column: ${e.getMessage}")
    // explicit carryCols makes the same frame scoreable
    val ok = Dsir.importanceScores(noSource, "doc_id", "text", lit(false), carryCols = Nil)
      .collect()
    assert(ok.length == 1)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.NaiveBayes

class NaiveBayesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // three classes with distinct vocabularies plus shared filler
  private def doc(cls: String, i: Long): (Long, String, String) = {
    val vocab = cls match {
      case "physics" => "quantum flux boson lattice entropy"
      case "cooking" => "saute braise simmer whisk glaze"
      case _         => "verdict appeal statute tort docket"
    }
    (i, cls, s"$vocab common words here $vocab again $i")
  }

  private lazy val corpus = {
    val rows = (0L until 30L).map(i =>
      doc(Seq("physics", "cooking", "law")((i % 3).toInt), i))
    rows.toDF("doc_id", "source", "text")
  }

  test("NB recovers class-distinct vocabularies near-perfectly on held-out docs") {
    val train = corpus.filter(col("doc_id") < 24)
    val held = corpus.filter(col("doc_id") >= 24)
    val model = NaiveBayes.train(train, "source", "text")
    val priors = NaiveBayes.trainPriors(train, "source")
    val preds = NaiveBayes.classify(model, priors, held, "doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(preds.length == 6)
    assert(preds.forall(p => p._2 == p._3),
      s"distinct vocabularies must classify perfectly, got ${preds.toSeq}")
    val conf = NaiveBayes.confusion(model, priors, held, "doc_id", "source", "text")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(conf.keys.forall(k => k._1 == k._2) && conf.values.sum == 6)
  }

  test("zero-bigram docs fall back to the prior argmax; class-name tie rule holds") {
    // imbalanced priors: 4 physics vs 2 each of the others
    val train = corpus.filter(col("doc_id") < 24)
      .unionByName(Seq(doc("physics", 100L), doc("physics", 101L)).toDF("doc_id", "source", "text"))
    val model = NaiveBayes.train(train, "source", "text")
    val priors = NaiveBayes.trainPriors(train, "source")
    val empty = Seq((500L, "law", ""), (501L, "cooking", "word")).toDF("doc_id", "source", "text")
    val preds = NaiveBayes.classify(model, priors, empty, "doc_id", "source", "text")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(preds(500L) == "physics", "no evidence -> the largest-prior class")
    // one word -> still zero BIGRAMS -> same prior fallback
    assert(preds(501L) == "physics")
  }

  test("classifyMap == classify label-for-label on 26 classes (incl. empty docs and ties)") {
    // 26 single-letter classes, each with a small distinct vocabulary plus
    // shared filler so buckets overlap across classes; a few bigram-free
    // docs exercise the prior-argmax path in both forms
    val classes = ('a' to 'z').map(_.toString)
    val rows = classes.zipWithIndex.flatMap { case (c, ci) =>
      (0 until 4).map { j =>
        val id = ci * 10L + j
        (id, c, s"term$c$j token$c shared filler words token$c term$c$j")
      }
    } ++ Seq((900L, "a", ""), (901L, "b", "solo"))
    val docs = rows.toDF("doc_id", "source", "text")
    val model = NaiveBayes.train(docs, "source", "text")
    val priors = NaiveBayes.trainPriors(docs, "source")
    def toMapById(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val fanOut = toMapById(NaiveBayes.classify(model, priors, docs, "doc_id", "source", "text"))
    val mapped = toMapById(NaiveBayes.classifyMap(model, priors, docs, "doc_id", "source", "text"))
    assert(fanOut.size == rows.size && mapped.size == rows.size)
    assert(fanOut == mapped, {
      val diff = fanOut.collect { case (k, v) if mapped.get(k) != Some(v) => (k, v, mapped.get(k)) }
      s"pivot-to-map scoring must match the fan-out form; diverged: ${diff.take(5)}"
    })
    // classes a and b tie on prior (5 docs each) -> empty doc resolves to
    // the min class name in BOTH forms
    assert(fanOut(900L)._2 == "a" && mapped(900L)._2 == "a")
  }

  test("a non-default bucket count trains and scores consistently end-to-end") {
    val train = corpus.filter(col("doc_id") < 24)
    val held = corpus.filter(col("doc_id") >= 24)
    val model = NaiveBayes.train(train, "source", "text", buckets = 257L)
    val priors = NaiveBayes.trainPriors(train, "source")
    val preds = NaiveBayes.classify(model, priors, held, "doc_id", "source", "text", buckets = 257L)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(preds.length == 6 && preds.forall(p => p._1 == p._2),
      s"mechanism must be bucket-count independent, got ${preds.toSeq}")
    val predsMap = NaiveBayes.classifyMap(model, priors, held, "doc_id", "source", "text", buckets = 257L)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(predsMap.length == 6 && predsMap.forall(p => p._1 == p._2))
  }

  test("prCurve equals an independent Scala recompute from the scores relation") {
    val train = corpus.filter(col("doc_id") < 24)
    val held = corpus.filter(col("doc_id") >= 24)
    val model = NaiveBayes.train(train, "source", "text")
    val priors = NaiveBayes.trainPriors(train, "source")
    val bw = 512L
    val got = NaiveBayes.prCurve(model, priors, held, "doc_id", "source", "text",
      targetClass = "physics", bandWidth = bw)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    // independent fold over the raw scores
    val sc = NaiveBayes.scores(model, priors, held, "doc_id", "source", "text")
      .select("doc_id", "source", "_cls", "score_q")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val byDoc = sc.groupBy(_._1).toSeq.map { case (id, rows) =>
      val m = rows.filter(_._3 == "physics").map(_._4).max -
        rows.filter(_._3 != "physics").map(_._4).max
      val pos = if (rows.head._2 == "physics") 1L else 0L
      val band = if (m >= 0) m / bw else -((-m + bw - 1) / bw)
      (band, pos)
    }.toSeq
    val nPos = byDoc.map(_._2).sum
    val expected = byDoc.groupBy(_._1).toSeq.sortBy(_._1).map { case (band, ds) =>
      val tp = byDoc.filter(_._1 >= band).map(_._2).sum
      val fp = byDoc.count(_._1 >= band) - tp
      (band, band * bw, tp, fp, 10000 * tp / (tp + fp), 10000 * tp / math.max(nPos, 1L))
    }
    assert(got.toSeq == expected, s"got ${got.toSeq}\nexpected $expected")
    // structural sanity: recall is non-increasing as the threshold rises
    val recalls = got.map(_._6)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a >= b })
    assert(got.head._6 == 10000L || nPos == 0L, "the bottom band keeps every positive")
  }
}

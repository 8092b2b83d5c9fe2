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
}

package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.chunk.Chunkers
import graft.embed.Embedders
import graft.ops.Dedup

/** ScalaCheck properties for the engine's pure kernels (SURVEY.md §5.3):
  * the chunker invariants the reference implies but never tests, plus
  * determinism of the hashed embedding and simhash kernels. */
object ChunkerProps extends Properties("graft.kernels") {

  private val word: Gen[String] = Gen.chooseNum(1, 9)
    .flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
  private val text: Gen[String] = Gen.chooseNum(0, 200)
    .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
  private val messyText: Gen[String] = text.map(_.flatMap {
    case c if c == 'e' => "e " // sprinkle unicode whitespace
    case c => c.toString
  })
  private val size: Gen[Int] = Gen.chooseNum(1, 80)
  private val overlap: Gen[Int] = Gen.chooseNum(-5, 100)

  property("windows are non-empty and bounded by size+40") =
    forAll(messyText, size, overlap) { (t, s, o) =>
      val chunks = Chunkers.splitTextWindows(t, s, o)
      chunks.forall(c => c.nonEmpty && c.length <= s + 40)
    }

  property("windows cover the collapsed text ends") =
    forAll(text, size, overlap) { (t, s, o) =>
      val collapsed = Chunkers.collapseWs(t)
      val chunks = Chunkers.splitTextWindows(t, s, o)
      collapsed.isEmpty == chunks.isEmpty &&
        (chunks.isEmpty ||
          (collapsed.startsWith(chunks.head) && collapsed.endsWith(chunks.last)))
    }

  property("chunking is deterministic") =
    forAll(messyText, size, overlap) { (t, s, o) =>
      Chunkers.splitTextWindows(t, s, o) == Chunkers.splitTextWindows(t, s, o)
    }

  property("token windows preserve all tokens in order when overlap = 0") =
    forAll(text, Gen.chooseNum(1, 50)) { (t, maxTok) =>
      val toks = Chunkers.collapseWs(t).split(' ').filter(_.nonEmpty).toList
      val windows = Chunkers.splitTokenWindows(t, maxTok, 0)
      windows.flatMap(_._1.split(' ')).filter(_.nonEmpty) == toks
    }

  property("embedText is deterministic, unit-norm (or zero), fixed-dim") =
    forAll(text) { t =>
      val a = Embedders.embedText(t)
      val b = Embedders.embedText(t)
      val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
      a.toSeq == b.toSeq && a.length == 64 &&
        (norm == 0.0 || math.abs(norm - 1.0) < 1e-5)
    }

  property("simhash64 is deterministic and case-insensitive") =
    forAll(text) { t =>
      Dedup.simhash64(t) == Dedup.simhash64(t.toUpperCase)
    }

  property("identical texts always share a simhash fingerprint") =
    forAll(text, text) { (a, b) =>
      (Chunkers.collapseWs(a) != Chunkers.collapseWs(b)) ||
        Dedup.simhash64(a) == Dedup.simhash64(b)
    }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** r17 optimization pins for the wave-2 native kernels
  * ([[org.apache.spark.sql.graft.GramHash60]],
  * [[org.apache.spark.sql.graft.WinnowPicks]]): each test replays the OLD
  * relational/higher-order formulation inline and asserts row equality,
  * including the null-text explode shapes the kernels preserve. */
class GramKernelSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val texts: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox jumps over the lazy dog again and again",
    2L -> "the quick brown fox jumps over the lazy dog again and again",
    3L -> "tie tie tie tie tie tie tie tie", // forced hash ties in windows
    4L -> "", 5L -> "  \t ", 6L -> null,
    7L -> "one", 8L -> "one two three four", // fewer grams than the window
    9L -> "İstanbul café 中文 STRASSE mixed case tokens here yes",
    10L -> ("alpha beta gamma delta " * 30).trim)

  private def df: DataFrame = texts.toDF("doc_id", "text")

  /** OLD gram-hash rows: explode k-gram strings, md5-hex, conv. */
  private def oldGramRows(k: Int): DataFrame =
    Dedup.shingles(df, "doc_id", "text", k, distinct = false)
      .select(col("doc_id"), graft.util.Hash.md5Bits60(col("shingle")).as("hv"))

  test("GramHash60 explode equals the old shingle+md5-hex+conv rows") {
    for (k <- Seq(1, 3, 8)) {
      val old = oldGramRows(k)
      val neu = df.select(col("doc_id"), explode(org.apache.spark.sql.graft.GramHash60(
        Dedup.tokensCol(col("text")), k)).as("hv"))
      def sorted(d: DataFrame) =
        d.orderBy(col("doc_id"), col("hv")).collect().toSeq
      assert(old.schema == neu.schema, s"schema drift at k=$k")
      assert(sorted(old) == sorted(neu), s"row drift at k=$k")
    }
  }

  test("Winnow.fingerprints equals the old higher-order selection") {
    // the OLD formulation, verbatim from pre-r17 Winnow.fingerprints
    def oldFingerprints(k: Int, w: Int): DataFrame = {
      val gramHash = (g: String) =>
        s"CAST(conv(substring(md5($g), 1, 15), 16, 10) AS BIGINT)"
      val toksExpr =
        s"split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' ')"
      def gramsExpr(ts: String) =
        s"""IF(size($ts) >= $k,
           |  transform(sequence(0, size($ts) - $k), i -> ${gramHash(s"array_join(slice($ts, i + 1, $k), ' ')")}),
           |  array(${gramHash(s"array_join($ts, ' ')")}))""".stripMargin
      def selExpr(g: String) =
        s"""transform(
           |  array_distinct(transform(
           |    sequence(0, size($g) - least($w, size($g))),
           |    j -> j + array_max(filter(transform(sequence(0, least($w, size($g)) - 1),
           |      t -> IF(element_at($g, j + t + 1) =
           |              array_min(slice($g, j + 1, least($w, size($g)))), t, -1)),
           |      x -> x >= 0)))),
           |  p -> struct(CAST(p AS BIGINT) AS pos, element_at($g, p + 1) AS fp))""".stripMargin
      val let =
        s"""element_at(transform(
           |  array(element_at(transform(array($toksExpr), ts -> ${gramsExpr("ts")}), 1)),
           |  g -> ${selExpr("g")}), 1)""".stripMargin
      df.select(col("doc_id"), explode(expr(let)).as("_s"))
        .select(col("doc_id"), col("_s.pos").as("pos"), col("_s.fp").as("fp"))
    }
    for ((k, w) <- Seq((5, 4), (1, 1), (2, 7))) {
      val old = oldFingerprints(k, w)
      val neu = graft.ops.Winnow.fingerprints(df, "doc_id", "text", k, w)
      def sorted(d: DataFrame) =
        d.orderBy(col("doc_id"), col("pos"), col("fp")).collect().toSeq
      assert(sorted(old) == sorted(neu), s"pick drift at k=$k w=$w")
    }
  }

  test("null text keeps the old explode shapes") {
    val nulls = Seq((1L, null: String)).toDF("doc_id", "text")
    // gram kernel: one (id, NULL) row, as the old null-shingle explode
    val g = nulls.select(col("doc_id"), explode(org.apache.spark.sql.graft.GramHash60(
      Dedup.tokensCol(col("text")), 3)).as("hv")).collect()
    assert(g.length == 1 && g(0).isNullAt(1))
    // winnow kernel: one (id, NULL, NULL) pick row
    val p = graft.ops.Winnow.fingerprints(nulls, "doc_id", "text").collect()
    assert(p.length == 1 && p(0).isNullAt(1) && p(0).isNullAt(2))
  }
}

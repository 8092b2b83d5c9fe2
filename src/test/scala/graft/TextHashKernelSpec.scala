package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** r17 optimization pins: the native fused text-hash kernels
  * ([[org.apache.spark.sql.graft.MinhashFeatures]],
  * [[org.apache.spark.sql.graft.SimhashFp]]) must reproduce the prior
  * relational md5-hex/conv formulations bit-for-bit — the DuckDB oracles
  * replay those formulations, so any divergence here is a correctness
  * regression, not a performance trade. Each test evaluates the OLD SQL
  * chain inline (it no longer exists in src/main) against the new kernel
  * over an adversarial corpus: nulls, empty/whitespace-only text, tokens
  * shorter than k, exact-k, unicode case mapping, exotic whitespace the
  * Java \s class does and does not match, control chars SQL trim must NOT
  * strip, and duplicate ids that exercise the per-id merge. */
class TextHashKernelSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val texts: Seq[(Long, String)] = Seq(
    1L -> "alpha beta gamma delta epsilon",
    2L -> "alpha beta gamma delta epsilon", // exact dup of 1
    3L -> "Alpha  BETA\tgamma\n delta", // case + mixed whitespace
    4L -> "", // empty: single "" token, one shingle md5("")
    5L -> "   \t\n  ", // whitespace-only: collapses to "" too
    6L -> null, // null text
    7L -> "one", // fewer tokens than k
    8L -> "one two", // still fewer than k=3
    9L -> "one two three", // exactly k
    10L -> "İstanbul STRASSE ﬁ ÅNGSTRÖM", // unicode lowercase expansion
    11L -> "café naïve 中文 рус", // accents + CJK + cyrillic
    12L -> "a b c", // NBSP is NOT \s: stays inside a token
    13L -> "bellchar x y", // control char: not \s, not trimmed by SQL trim
    14L -> " lead control after space", // collapse leaves  token
    15L -> "repeat repeat repeat repeat repeat repeat",
    16L -> ("lorem ipsum dolor sit amet " * 40).trim,
    17L -> "  leading and trailing  ",
    18L -> "tab\tsep\ttokens\tonly",
    19L -> "x", // single char
    20L -> "UPPER lower MiXeD 123 #$% عربى")
  // duplicate id with different text: exercises the groupBy merge path
  private val dupIdRows = Seq(21L -> "first text of twenty one",
    21L -> "second text of twenty one differs")

  private def df: DataFrame =
    (texts ++ dupIdRows).toDF("doc_id", "text")

  /** The OLD relational shingle pipeline, verbatim from the pre-r17
    * Dedup.minhashSignatures / fusedSigAndSets. */
  private def oldShingleWords(k: Int): DataFrame = {
    val exploded = df.select(col("doc_id"), Dedup.tokensCol(col("text")).as("toks"))
      .select(col("doc_id"), explode(
        when(size(col("toks")) >= k,
          expr(s"transform(sequence(0, size(toks) - $k), i -> array_join(slice(toks, i + 1, $k), ' '))"))
          .otherwise(array(array_join(col("toks"), " ")))).as("shingle"))
    exploded.select(col("doc_id"), md5(col("shingle")).as("_d"))
      .select(col("doc_id"),
        graft.util.Hash.bits60OfHex(col("_d")).as("m1"),
        graft.util.Hash.bits56OfHex(col("_d")).as("m2"))
  }

  private def collectSorted(d: DataFrame): Seq[Row] = d.orderBy("doc_id").collect().toSeq
  private type Row = org.apache.spark.sql.Row

  test("minhashSignatures equals the old explode+md5-hex+conv formulation") {
    for (k <- Seq(1, 3, 5); numHashes <- Seq(1, 16)) {
      val hashed = oldShingleWords(k)
      val aggs = (0 until numHashes).map(i =>
        min(col("m1") + lit(i.toLong) * col("m2")).as(s"h$i"))
      val old = hashed.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      val neu = Dedup.minhashSignatures(df, "doc_id", "text", k, numHashes)
      assert(old.schema == neu.schema, s"schema drift at k=$k n=$numHashes")
      assert(collectSorted(old) == collectSorted(neu), s"value drift at k=$k n=$numHashes")
    }
  }

  test("kernel sh field equals sort_array(collect_set(m1)) of the old pipeline") {
    val k = 3
    val old = oldShingleWords(k).groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("m1"))).as("sh"))
    val neu = df.select(col("doc_id"),
        org.apache.spark.sql.graft.MinhashFeatures(col("text"), k, 0, withSet = true).as("_mh"))
      .select(col("doc_id"), col("_mh.sh").as("_shr"))
      .groupBy(col("doc_id"))
      .agg(sort_array(array_distinct(flatten(collect_list(col("_shr"))))).as("sh"))
    val o = collectSorted(old).map(r => r.getLong(0) -> r.getSeq[Long](1))
    val n = collectSorted(neu).map(r => r.getLong(0) -> r.getSeq[Long](1))
    assert(o == n)
  }

  test("simhash equals the old 64-sum relational formulation (and simhash64)") {
    // the OLD formulation, verbatim from pre-r17 Dedup.simhash
    val keyed = df.select(col("doc_id"), col("text").as("_text"))
      .withColumn("_rk", graft.util.Hash.md5Bits60(coalesce(col("doc_id").cast("string"), lit(""))))
      .withColumn("_rk2", graft.util.Hash.md5Bits56(coalesce(col("_text"), lit(""))))
    val toks = keyed.select(col("_rk"), col("_rk2"), explode(Dedup.tokensCol(col("_text"))).as("tok"))
      .filter(col("tok") =!= "")
    val hashed = toks.select(col("_rk"), col("_rk2"), md5(col("tok")).as("_d"))
      .select(col("_rk"), col("_rk2"),
        graft.util.Hash.bits60OfHex(col("_d")).as("m1"),
        graft.util.Hash.bits56OfHex(col("_d")).as("m2"))
    val aggs = (0 until 64).map { b =>
      val bit = if (b < 60) s"(m1 >> $b) & 1" else s"(m2 >> ${b - 60}) & 1"
      sum(expr(bit)).as(s"a$b")
    } :+ count(lit(1)).as("ntok")
    val acc = hashed.groupBy(col("_rk"), col("_rk2")).agg(aggs.head, aggs.tail: _*)
    val fpExpr = (0 until 63).map(b => s"(case when 2 * a$b > ntok then ${1L << b}L else 0L end)")
      .mkString(" + ") + " + (case when 2 * a63 > ntok then -9223372036854775808L else 0L end)"
    def bandExpr(hi: Int): String =
      (0 until 16).map(j => s"(case when 2 * a${hi + j} > ntok then ${1 << j} else 0 end)").mkString(" + ")
    val fp = acc.select(col("_rk"), col("_rk2"), expr(fpExpr).as("simhash"),
      expr(s"int(${bandExpr(48)})").as("band0"), expr(s"int(${bandExpr(32)})").as("band1"),
      expr(s"int(${bandExpr(16)})").as("band2"), expr(s"int(${bandExpr(0)})").as("band3"))
    val old = keyed.select(col("_rk"), col("_rk2"), col("doc_id")).join(fp, Seq("_rk", "_rk2"), "left")
      .select(col("doc_id"), coalesce(col("simhash"), lit(0L)).as("simhash"),
        coalesce(col("band0"), lit(0)).as("band0"), coalesce(col("band1"), lit(0)).as("band1"),
        coalesce(col("band2"), lit(0)).as("band2"), coalesce(col("band3"), lit(0)).as("band3"))

    val neu = Dedup.simhash(df, "doc_id", "text")
    assert(old.schema == neu.schema)
    // order rows by (doc_id, simhash): duplicate id 21 has two distinct rows
    def sorted(d: DataFrame) = d.orderBy("doc_id", "simhash").collect().toSeq
    assert(sorted(old) == sorted(neu))
    // and the pure-Scala twin agrees on non-degenerate rows
    for ((id, t) <- texts if t != null && t.trim.nonEmpty) {
      val got = neu.filter(col("doc_id") === id).select("simhash").head().getLong(0)
      assert(got == Dedup.simhash64(t), s"simhash64 twin drift on doc $id")
    }
  }

  test("Md5Word equals the conv(substring(md5)) hex-slice chain") {
    val vals = df.select(col("doc_id"), coalesce(col("text"), lit("")).as("v"))
    for ((s, n) <- Seq((0, 15), (16, 14), (0, 8), (8, 8), (16, 8), (24, 8), (31, 1))) {
      val old = vals.select(col("doc_id"),
        conv(substring(md5(col("v")), s + 1, n), 16, 10).cast("long").as("w"))
      val neu = vals.select(col("doc_id"),
        org.apache.spark.sql.graft.Md5Word(col("v"), s, n).as("w"))
      assert(collectSorted(old) == collectSorted(neu), s"md5Word drift at ($s, $n)")
    }
    // string-cast numeric input, the call-site idiom (md5 itself accepts
    // only string/binary — Md5Word inherits exactly that implicit-cast rule)
    val longs = spark.range(100).select(col("id"), col("id").cast("string").as("s"))
    val oldL = longs.select(col("id"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("w"))
    val neuL = longs.select(col("id"), org.apache.spark.sql.graft.Md5Word(col("s"), 0, 15).as("w"))
    assert(oldL.orderBy("id").collect().toSeq == neuL.orderBy("id").collect().toSeq)
    // null input stays null
    val nulls = Seq((1L, null: String)).toDF("doc_id", "v")
    assert(nulls.select(org.apache.spark.sql.graft.Md5Word(col("v"), 0, 15)).head().isNullAt(0))
  }

  test("coherentSample keeps its membership rule under the fused kernel") {
    // h0 == min over shingles of m1: derive it from the old pipeline and
    // replay the same pmod membership — the sampled id set must match.
    val k = 3
    val n = df.count()
    val m = math.max(1L, n / 4)
    val oldIds = oldShingleWords(k).groupBy(col("doc_id")).agg(min(col("m1")).as("_h0"))
      .filter(pmod(col("_h0"), lit(m)) === 0L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val neuIds = Dedup.coherentSample(df, "doc_id", "text", k, budgetDocs = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(oldIds == neuIds)
  }
}

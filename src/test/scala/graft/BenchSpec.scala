package graft

import org.scalatest.funsuite.AnyFunSuite

class BenchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("timePreps records -1 for a failed prep, elapsed seconds for a good one") {
    var ran = 0
    val out = Bench.timePreps(spark, "unused-dir", Map(
      "good" -> ((_, _) => { ran += 1; () }),
      "bad" -> ((_, _) => sys.error("synthetic prep failure"))))
    assert(ran == 1, "good prep executed")
    assert(out("good") >= 0.0, "successful prep reports its elapsed time")
    assert(out("bad") == -1.0,
      "failed prep must report -1 (failed-query convention), not its time-to-failure — " +
        "otherwise a broken index build masquerades as a fast prep while the query " +
        "silently re-times the build")
  }

  test("every bench anchor names a real query (BASELINE.md and SparkEntry stay in sync)") {
    val unknown = BenchAnchors.Sf01.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty,
      s"anchors without a matching query (renamed or removed?): ${unknown.mkString(", ")}")
  }

  test("drift ratios: whole-run and median vs anchors; failed and un-anchored rows excluded") {
    // q1_agg anchor 0.45 (re-pinned r15), jats_parse anchor 0.14 —
    // measured at exactly 2x and 4x; a failed row (-1) and a query with
    // no anchor must not skew it
    val (whole, median) = Bench.drift(Map(
      "q1_agg" -> 0.90, "jats_parse" -> 0.56,
      "bib_scan" -> -1.0, "some_new_query" -> 99.0))
    assert(math.abs(whole - (0.90 + 0.56) / (0.45 + 0.14)) < 1e-9)
    assert(math.abs(median - 3.0) < 1e-9, "median of (2x, 4x) is 3x")
    assert(Bench.drift(Map("no_anchor" -> 1.0)) == ((-1.0, -1.0)),
      "nothing anchored measured -> sentinel, not a crash")
  }

  test("bench JSON persists to a file, parses, and covers every query with drift fields") {
    // the r6 failure mode: the driver's console capture clipped 40/105
    // per-query rows. The file is the durable record — synthesize a result
    // for EVERY SparkEntry query, render, write, parse back with Jackson.
    val results = SparkEntry.queries.keySet.map(_ -> 0.5).toMap
    val preps = Map("dedup_incremental_indexed" -> 1.0)
    val json = Bench.renderJson(results, preps, "/root/testdata/sf0.1")
    val path = java.nio.file.Files.createTempDirectory("graft_bench_local")
      .resolve("BENCH_LOCAL.json").toString
    Bench.writeLocal(json, path)
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    assert(root.get("metric").asText() == "total")
    val qs = root.get("queries")
    SparkEntry.queries.keySet.foreach(n =>
      assert(qs.has(n) && qs.get(n).isNumber, s"query $n missing from the persisted bench JSON"))
    assert(root.get("prep").get("dedup_incremental_indexed").asDouble() == 1.0)
    assert(root.get("drift_whole_run").asDouble() > 0.0, "sf0.1 run self-reports drift")
    assert(root.get("drift_median").asDouble() > 0.0)
    // a non-anchored scale factor must NOT report drift against sf0.1 anchors
    val other = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Bench.renderJson(results, preps, "/root/testdata/sf0.01"))
    assert(other.get("drift_whole_run").asDouble() == -1.0)
    // basename match, not suffix match: .../not-sf0.1 is NOT the anchored dir
    val sneaky = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Bench.renderJson(results, preps, "/root/testdata/not-sf0.1"))
    assert(sneaky.get("drift_whole_run").asDouble() == -1.0,
      "a dir merely ENDING in sf0.1 must not report drift vs the sf0.1 anchors")
    // a path containing JSON-hostile characters must still render valid JSON
    val hostile = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Bench.renderJson(results, preps, """/tmp/we"ird\dir"""))
    assert(hostile.get("sf").asText() == """/tmp/we"ird\dir""")
  }

  test("anchor_gaps lists the anchors<->queries symmetric difference in the JSON line") {
    // every gap entry is labeled; with the table in sync the field is empty.
    // The drift denominators silently shrink for any query_without_anchor
    // row, so the gap list is the tripwire that keeps the table current.
    val gaps = Bench.anchorGaps
    val unanchored = SparkEntry.queries.keySet -- BenchAnchors.Sf01.keySet
    val orphans = BenchAnchors.Sf01.keySet -- SparkEntry.queries.keySet
    assert(gaps.size == unanchored.size + orphans.size)
    unanchored.foreach(n => assert(gaps.contains(s"query_without_anchor:$n")))
    orphans.foreach(n => assert(gaps.contains(s"anchor_without_query:$n")))
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Bench.renderJson(Map("q1_agg" -> 0.5), Map(), "/root/testdata/sf0.1"))
    val arr = root.get("anchor_gaps")
    assert(arr.isArray && arr.size() == gaps.size,
      "the JSON line carries every gap entry")
  }
}

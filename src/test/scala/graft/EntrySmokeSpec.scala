package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the driver's t1 smoke: entry + every declared query must run and
  * return rows at sf0.001, and every oracle key must name a real query. */
class EntrySmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle keys without queries: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs and returns rows at sf0.001") {
      val df = fn(spark, TestSpark.sf0001)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  // the audit-only plan builders (capped dedup/LSH variants in the per-round
  // plan dump) must at least ANALYZE — a silent "explain failed" in the dump
  // would drop them from the round's plan audit without anyone noticing
  Explain.auditPlans.foreach { case (name, fn) =>
    test(s"audit plan $name analyzes at sf0.001") {
      assert(fn(spark, TestSpark.sf0001).schema.nonEmpty)
    }
  }
}

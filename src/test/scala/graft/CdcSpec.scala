package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Cdc

class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val v1 = Seq(
    (1L, "alpha", "s0"), (2L, "beta", "s0"), (3L, "gamma", "s1"), (4L, "delta", "s1")
  ).toDF("id", "text", "source")

  private lazy val v2 = Seq(
    (1L, "alpha", "s0"),          // unchanged
    (2L, "beta EDITED", "s0"),    // updated text
    (3L, "gamma", "s9"),          // updated source
    (5L, "epsilon", "s2")         // inserted; 4 deleted
  ).toDF("id", "text", "source")

  test("diff classifies I/U/D and is silent on unchanged rows") {
    val d = Cdc.diff(v1, v2, Seq("id"), Seq("text", "source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(2L -> "U", 3L -> "U", 4L -> "D", 5L -> "I"))
  }

  test("value digest is length-prefixed: shifting a boundary between columns is a change") {
    val a = Seq((1L, "ab", "c")).toDF("id", "x", "y")
    val b = Seq((1L, "a", "bc")).toDF("id", "x", "y")
    val d = Cdc.diff(a, b, Seq("id"), Seq("x", "y")).collect()
    assert(d.length == 1 && d(0).getString(1) == "U")
    // and null is distinct from empty string
    val n1 = Seq((1L, Option.empty[String])).toDF("id", "x")
    val n2 = Seq((1L, Option(""))).toDF("id", "x")
    assert(Cdc.diff(n1, n2, Seq("id"), Seq("x")).count() == 1)
    assert(Cdc.diff(n1, n1, Seq("id"), Seq("x")).count() == 0)
  }

  test("applyChanges(v1, diff-with-payload) reproduces v2 exactly") {
    val d = Cdc.diff(v1, v2, Seq("id"), Seq("text", "source"))
    val batch = d.join(v2, Seq("id"), "left")
      .select(col("id"), col("text"), col("source"), col("op"))
    val merged = Cdc.applyChanges(v1, batch, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val want = v2.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(merged.toSeq == want.toSeq)
  }

  test("empty diff leaves the base untouched and an all-delete batch empties it") {
    assert(Cdc.diff(v1, v1, Seq("id"), Seq("text", "source")).count() == 0)
    val wipe = v1.select(col("id"), col("text"), col("source"), lit("D").as("op"))
    assert(Cdc.applyChanges(v1, wipe, Seq("id")).count() == 0)
  }

  test("applyToTable commits one generation per batch and re-applying is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_gen").toString
    val g0 = graft.io.GenTable.replace(spark, root, v1)
    val d = Cdc.diff(v1, v2, Seq("id"), Seq("text", "source"))
    val batch = d.join(v2, Seq("id"), "left")
      .select(col("id"), col("text"), col("source"), col("op"))
      .localCheckpoint() // one fixed batch relation for both applies
    def state() = graft.io.GenTable.read(spark, root).get
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val g1 = Cdc.applyToTable(spark, root, batch, Seq("id"))
    assert(g1 > g0, "each apply commits a new generation")
    val want = v2.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(state() == want, "post-batch table IS v2")
    // at-least-once delivery: the same batch again changes nothing
    val g2 = Cdc.applyToTable(spark, root, batch, Seq("id"))
    assert(g2 > g1 && state() == want, "re-applying the batch is a no-op on content")
    // a missing table refuses rather than conjuring an empty base
    intercept[IllegalStateException](
      Cdc.applyToTable(spark, root + "_absent", batch, Seq("id")))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingIngest
import graft.io.Tables

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming tumbling windows match the batch formulation exactly") {
    val stream = StreamingIngest.runTumbling(spark, TestSpark.sf0001, "t_tumbling_spec")
      .select("win_start_s", "event_type", "n")
      .orderBy("win_start_s", "event_type")
      .collect().map(_.toSeq).toList
    val batch = Tables.events(spark, TestSpark.sf0001)
      .withColumn("win_start_s", expr("(ts_us div 3600000000L) * 3600"))
      .groupBy(col("win_start_s"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("win_start_s", "event_type")
      .collect().map(_.toSeq).toList
    assert(stream == batch)
  }

  test("streaming session windows sessionize per user") {
    val out = StreamingIngest.runSessionWindows(spark, TestSpark.sf0001, "t_sessions_spec")
    assert(out.count() > 0)
    val agg = out.groupBy("user_id").agg(sum("n_events").as("total"))
    val events = Tables.events(spark, TestSpark.sf0001).groupBy("user_id").count()
    val joined = agg.join(events, "user_id")
      .filter(col("total") =!= col("count")).count()
    assert(joined == 0, "every event lands in exactly one session")
  }

  test("foreachBatch upsert stream converges and is idempotent across replays") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val target = s"$tmp/table"
    StreamingIngest.runUpsertStream(spark, TestSpark.sf0001, target, s"$tmp/ckpt1")
    val count1 = spark.read.parquet(target).count()
    // replay with a fresh checkpoint: same deterministic keys → same table
    StreamingIngest.runUpsertStream(spark, TestSpark.sf0001, target, s"$tmp/ckpt2")
    val count2 = spark.read.parquet(target).count()
    assert(count1 == count2)
    assert(count1 == Tables.events(spark, TestSpark.sf0001).select("event_id").distinct().count())
  }
}

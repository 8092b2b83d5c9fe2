package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Tables

/** Schema-drift armor for the driver-regenerated testdata: the r9 round
  * broke because `events.ts` changed physical encoding (int64 nanos →
  * TIMESTAMP(MICROS) NTZ) out from under a fixed projection. These cases
  * pin the loaders' contract: WHATEVER encoding the generator ships —
  * wall-clock NTZ micros, UTC-instant timestamps, or raw epoch-nanos
  * longs — the loaded values are identical.
  */
class TablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** One logical dataset (event_id, wall-clock second) written under each
    * physical ts encoding, each in its own dir as `<name>.parquet`. */
  private def writeEncodings(name: String, tsCol: String): Map[String, String] = {
    val base = java.nio.file.Files.createTempDirectory(s"graft_enc_$name").toString
    val rows = Seq((1L, "2024-03-01 10:00:00"), (2L, "2024-03-02 11:30:45"), (3L, "2024-03-03 23:59:59"))
      .toDF("event_id", "wall")
    val ntz = rows.withColumn(tsCol, to_timestamp_ntz(col("wall"))).drop("wall")
    val instant = rows.withColumn(tsCol, to_timestamp(col("wall"))).drop("wall")
    val nanos = rows.withColumn(tsCol, (unix_micros(to_timestamp(col("wall"))) * 1000L)).drop("wall")
    Map("ntz" -> ntz, "instant" -> instant, "nanos" -> nanos).map { case (enc, df) =>
      val dir = s"$base/$enc"
      df.coalesce(1).write.parquet(s"$dir/$name.parquet")
      enc -> dir
    }
  }

  test("events loads identical ts_us from NTZ, instant, and epoch-nanos encodings") {
    val dirs = writeEncodings("events", "ts")
    val loaded = dirs.map { case (enc, dir) =>
      val df = Tables.events(spark, dir)
      assert(df.schema("ts").dataType == TimestampType, s"$enc: ts normalizes to an instant")
      assert(df.schema("ts_us").dataType == LongType)
      enc -> df.select("event_id", "ts_us").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(loaded.values.toSet.size == 1,
      s"all encodings must load the same micros: $loaded")
    // and the values are the actual wall-clock micros (UTC)
    assert(loaded("ntz").contains((1L, java.time.Instant.parse("2024-03-01T10:00:00Z").getEpochSecond * 1000000L)))
  }

  test("a DATE-encoded l_shipdate normalizes to midnight NTZ") {
    val base = java.nio.file.Files.createTempDirectory("graft_enc_date").toString
    Seq((1L, "2024-03-01"), (2L, "2024-03-02"))
      .toDF("event_id", "wall")
      .withColumn("l_shipdate", to_date(col("wall"))).drop("wall")
      .coalesce(1).write.parquet(s"$base/lineitem.parquet")
    val df = Tables.lineitem(spark, base)
    assert(df.schema("l_shipdate").dataType == TimestampNTZType)
    val got = df.select(col("l_shipdate").cast("string")).collect().map(_.getString(0)).toSet
    assert(got == Set("2024-03-01 00:00:00", "2024-03-02 00:00:00"))
  }

  test("a non-float32 embedding column fails loudly at the loader with a diagnosis") {
    val base = java.nio.file.Files.createTempDirectory("graft_enc_emb").toString
    Seq((1L, Seq(0.5d, 0.25d)))
      .toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$base/embeddings.parquet")
    val e = intercept[IllegalArgumentException] { Tables.embeddings(spark, base) }
    assert(e.getMessage.contains("ARRAY<FLOAT>") && e.getMessage.contains("hash parity"),
      s"guard message must diagnose the drift, got: ${e.getMessage}")
  }

  test("lineitem normalizes l_shipdate to TIMESTAMP_NTZ under every encoding") {
    val dirs = writeEncodings("lineitem", "l_shipdate")
    val loaded = dirs.map { case (enc, dir) =>
      val df = Tables.lineitem(spark, dir)
      assert(df.schema("l_shipdate").dataType == TimestampNTZType,
        s"$enc: l_shipdate must come out NTZ for the wall-clock literal comparisons")
      // the q1-style literal filter keeps working whatever the encoding
      val n = df.filter(expr("l_shipdate < TIMESTAMP_NTZ '2024-03-03 00:00:00'")).count()
      assert(n == 2, s"$enc: literal filter selected $n rows")
      enc -> df.select(col("event_id"), col("l_shipdate").cast("string"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    }
    assert(loaded.values.toSet.size == 1, s"all encodings must agree: $loaded")
  }
}

package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DateType, FloatType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All time logic downstream runs on `ts_us` (microseconds since epoch,
  * BIGINT). The driver's testdata generator has shipped `events.ts` under
  * several physical types across rounds — INT64 TIMESTAMP(NANOS) (read as
  * raw long via the nanosAsLong legacy flag), plain int64 epoch-nanos, and
  * most recently `timestamp[us]` without UTC adjustment (read by Spark as
  * TIMESTAMP_NTZ). Ingestion is therefore schema-adaptive: whatever the
  * physical type, `ts_us` comes out as epoch-micros BIGINT and `ts` as a
  * session-UTC TimestampType instant, matching DuckDB's `epoch_us(ts)`
  * (the correctness oracle) bit-for-bit. Sessions pin
  * `spark.sql.session.timeZone=UTC`, so the NTZ→instant cast is exact.
  */
object Tables {

  /** Epoch-micros projection of a `ts` column, adaptive to its type. */
  private[graft] def tsToMicros(dt: DataType, ts: Column): Column = dt match {
    case TimestampType    => unix_micros(ts)
    case TimestampNTZType => unix_micros(ts.cast(TimestampType)) // exact under UTC session tz
    case DateType         => unix_micros(ts.cast(TimestampType)) // midnight UTC
    case LongType         => call_function("div", ts, lit(1000L)) // legacy nanos-as-long
    case other => throw new IllegalArgumentException(s"unsupported ts type: $other")
  }

  /** TIMESTAMP_NTZ projection of a time column, adaptive to its physical
    * encoding — the same drift armor as [[tsToMicros]] for columns the
    * queries compare against wall-clock literals (`l_shipdate <
    * TIMESTAMP_NTZ '...'`). All conversions are exact under the pinned
    * UTC session timezone. */
  private[graft] def toNtz(dt: DataType, c: Column): Column = dt match {
    case TimestampNTZType => c
    case TimestampType    => c.cast(TimestampNTZType)
    case DateType         => c.cast(TimestampNTZType) // midnight wall clock
    case LongType         => timestamp_micros(call_function("div", c, lit(1000L)))
      .cast(TimestampNTZType)
    case other => throw new IllegalArgumentException(s"unsupported time type: $other")
  }

  /** Normalize the named time columns (if present) to TIMESTAMP_NTZ; a
    * column already NTZ passes through with NO added projection. */
  private def normalizedNtz(df: DataFrame, names: String*): DataFrame =
    names.filter(df.columns.contains(_)).foldLeft(df) { (d, n) =>
      d.schema(n).dataType match {
        case TimestampNTZType => d
        case dt               => d.withColumn(n, toNtz(dt, col(n)))
      }
    }
  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // lineitem/orders/events carry INT64 TIMESTAMP(NANOS) columns
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path(dir, name))
  }

  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")

  /** The engine's vector contract is float32 (`ARRAY<FLOAT>`): the typed
    * encoders (Pq), the native cosine expression, and EVERY vector oracle's
    * `::DOUBLE` replay assume float-representable values. A regenerated
    * testdata shipping doubles would silently diverge from the oracles (a
    * float cast here ≠ DuckDB reading raw doubles), so drift fails LOUDLY
    * at the loader with a diagnosis instead of 16 cryptic per-query errors
    * — the r9 events-ts lesson applied to the vector column. */
  def embeddings(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "embeddings")
    df.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => df
      case other => throw new IllegalArgumentException(
        s"embeddings.embedding arrived as $other; the engine contract is ARRAY<FLOAT> " +
          "(float32). If the testdata generator changed encoding, extend Tables.embeddings " +
          "AND the vector oracle fragments together — a one-sided cast breaks hash parity.")
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame =
    normalizedNtz(load(spark, dir, "lineitem"), "l_shipdate")
  def orders(spark: SparkSession, dir: String): DataFrame =
    normalizedNtz(load(spark, dir, "orders"), "o_orderdate")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")

  /** events with `ts_us` (micros, long) and `ts` (TimestampType, micros). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw
      .withColumn("ts_us", tsToMicros(raw.schema("ts").dataType, col("ts")))
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }
}

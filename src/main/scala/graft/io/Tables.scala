package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All time logic downstream runs on `ts_us` (microseconds since epoch,
  * BIGINT): the driver wrote `events.ts` as INT64 TIMESTAMP(NANOS) parquet,
  * which Spark 4 refuses by default and DuckDB (the correctness oracle)
  * truncates to microseconds at read time. Reading the raw nanos as a long
  * and flooring to micros gives bit-identical semantics in both engines.
  */
object Tables {
  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // lineitem/orders/events carry INT64 TIMESTAMP(NANOS) columns
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path(dir, name))
  }

  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")

  /** events with `ts_us` (micros, long) and `ts` (TimestampType, micros). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    load(spark, dir, "events")
      .withColumn("ts_us", expr("ts div 1000L"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }
}

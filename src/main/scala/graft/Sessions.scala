package graft

import org.apache.spark.sql.SparkSession

/** Session factory encoding the engine's deployment posture.
  *
  * Local mode gets core-matched shuffle partitions; cluster mode leans on
  * AQE to coalesce/split at runtime (initial partition count high, skew
  * join on) — the settings that matter when the same plans run against
  * 100 TB on 1000 executors instead of test parquet on local[32].
  */
object Sessions {

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    base(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .getOrCreate()

  /** Cluster posture (master comes from spark-submit): AQE owns partition
    * counts, skew joins split automatically, scans target ~256 MiB splits. */
  def cluster(): SparkSession =
    base(null)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128m")
      .config("spark.sql.files.maxPartitionBytes", "256m")
      .config("spark.sql.shuffle.partitions", "2000")
      .getOrCreate()

  private def base(master: String): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName("graft")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (master != null) b.master(master) else b
  }
}

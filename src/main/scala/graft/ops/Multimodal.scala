package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star extension): image/audio/video as
  * opaque `binary` payloads plus typed metadata, with decode / feature
  * extraction as batched per-partition transforms.
  *
  * No media codecs exist in this container, so the decode step is a
  * clearly-marked deterministic STUB ([[stubDecode]]) — the Spark-side
  * contract (schema, binary column handling, mapPartitions batch shape,
  * partition-parallel decode with no shuffle) is the real, tested part. At
  * scale this is exactly the shape a real decoder plugs into: one
  * `mapPartitions` over (id, payload) batches, executor-local libraries,
  * output schema fixed up front.
  */
object Multimodal {

  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false)))

  /** STUB decoder: derives deterministic fake media properties from the
    * payload bytes. A real build replaces the body with an image/audio
    * library call; the signature and batch shape stay identical. */
  def stubDecode(payload: Array[Byte]): (Int, Int, Int, Int) = {
    val n = payload.length
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < math.min(n, 64)) { h ^= payload(i); h *= 0x100000001b3L; i += 1 }
    val width = 32 + java.lang.Math.floorMod(h, 1024L).toInt
    val height = 32 + java.lang.Math.floorMod(h >>> 17, 1024L).toInt
    val frames = 1 + java.lang.Math.floorMod(h >>> 34, 240L).toInt
    (width, height, frames, 16000)
  }

  /** Attach a binary payload column (UTF-8 text bytes stand in for media
    * blobs in the fixture data) — the storage contract for multimodal rows:
    * payloads are opaque bytes, never strings, never parsed by Catalyst. */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Decode/feature-extract over payload batches: one `mapPartitions`, no
    * shuffle, executor-parallel — the multimodal analogue of the batched
    * embedding map (SURVEY.md §2.7 V1). */
  def decodeMeta(withPayloads: DataFrame): DataFrame = {
    val spark = withPayloads.sparkSession
    import spark.implicits._
    withPayloads.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.grouped(64).flatMap { batch =>
          batch.map { case (id, payload) =>
            val (w, h, f, sr) = stubDecode(payload)
            (id, payload.length.toLong, w, h, f, sr)
          }
        }
      }
      .toDF("media_id", "n_bytes", "width", "height", "n_frames", "sample_rate")
  }

  /** Resize plan: aspect-preserving fit of each (width, height) into a
    * target box, plus letterbox offsets — the integer geometry a real
    * resizer executes per image, computed as pure expressions so the plan
    * (like the decode stub's schema contract) is testable without codecs.
    * Scale factor is applied in exact integer arithmetic:
    * out_w = max(1, w*target/max(w,h)) etc., centered offsets. */
  def resizePlan(meta: DataFrame, targetW: Int, targetH: Int): DataFrame =
    meta
      .withColumn("out_w", // fit by the limiting dimension, exact integer scale
        greatest(lit(1), when(col("width") * targetH >= col("height") * targetW,
          lit(targetW)).otherwise(expr(s"int((width * ${targetH}L) div height)"))))
      .withColumn("out_h",
        greatest(lit(1), when(col("width") * targetH >= col("height") * targetW,
          expr(s"int((height * ${targetW}L) div width)")).otherwise(lit(targetH))))
      .withColumn("pad_x", ((lit(targetW) - col("out_w")) / 2).cast("int"))
      .withColumn("pad_y", ((lit(targetH) - col("out_h")) / 2).cast("int"))

  /** Frame sampling plan for video-like payloads: every `stride`-th frame
    * index, capped — pure expression logic over the decoded metadata. */
  def frameSamplePlan(meta: DataFrame, stride: Int = 10, maxFrames: Int = 8): DataFrame =
    meta.withColumn("sampled_frames",
      // guard n_frames <= 0 (a real decoder can report it; sequence with a
      // negative stop throws) — still images sample an empty frame list
      when(col("n_frames") <= 0, expr("array()"))
        .otherwise(expr(s"transform(sequence(0, least(n_frames - 1, ${stride * (maxFrames - 1)}), $stride), i -> i)")))
      .select(col("media_id"), col("n_frames"), col("sampled_frames"),
        size(col("sampled_frames")).as("n_sampled"))
}

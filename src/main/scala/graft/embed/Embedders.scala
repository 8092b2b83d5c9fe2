package graft.embed

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.chunk.Chunkers

/** Batched embedding map (SURVEY.md §2.7 V1).
  *
  * The reference embeds chunk texts in batches against sentence-transformers
  * or OpenAI (embeddings/embedders.py:11-74); neither exists on an offline
  * JVM, so the `hf`/`openai` backends are replaced by a deterministic seeded
  * hashing projection (documented divergence, SURVEY.md §7): token + bigram
  * features hashed into a fixed-dim signed bag, L2-normalized. The Spark
  * plumbing is the real thing the reference's batching maps to:
  * `mapPartitions` + `iter.grouped(batchSize)` keeps vectorized-inference
  * batch shape explicit, and partition-parallelism replaces the driver-side
  * thread pool — at 100 TB each executor embeds its own partitions with no
  * driver involvement or shuffle.
  */
object Embedders {

  val DefaultDim = 64
  val DefaultSeed = 42
  val DefaultBatch = 64

  /** Stable 64-bit FNV-1a — deterministic across JVMs (no String.hashCode). */
  private def fnv1a(s: String, seed: Int): Long = {
    var h = 0xcbf29ce484222325L ^ (seed * 0x9e3779b97f4a7c15L)
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Embed one text: unigram + bigram hashed features, signed, L2-normalized. */
  def embedText(text: String, dim: Int = DefaultDim, seed: Int = DefaultSeed): Array[Float] = {
    val toks = Chunkers.collapseWs(text.toLowerCase).split(' ').filter(_.nonEmpty)
    val feats = toks.iterator ++ toks.iterator.sliding(2).withPartial(false).map(_.mkString(" "))
    val v = new Array[Double](dim)
    for (f <- feats) {
      val h = fnv1a(f, seed)
      val idx = java.lang.Math.floorMod(h, dim.toLong).toInt
      val sign = if (((h >>> 32) & 1L) == 0L) 1.0 else -1.0
      v(idx) += sign
    }
    val norm = math.sqrt(v.map(x => x * x).sum)
    val out = new Array[Float](dim)
    if (norm > 0) { var i = 0; while (i < dim) { out(i) = (v(i) / norm).toFloat; i += 1 } }
    out
  }

  /** Backend registry mirroring `resolve_embedder` (embedders.py:70-74):
    * both named backends resolve to the deterministic projection, with the
    * legacy e5 "passage: " prefix applied for the archived path
    * (embeddings/embedder_archived.py:14). */
  def resolve(backend: String): String => Array[Float] = backend match {
    case "hf" | "openai" => t => embedText(t)
    case "e5-legacy"     => t => embedText("passage: " + t)
    case other => throw new IllegalArgumentException(s"Unknown embed backend '$other'")
  }

  /** Batched embedding of a text column: mapPartitions with explicit batch
    * grouping (the reference's embed_batch=64, ingest_and_embed.py:41).
    * Input rows are (id, text); output adds embedding + embedding_dim. */
  def embedChunks(df: DataFrame, idCol: String, textCol: String,
                  backend: String = "hf", dim: Int = DefaultDim,
                  batchSize: Int = DefaultBatch): DataFrame =
    embedColumn(df.select(col(idCol).cast("string"), col(textCol).cast("string")),
      textCol, backend, dim, batchSize)

  /** Embed `textCol`, carrying ALL other columns through the partition map —
    * no re-join of the embedded rows against their metadata (a shuffle the
    * naive id-keyed formulation pays). The batch grouping marks where a
    * vectorized model-runtime call happens; everything stays narrow. */
  def embedColumn(df: DataFrame, textCol: String,
                  backend: String = "hf", dim: Int = DefaultDim,
                  batchSize: Int = DefaultBatch): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val fn = resolve(backend)
    val outSchema = df.schema
      .add("embedding", ArrayType(FloatType, containsNull = false))
      .add("embedding_dim", IntegerType)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { iter =>
      iter.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real model-runtime call would happen
        batch.map { row =>
          val text = if (row.isNullAt(idx)) "" else row.getString(idx)
          Row.fromSeq(row.toSeq :+ fn(text).toSeq :+ dim)
        }
      }
    }(Encoders.row(outSchema))
  }
}

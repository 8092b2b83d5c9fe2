package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of graft's native expressions on an EXISTING session (the
  * extensions route, [[graft.GraftExtensions]], only applies at session
  * construction). Hosted under org.apache.spark.sql for sessionState
  * access. */
object GraftFunctions {

  val cosineBuilder: Seq[Expression] => Expression =
    exprs => CosineSimilarity(exprs(0), exprs(1))

  val chunkWindowsBuilder: Seq[Expression] => Expression =
    exprs => ChunkWindows(exprs(0), exprs(1), exprs(2))

  val mortonBuilder: Seq[Expression] => Expression =
    exprs => MortonInterleave(exprs(0), exprs(1), exprs(2))

  val sortedIntersectBuilder: Seq[Expression] => Expression =
    exprs => SortedIntersectCount(exprs(0), exprs(1))

  /** Make `cosine_similarity(a, b)`, `chunk_windows(text, size, ov)`,
    * `morton_interleave(x, y, bits)` and `sorted_intersect_count(a, b)`
    * available to SQL in this session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("cosine_similarity", cosineBuilder, "scala_udf")
    registry.createOrReplaceTempFunction("chunk_windows", chunkWindowsBuilder, "scala_udf")
    registry.createOrReplaceTempFunction("morton_interleave", mortonBuilder, "scala_udf")
    registry.createOrReplaceTempFunction("sorted_intersect_count", sortedIntersectBuilder, "scala_udf")
  }

  def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getName, name)
}

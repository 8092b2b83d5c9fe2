// Hosted under org.apache.spark.sql so the expressions can implement the
// private[sql] ImplicitCastInputTypes/AbstractDataType contract — the
// standard packaging for third-party Catalyst expressions.
package org.apache.spark.sql.graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row gram-hash kernels for the span/winnow families (r17
  * optimization wave 2 — same contract as [[TextHashKernel]]: identical
  * values to the prior relational md5-hex/conv formulations, one compiled
  * loop instead of explode + hex + conv (+ for winnowing, an interpreted
  * higher-order window-min lambda pile measured at whole seconds per
  * corpus pass). GramKernelSpec pins old≡new per call site. */
object GramKernel {

  /** 60-bit md5 word (hex chars [1,15]) of each word-k-gram of a token
    * array, in position order: element p = the hash of
    * `array_join(slice(toks, p+1, k), ' ')`; a document with fewer than k
    * tokens yields ONE gram — all its tokens joined. Token PRECONDITION
    * (caller-enforced): non-null elements, as produced by the tokenizer
    * chains. */
  def gramHashes(toks: ArrayData, k: Int): Array[Long] = {
    val n = toks.numElements()
    val tokBytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      tokBytes(i) = toks.getUTF8String(i).getBytes
      i += 1
    }
    gramHashesOfBytes(tokBytes, k)
  }

  private[graft] def gramHashesOfBytes(tokBytes: Array[Array[Byte]], k: Int): Array[Long] = {
    val n = tokBytes.length
    val m = if (n >= k) n - k + 1 else 1
    val width = if (n >= k) k else n
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      md.reset()
      if (width > 0) {
        md.update(tokBytes(i))
        var t = 1
        while (t < width) { md.update(' '.toByte); md.update(tokBytes(i + t)); t += 1 }
      }
      val d = md.digest()
      out(i) = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
        ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
      i += 1
    }
    out
  }

  def gramHashArray(toks: ArrayData, k: Int): ArrayData =
    ArrayData.toArrayData(gramHashes(toks, k))

  /** The old relational null-text shape: `explode` of the single null
    * shingle produced one (id, NULL) row; a null child here maps to a
    * one-NULL-element array so downstream explodes see the same row. */
  def nullGramHashArray(): ArrayData = new GenericArrayData(Array[Any](null))

  /** Robust winnowing picks over the gram-hash array of `text`
    * ([[graft.ops.Winnow.fingerprints]]' selection, Schleimer et al.
    * 2003): for every window of `least(w, m)` consecutive grams, the
    * RIGHTMOST position attaining the window minimum; distinct picks in
    * first-appearance order as struct(pos BIGINT, fp BIGINT). */
  def winnowPicks(text: UTF8String, k: Int, w: Int): ArrayData = {
    val toks = TextHashKernel.tokenBytes(text)
    val g = gramHashesOfBytes(toks, k)
    val m = g.length
    val win = math.min(w, m)
    val picked = new Array[Boolean](m)
    val order = new java.util.ArrayList[Integer](2 * m / (w + 1) + 2)
    var j = 0
    while (j <= m - win) {
      var mn = Long.MaxValue
      var p = -1
      var t = 0
      while (t < win) {
        val v = g(j + t)
        if (v <= mn) { mn = v; p = j + t } // <=: rightmost wins ties
        t += 1
      }
      if (!picked(p)) { picked(p) = true; order.add(p) }
      j += 1
    }
    val rows = new Array[Any](order.size)
    var r = 0
    while (r < order.size) {
      val p = order.get(r).intValue()
      rows(r) = new GenericInternalRow(Array[Any](p.toLong, g(p)))
      r += 1
    }
    new GenericArrayData(rows)
  }

  /** The old relational null-text shape for the winnow chain: the
    * higher-order pipeline folded a null text into ONE pick with null
    * pos/fp. */
  def nullWinnowPicks(): ArrayData =
    new GenericArrayData(Array[Any](new GenericInternalRow(Array[Any](null, null))))
}

/** Catalyst wrapper for [[GramKernel.gramHashArray]] over a token-array
  * column. Null input yields the old explode shape's single-NULL array
  * (see [[GramKernel.nullGramHashArray]]), so the expression itself is
  * never null. */
case class GramHash60(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(k >= 1, s"k-gram width must be >= 1, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "gram_hash60"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) GramKernel.nullGramHashArray()
    else GramKernel.gramHashArray(v.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code + code"""
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = ${c.isNull}
        ? org.apache.spark.sql.graft.GramKernel.nullGramHashArray()
        : org.apache.spark.sql.graft.GramKernel.gramHashArray(${c.value}, $k);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramHash60 {
  import org.apache.spark.sql.classic.ExpressionUtils
  def apply(toks: Column, k: Int): Column =
    ExpressionUtils.column(GramHash60(ExpressionUtils.expression(toks), k))
}

/** Catalyst wrapper for [[GramKernel.winnowPicks]] over a text column.
  * Null input yields the old chain's single (null, null) pick, so the
  * expression itself is never null. */
case class WinnowPicks(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(k >= 1, s"k-gram width must be >= 1, got $k")
  require(w >= 1, s"winnow window must be >= 1, got $w")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = true),
    StructField("fp", LongType, nullable = true))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "winnow_picks"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) GramKernel.nullWinnowPicks()
    else GramKernel.winnowPicks(v.asInstanceOf[UTF8String], k, w)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code + code"""
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = ${c.isNull}
        ? org.apache.spark.sql.graft.GramKernel.nullWinnowPicks()
        : org.apache.spark.sql.graft.GramKernel.winnowPicks(${c.value}, $k, $w);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowPicks {
  import org.apache.spark.sql.classic.ExpressionUtils
  def apply(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowPicks(ExpressionUtils.expression(text), k, w))
}

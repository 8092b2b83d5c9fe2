// Hosted under org.apache.spark.sql — same packaging rationale as
// CosineExpr.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, Literal, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expression for the Morton (Z-order) interleave of two
  * long columns: bit i of `x` lands at key bit 2i, bit i of `y` at 2i+1,
  * for the low `bits` bits of each input.
  *
  * Semantically identical to the SQL expression
  * [[graft.ops.ZOrder.zKeySql]] generates (pure integer shifts/masks — no
  * float anywhere), but as ONE tight codegen loop instead of a 2·bits-term
  * sum expression: smaller generated method, no constant-folding pressure,
  * still inside whole-stage codegen. Use the SQL form where an external
  * engine must replay the key (the DuckDB oracle does); use this where
  * only Spark computes it (the layout writer's hot path).
  */
case class MortonInterleave(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType, IntegerType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "morton_interleave"

  // bits beyond 31 would wrap Java's mod-64 shifts into silent key
  // collisions (and 32 puts y's top bit in the sign) — reject at analysis
  // time, the same guard ZOrder.zKeySql enforces
  override def checkInputDataTypes(): TypeCheckResult = {
    val basic = super.checkInputDataTypes()
    if (basic.isFailure) basic
    else third match {
      case Literal(b: Int, IntegerType) if b >= 1 && b <= 31 =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName(bits) must be a literal int in [1, 31]")
    }
  }

  override def nullSafeEval(x: Any, y: Any, b: Any): Any = {
    val xs = x.asInstanceOf[Long]
    val ys = y.asInstanceOf[Long]
    val bits = b.asInstanceOf[Int]
    var k = 0L
    var i = 0
    while (i < bits) {
      k |= ((xs >>> i) & 1L) << (2 * i)
      k |= ((ys >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    java.lang.Long.valueOf(k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, b) => {
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      s"""
         |long $k = 0L;
         |for (int $i = 0; $i < $b; $i++) {
         |  $k |= (($x >>> $i) & 1L) << (2 * $i);
         |  $k |= (($y >>> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $k;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object MortonInterleave {
  import org.apache.spark.sql.classic.ExpressionUtils
  /** Column API for the native expression. */
  def apply(x: Column, y: Column, bits: Int): Column =
    ExpressionUtils.column(MortonInterleave(
      ExpressionUtils.expression(x), ExpressionUtils.expression(y),
      org.apache.spark.sql.catalyst.expressions.Literal(bits)))
}

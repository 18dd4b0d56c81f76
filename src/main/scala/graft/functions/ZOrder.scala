package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Codegen'd 2-D Morton (Z-order) key: interleaves the low 32 bits of
  * two non-negative long columns (a in even bit positions, b in odd).
  *
  * Sorting or range-partitioning a table by this key clusters rows
  * that are close in BOTH dimensions into the same Parquet row
  * groups, so min/max row-group statistics prune scans for predicates
  * on EITHER column — the write-once data-layout optimization for
  * 100 TB tables queried along more than one axis (see
  * [[graft.sources.Sinks.writeZOrdered]]).
  *
  * Inputs are typically dictionary ranks or quantized values; values
  * outside [0, 2^32) are masked to their low 32 bits.
  */
case class ZOrderKey(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_zorder expects (bigint, bigint), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKey.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrderKey.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {
  /** Spread the low 32 bits of x to even bit positions (0,2,4,...62). */
  def spread(x: Long): Long = {
    var v = x & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Morton interleave: a's bits at even positions, b's at odd. */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

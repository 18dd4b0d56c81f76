package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd `size(array_intersect(a, b))` without materializing the
  * intersection array (SURVEY.md §7.3 family).
  *
  * Counts DISTINCT elements of `a` present in `b` — exactly
  * `array_intersect`'s cardinality semantics for ALL inputs, including
  * duplicate elements and a shared null element (array_intersect
  * counts null∈a ∩ null∈b once; so does this). The near-dedup verify
  * step runs this once per candidate pair; skipping the result-array
  * allocation and generic machinery roughly halves the per-pair cost.
  */
case class ArrayIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_intersect_count expects (array<string>, array<string>), got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val bSet = new java.util.HashSet[Any](b.numElements() * 2)
    var bHasNull = false
    var i = 0
    while (i < b.numElements()) {
      if (b.isNullAt(i)) bHasNull = true else bSet.add(b.getUTF8String(i))
      i += 1
    }
    val counted = new java.util.HashSet[Any](a.numElements() * 2)
    var n = 0
    var nullCounted = false
    i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i)) {
        if (bHasNull && !nullCounted) { n += 1; nullCounted = true }
      } else {
        val v = a.getUTF8String(i)
        if (bSet.contains(v) && counted.add(v)) n += 1
      }
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val bSet = ctx.freshName("bSet")
      val bHasNull = ctx.freshName("bHasNull")
      val counted = ctx.freshName("counted")
      val nullCounted = ctx.freshName("nullCounted")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      s"""
         |java.util.HashSet $bSet = new java.util.HashSet($b.numElements() * 2);
         |boolean $bHasNull = false;
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  if ($b.isNullAt($i)) $bHasNull = true; else $bSet.add($b.getUTF8String($i));
         |}
         |java.util.HashSet $counted = new java.util.HashSet($a.numElements() * 2);
         |boolean $nullCounted = false;
         |int $n = 0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if ($a.isNullAt($i)) {
         |    if ($bHasNull && !$nullCounted) { $n++; $nullCounted = true; }
         |  } else {
         |    org.apache.spark.unsafe.types.UTF8String $v = $a.getUTF8String($i);
         |    if ($bSet.contains($v) && $counted.add($v)) $n++;
         |  }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd ADC (asymmetric distance computation) lookup-sum for
  * product quantization (SURVEY.md §2.8 ANN-PQ):
  * `graft_adc(codes, lut) = Σ_m lut[m][codes[m]]`.
  *
  * This is the per-candidate kernel of [[graft.operators.Pq]] /
  * [[graft.operators.IvfPq]] scoring — it runs once per
  * (candidate, query) pair, i.e. millions of times per query batch.
  * The higher-order formulation
  * `aggregate(zip_with(codes, lut, (c, row) -> element_at(row, c+1)), 0D, _+_)`
  * is interpreted per element; this expression compiles to an m-step
  * primitive loop inside whole-stage codegen (same motivation and
  * ~20× class of win as [[ArrayDotProduct]], measured there).
  *
  * Semantics: accumulation is strictly left-to-right; a null input
  * yields null; a null code, a null LUT row, a null LUT entry, or a
  * codes/LUT LENGTH MISMATCH nulls the whole fold (zip_with would
  * null-pad the shorter side, which nulls its fold too — a partial
  * sum would be a plausible-looking wrong distance). An out-of-range
  * code ALSO yields null — the expression is deliberately total where
  * ANSI `element_at` would throw: `encode()` can never emit an
  * out-of-range code, and a corrupted code table should surface as a
  * null score, not a job abort. Value-identity with the higher-order
  * form on in-range inputs is spec-asserted (AdcLookupSpec).
  */
case class AdcLookup(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_adc expects (array<int>, array<array<double>>), got $l / $r")
    }

  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val lut = r.asInstanceOf[ArrayData]
    if (codes.numElements() != lut.numElements()) return null
    val n = codes.numElements()
    var acc = 0.0
    var m = 0
    while (m < n) {
      if (codes.isNullAt(m) || lut.isNullAt(m)) return null
      val row = lut.getArray(m)
      val c = codes.getInt(m)
      if (c < 0 || c >= row.numElements() || row.isNullAt(c)) return null
      acc += row.getDouble(c)
      m += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val row = ctx.freshName("row")
      val c = ctx.freshName("c")
      s"""
         |int $n = $codes.numElements();
         |if ($n != $lut.numElements()) { ${ev.isNull} = true; $n = 0; }
         |double $acc = 0.0;
         |for (int $m = 0; $m < $n; $m++) {
         |  if ($codes.isNullAt($m) || $lut.isNullAt($m)) { ${ev.isNull} = true; break; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $row = $lut.getArray($m);
         |  int $c = $codes.getInt($m);
         |  if ($c < 0 || $c >= $row.numElements() || $row.isNullAt($c)) { ${ev.isNull} = true; break; }
         |  $acc += $row.getDouble($c);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

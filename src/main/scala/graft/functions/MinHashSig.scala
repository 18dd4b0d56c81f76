package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd k-wise MinHash signature over a string array
  * (SURVEY.md §2.8 / §7.3).
  *
  * Bit-identical to the higher-order formulation
  * `transform(sequence(0,k-1), j -> array_min(transform(words,
  * w -> xxhash64(j, w))))` (asserted by spec): Spark's XxHash64 folds
  * seed 42 → hashInt(j) → hashUTF8String(w), so the per-index seeds
  * are precomputed as `XXH64.hashInt(j, 42)` and only the string hash
  * runs per (word, j). The interpreted higher-order version allocates
  * closures and boxed longs per element; this compiles to two
  * primitive loops inside whole-stage codegen.
  *
  * Empty input arrays yield Long.MaxValue components (the neutral
  * element of min) instead of the higher-order form's nulls.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_minhash expects array<string>, got $other")
    }

  // replicates XxHash64(Seq(lit(j), w)): fold 42 -> hashInt(j) -> hash(w)
  private lazy val seeds: Array[Long] = Array.tabulate(k)(j => XXH64.hashInt(j, 42L))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      var mn = Long.MaxValue
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val h = XXH64.hashUTF8String(arr.getUTF8String(i), seeds(j))
          if (h < mn) mn = h
        }
        i += 1
      }
      out(j) = mn
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("mhSeeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val mn = ctx.freshName("mn")
      val h = ctx.freshName("h")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$k];
         |for (int $j = 0; $j < $k; $j++) {
         |  long $mn = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) {
         |      long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |        .hashUTF8String($a.getUTF8String($i), $seedsRef[$j]);
         |      if ($h < $mn) $mn = $h;
         |    }
         |  }
         |  $out[$j] = $mn;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd word n-grams over a raw text column (SURVEY.md §7.3
  * family; the unit of the repetition and benchmark-decontamination
  * filters, reference `README.md:62-78` ad-hoc text surface).
  *
  * Value-identical to the higher-order formulation
  * `transform(sequence(1, size(split(text,' ')) - n + 1),
  * i -> concat_ws(' ', slice(split(text,' '), i, n)))` with the
  * `size < n → empty array` guard (spec-asserted): the split uses the
  * same `UTF8String.split(" ", -1)` the built-in `split` evaluates,
  * so empty-token and trailing-separator edge cases agree exactly.
  *
  * The interpreted higher-order version re-splits the text three
  * times per row (once per CASE reference) and allocates a closure,
  * boxed index, and slice array per gram; this compiles to one split
  * and one primitive loop inside whole-stage codegen.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "graft_word_ngrams: n must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_word_ngrams expects string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNgrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  private val SPACE = UTF8String.fromString(" ")

  /** Registry constructor: `graft_word_ngrams(text, n)` with a
    * foldable numeric literal n (same contract as `graft_minhash`'s
    * k — the loop bound must be known at plan time for codegen).
    */
  def build(exprs: Seq[Expression]): WordNgrams = {
    require(exprs.length == 2 && exprs(1).foldable,
      "graft_word_ngrams(text, n) takes a literal n")
    exprs(1).eval() match {
      case n: Number => WordNgrams(exprs(0), n.intValue())
      case other => throw new IllegalArgumentException(
        s"graft_word_ngrams: n must be a numeric literal, got $other")
    }
  }

  /** Static per-row kernel (called from generated code — keeps the
    * expression inside whole-stage codegen with a single static call
    * per row instead of falling back to the interpreter).
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    // identical to the built-in split(text, ' '): regex split, limit -1
    val words = text.split(SPACE, -1)
    val m = words.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val gram = new Array[UTF8String](n)
      var j = 0
      while (j < n) { gram(j) = words(i + j); j += 1 }
      out(i) = UTF8String.concatWs(SPACE, gram: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

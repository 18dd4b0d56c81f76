package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd character n-grams over a raw text column — the gram unit
  * of the char-shingle dedup path ([[TextFunctions.shinglesExpr]]) and
  * the trigram LM quality score (q_x_lm_score; reference
  * `README.md:62-78` ad-hoc text surface). Sibling of [[WordNgrams]].
  *
  * Value-identical to the higher-order formulation
  * `transform(sequence(1, length(text) - n + 1), i -> substring(text,
  * i, n))` with the `length < n → empty array` guard (spec-asserted),
  * including multibyte input: positions are CHARACTER positions, same
  * as SQL `substring`.
  *
  * The interpreted higher-order version allocates a closure and boxed
  * index per gram and re-scans the string from byte 0 on every
  * `substring` call (UTF-8 is variable-width, so char→byte offset is a
  * scan) — O(len²) bytes touched per row. This computes the char→byte
  * offset table in ONE pass and emits each gram as a zero-copy view
  * over the shared byte array, inside whole-stage codegen.
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "graft_char_ngrams: n must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_char_ngrams expects string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    CharNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharNgrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

object CharNgrams {

  /** Registry constructor: `graft_char_ngrams(text, n)` with a
    * foldable numeric literal n (the loop bound must be known at plan
    * time — same contract as `graft_word_ngrams`).
    */
  def build(exprs: Seq[Expression]): CharNgrams = {
    require(exprs.length == 2 && exprs(1).foldable,
      "graft_char_ngrams(text, n) takes a literal n")
    exprs(1).eval() match {
      case n: Number => CharNgrams(exprs(0), n.intValue())
      case other => throw new IllegalArgumentException(
        s"graft_char_ngrams: n must be a numeric literal, got $other")
    }
  }

  /** Static per-row kernel (called from generated code). One pass to
    * build the char→byte offset table, then m = numChars − n + 1
    * zero-copy gram views over the shared byte array.
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    // char start offsets (+ terminal end offset) in one scan
    val offs = new Array[Int](text.numChars + 1)
    var b = 0
    var c = 0
    while (b < bytes.length) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(c) = bytes.length
    val m = c - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) = UTF8String.fromBytes(bytes, offs(i), offs(i + n) - offs(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

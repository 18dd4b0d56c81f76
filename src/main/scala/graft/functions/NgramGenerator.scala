package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_explode_ngrams(text, n)` → rows of (pos, gram): a true
  * Catalyst Generator (UDTF) — the surface SURVEY §2.9 deferred until
  * a case needed it. The case: array-then-explode
  * (`explode(graft_word_ngrams(text, n))`) materializes the WHOLE
  * n-gram array per row before the Generate unnests it — for a 100 KB
  * document that is an ~n× amplification of the row held live in one
  * task. This generator streams grams one InternalRow at a time from
  * inside GenerateExec: peak per-row memory is one gram, not the
  * gram set, which is the difference between "fits" and "OOM" on the
  * long-document tail of a 100 TB corpus.
  *
  * Tokenization is IDENTICAL to [[WordNgrams]] (same
  * `UTF8String.split(" ", -1)`), so `explode(graft_word_ngrams)` and
  * `graft_explode_ngrams` are row-for-row interchangeable —
  * NgramGeneratorSpec asserts the equivalence, and the q_x_ngrams_gen
  * oracle is the same SQL as the array form's.
  */
case class WordNgramGenerator(child: Expression, n: Int)
  extends Generator with CodegenFallback {
  require(n > 0, "graft_explode_ngrams: n must be positive")

  override def children: Seq[Expression] = child :: Nil

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_explode_ngrams expects string, got $other")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  private val SPACE = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Iterator.empty
    else {
      val words = t.asInstanceOf[UTF8String].split(SPACE, -1)
      val m = words.length - n + 1
      if (m <= 0) Iterator.empty
      else new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i < m
        override def next(): InternalRow = {
          val gram = new Array[UTF8String](n)
          var j = 0
          while (j < n) { gram(j) = words(i + j); j += 1 }
          val row = InternalRow(i, UTF8String.concatWs(SPACE, gram: _*))
          i += 1
          row
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WordNgramGenerator =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_explode_ngrams"
}

object WordNgramGenerator {
  def build(exprs: Seq[Expression]): WordNgramGenerator = {
    require(exprs.length == 2 && exprs(1).foldable,
      "graft_explode_ngrams(text, n) takes a literal n")
    exprs(1).eval() match {
      case n: Number => WordNgramGenerator(exprs(0), n.intValue())
      case other => throw new IllegalArgumentException(
        s"graft_explode_ngrams: n must be a numeric literal, got $other")
    }
  }
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash sketch union as a native Catalyst aggregate
  * (TypedImperativeAggregate): elementwise min over per-row signature
  * arrays — the mergeable-sketch aggregation of a corpus-level
  * similarity profile (SURVEY.md §2.9; same contract as the
  * Aggregator-based [[MinHashUnionAggregator]], spec-asserted equal).
  *
  * Why the native form matters at scale: the buffer is one primitive
  * long[k] (k·8 bytes) with partial aggregation — map-side combine
  * reduces shuffle traffic to one sketch per (group × partition), and
  * there is no Scala-encoder round trip per input row as with
  * `functions.udaf`. Registered as `graft_minhash_union`.
  *
  * The buffer sizes itself from the first signature seen (k is not a
  * parameter); a global aggregate over zero rows yields an empty
  * array. Null signature elements are treated as Long.MaxValue (the
  * neutral element of min).
  */
case class MinHashUnion(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_minhash_union expects array<bigint> signatures, got $other")
    }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def elemMin(buf: Array[Long], sig: ArrayData): Array[Long] = {
    val n = sig.numElements()
    if (buf.isEmpty) {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) { out(i) = if (sig.isNullAt(i)) Long.MaxValue else sig.getLong(i); i += 1 }
      out
    } else {
      require(buf.length == n, s"minhash signature length mismatch: ${buf.length} vs $n")
      var i = 0
      while (i < n) {
        if (!sig.isNullAt(i) && sig.getLong(i) < buf(i)) buf(i) = sig.getLong(i)
        i += 1
      }
      buf
    }
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf else elemMin(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    if (other.isEmpty) buf
    else if (buf.isEmpty) other
    else {
      require(buf.length == other.length)
      var i = 0
      while (i < buf.length) { if (other(i) < buf(i)) buf(i) = other(i); i += 1 }
      buf
    }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashUnion =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashUnion =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashUnion =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_minhash_union"
}

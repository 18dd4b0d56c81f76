package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters state: ≤ k counters, the total decrement
  * `dec` (the global error bound), and the processed-row count `n`.
  *
  * Invariants (hold after any interleaving of update/merge, asserted
  * by FreqItemsSpec against exact counts):
  *   est(x) ≤ true(x) ≤ est(x) + dec        for every tracked x
  *   every x with true(x) > dec is tracked  (no false negatives above
  *                                           the error bound)
  * Single-stream dec ≤ n/(k+1); merges add error bounds (mergeable
  * summaries, Agarwal et al. 2013).
  */
final class MGState(
    val counts: mutable.HashMap[String, Long],
    var dec: Long,
    var n: Long)

/** Single-pass heavy hitters (frequent items) as a native Catalyst
  * aggregate: `graft_freq_items(item, k)` → struct(terms: array of
  * (term, est) sorted est-desc/term-asc, err, n).
  *
  * Why a sketch when exact top-k exists (q_x_top_terms): the exact
  * form shuffles ONE ROW PER DISTINCT TERM — at 100 TB of text the
  * distinct-term cardinality (typos, ids, urls) is itself TB-scale.
  * This buffer is k counters regardless of input size, partial
  * aggregation ships one k-sized summary per (group × partition), and
  * the answer carries its own error bound (err): any term with true
  * count > err is guaranteed present, and every reported estimate is
  * within [est, est + err] of the truth. Approximate by design → no
  * SQL oracle; spec-bound like q_agg_approx.
  */
case class FreqItems(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGState] {
  require(k > 0, "graft_freq_items: k must be positive")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false

  private val termStruct = StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("est", LongType, nullable = false)))

  override def dataType: DataType = StructType(Seq(
    StructField("terms", ArrayType(termStruct, containsNull = false), nullable = false),
    StructField("err", LongType, nullable = false),
    StructField("n", LongType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_freq_items expects a string item, got $other")
    }

  override def createAggregationBuffer(): MGState =
    new MGState(mutable.HashMap.empty, 0L, 0L)

  override def update(buf: MGState, input: InternalRow): MGState = {
    val v = child.eval(input)
    if (v == null) return buf
    // copy out of Spark's reusable row memory
    val item = v.asInstanceOf[UTF8String].toString
    buf.n += 1
    buf.counts.get(item) match {
      case Some(c) => buf.counts.update(item, c + 1)
      case None if buf.counts.size < k => buf.counts.update(item, 1L)
      case None =>
        // classic MG: decrement every counter, drop zeros
        buf.dec += 1
        val dead = mutable.ArrayBuffer.empty[String]
        buf.counts.foreach { case (t, c) =>
          if (c == 1L) dead += t else buf.counts.update(t, c - 1)
        }
        dead.foreach(buf.counts.remove)
    }
    buf
  }

  override def merge(buf: MGState, other: MGState): MGState = {
    buf.n += other.n
    buf.dec += other.dec
    other.counts.foreach { case (t, c) =>
      buf.counts.update(t, buf.counts.getOrElse(t, 0L) + c)
    }
    if (buf.counts.size > k) {
      // subtract the (k+1)-th largest count from all, drop ≤ 0
      val cut = buf.counts.values.toArray.sortBy(-_).apply(k)
      buf.dec += cut
      val dead = mutable.ArrayBuffer.empty[String]
      buf.counts.foreach { case (t, c) =>
        if (c <= cut) dead += t else buf.counts.update(t, c - cut)
      }
      dead.foreach(buf.counts.remove)
    }
    buf
  }

  override def eval(buf: MGState): Any = {
    val sorted = buf.counts.toArray.sortBy { case (t, c) => (-c, t) }
    val rows: Array[Any] = sorted.map { case (t, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c))
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(rows), buf.dec, buf.n))
  }

  override def serialize(buf: MGState): Array[Byte] = {
    val entries = buf.counts.toArray
    val byteArrays = entries.map(_._1.getBytes(StandardCharsets.UTF_8))
    val size = 8 + 8 + 4 + byteArrays.map(_.length + 4 + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putLong(buf.n).putLong(buf.dec).putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(byteArrays(i).length).put(byteArrays(i)).putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGState = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val dec = bb.getLong
    val m = bb.getInt
    val counts = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < m) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      counts.update(new String(arr, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    new MGState(counts, dec, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItems =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_freq_items"
}

object FreqItems {
  /** Registry constructor: `graft_freq_items(item, k)` with a foldable
    * numeric literal k (the counter budget must be known at plan
    * time).
    */
  def build(exprs: Seq[Expression]): FreqItems = {
    require(exprs.length == 2 && exprs(1).foldable,
      "graft_freq_items(item, k) takes a literal k")
    exprs(1).eval() match {
      case n: Number => FreqItems(exprs(0), n.intValue())
      case other => throw new IllegalArgumentException(
        s"graft_freq_items: k must be a numeric literal, got $other")
    }
  }
}

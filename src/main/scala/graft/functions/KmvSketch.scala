package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) sketch state: the ≤ k smallest DISTINCT hash
  * strings seen so far, kept in a sorted set. Inserting a value ≥ the
  * current k-th minimum is a no-op, so the buffer is bounded at k
  * regardless of input size and duplicates collapse for free (set
  * semantics live in the buffer — no upstream DISTINCT shuffle
  * needed).
  */
final class KmvState(val mins: java.util.TreeSet[String])

/** Bottom-k distinct-value sketch as a native Catalyst aggregate:
  * `graft_kmv(hash, k)` → sorted array of the k smallest distinct hash
  * strings (Bar-Yossef et al. 2002; Beyer et al. 2007 for the set-
  * operation estimators).
  *
  * Why a sketch when exact set ops exist: estimating the overlap of
  * two sources' shingle vocabularies exactly means shuffling one row
  * per distinct shingle per source — at 100 TB that cardinality is
  * itself TB-scale. This buffer is k strings regardless of input
  * size, partial aggregation ships one k-sized summary per
  * (group × partition), and sketches of different sources combine
  * into union/intersection/Jaccard estimates driver-free. Unlike
  * MinHash (k independent permutations, Jaccard only), one KMV sketch
  * per source answers Jaccard AND containment AND distinct-count
  * questions for every pair, and sketches are mergeable across
  * partitions and across corpus snapshots.
  *
  * Determinism: the result is a pure function of the input SET (the k
  * smallest distinct values under string order), independent of row
  * order and partitioning — so unlike most sketches it IS oracle-able:
  * DuckDB reproduces it exactly with row_number over the same md5
  * hashes (q_x_kmv_overlap).
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvState] {
  require(k > 0, "graft_kmv: k must be positive")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_kmv expects a string hash, got $other")
    }

  override def createAggregationBuffer(): KmvState =
    new KmvState(new java.util.TreeSet[String]())

  private def insert(buf: KmvState, v: String): Unit = {
    val m = buf.mins
    if (m.size < k) { m.add(v); () }
    else if (v.compareTo(m.last) < 0) {
      // strictly below the current k-th minimum: displace it
      if (m.add(v)) m.pollLast()
      ()
    } // v ≥ k-th min (or duplicate of it): can never enter the bottom-k
  }

  override def update(buf: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: KmvState, other: KmvState): KmvState = {
    val it = other.mins.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: KmvState): Any = {
    val out = new Array[Any](buf.mins.size)
    val it = buf.mins.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: KmvState): Array[Byte] = {
    val arrays = new Array[Array[Byte]](buf.mins.size)
    val it = buf.mins.iterator()
    var i = 0
    while (it.hasNext) {
      arrays(i) = it.next().getBytes(StandardCharsets.UTF_8); i += 1
    }
    val bb = ByteBuffer.allocate(4 + arrays.map(_.length + 4).sum)
    bb.putInt(arrays.length)
    arrays.foreach(a => { bb.putInt(a.length); bb.put(a) })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvState = {
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getInt
    val set = new java.util.TreeSet[String]()
    var i = 0
    while (i < m) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      set.add(new String(arr, StandardCharsets.UTF_8))
      i += 1
    }
    new KmvState(set)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_kmv"
}

object KmvSketch {
  /** Registry constructor: `graft_kmv(hash, k)` with a foldable numeric
    * literal k (the sketch size must be known at plan time).
    */
  def build(exprs: Seq[Expression]): KmvSketch = {
    require(exprs.length == 2 && exprs(1).foldable,
      "graft_kmv(hash, k) takes a literal k")
    exprs(1).eval() match {
      case n: Number => KmvSketch(exprs(0), n.intValue())
      case other => throw new IllegalArgumentException(
        s"graft_kmv: k must be a numeric literal, got $other")
    }
  }
}

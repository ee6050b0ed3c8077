package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded DISTINCT bottom-k over a long column — the KMV/theta
  * sketch state as ONE aggregate.
  *
  * Catalyst's `CollectTopK` heap keeps duplicates, so the KMV family
  * (K35/K40) had to dedup first: a full `(group, hv)` distinct
  * exchange, then a second exchange for the heap. This aggregate
  * folds the dedup INTO the bounded state (a ≤k sorted set per group,
  * map-side combinable), so one exchange carries at most k longs per
  * (task, group) and the distinct shuffle disappears entirely — at
  * 100 TB that was the dominant cost of the sketch.
  *
  * The state is also IDEMPOTENT (a re-inserted hash is a no-op),
  * which is what makes it the third streaming sketch contract next to
  * HLL's max (idempotent) and CMS's sum (additive): bounded O(k)
  * per-group state that re-delivery cannot move —
  * [[graft.streaming.Streaming.kmvSketchStream]].
  *
  * eval emits the ASCENDING distinct array (the form every KMV
  * consumer sorts into anyway).
  */
case class BottomKLongsDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Long])
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) {
      b1.add(it.next())
      if (b1.size > k) b1.pollLast()
    }
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKLongsDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKLongsDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomKLongsDistinct =
    copy(child = newChild)

  override def prettyName: String = "bottom_k_longs_distinct"
}

package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.DataType

/** `collect_list` with a hard buffer cap: accumulation stops once the
  * buffer holds `cap + 1` elements.
  *
  * Built for the dedup pipelines' bucket blocking (q35/q36/q37), where
  * every bucket's member list is collected and then filtered to
  * `size BETWEEN 2 AND cap` — oversized buckets are DROPPED, so
  * collecting more than `cap + 1` members is pure waste, and on a skewed
  * key (a boilerplate shingle or a degenerate 16-bit simhash chunk
  * shared by millions of docs at 100 TB) an uncapped `collect_list`
  * materializes the whole hot bucket in one aggregation buffer — an OOM
  * waiting to happen. With the cap, the buffer is bounded at `cap + 1`
  * elements per key REGARDLESS of bucket cardinality: `cap + 1` is
  * exactly enough for the downstream `size(...) <= cap` filter to
  * identify and drop the bucket.
  *
  * For buckets with ≤ `cap` members the result equals `collect_list`
  * (every member survives both partial buffers and the merge); only
  * buckets the caller discards anyway are truncated, so query results
  * are bit-identical to the uncapped formulation. Like `collect_list`,
  * output order is non-deterministic — all callers treat the list as a
  * set.
  */
case class CollectCapped(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends Collect[mutable.ArrayBuffer[Any]] with UnaryLike[Expression] {

  require(cap >= 1, s"collect_capped: cap must be >= 1, got $cap")

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override def convertToBufferElement(value: Any): Any =
    InternalRow.copyValue(value)

  override lazy val bufferElementType: DataType = child.dataType

  override def update(
      buffer: mutable.ArrayBuffer[Any],
      input: InternalRow): mutable.ArrayBuffer[Any] =
    if (buffer.length > cap) buffer else super.update(buffer, input)

  override def merge(
      buffer: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val it = other.iterator
    while (buffer.length <= cap && it.hasNext) buffer += it.next()
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toArray)

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectCapped =
    copy(child = newChild)

  override def prettyName: String = "collect_capped"
}

package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Encoder, expressions}

/** Bounded top-k as a typed Catalyst AGGREGATE — the scale-right shape
  * for per-group top-k. A windowed row_number needs every group's rows
  * sorted somewhere (q11 mitigates with salting, but the full input
  * still shuffles); an aggregate with a k-bounded buffer does it in ONE
  * pass with map-side partial aggregation — each map task ships at most
  * k rows PER GROUP PER PARTITION into the shuffle, so shuffle volume is
  * O(groups × k × partitions) regardless of input size, and no task ever
  * sorts more than k live entries. This is the `Aggregator` axis of the
  * custom-function surface (the scalar kernels — cosine_sim, winnow_fps,
  * … — are codegen'd `Expression`s; aggregation state can't codegen, but
  * the state here is k tuples).
  *
  * Ordering: price DESC, then key ASC — ties are impossible to get wrong
  * because the comparator is total. The buffer is kept sorted best-first
  * and bounded at k: an insert that can't beat the current worst is a
  * single comparison, so the per-row cost is O(1) for the (vast) cold
  * majority and O(k) on the rare improvement.
  */
case class RankedRow(price: Double, key: Long)

class TopK(k: Int) extends Aggregator[RankedRow, Seq[RankedRow], Seq[RankedRow]] {
  require(k > 0, s"k must be positive, got $k")

  private def better(a: RankedRow, b: RankedRow): Boolean =
    a.price > b.price || (a.price == b.price && a.key < b.key)

  override def zero: Seq[RankedRow] = Nil

  private def insert(buf: Seq[RankedRow], x: RankedRow): Seq[RankedRow] =
    if (buf.size >= k && better(buf.last, x)) buf
    else ((buf :+ x).sortWith(better)).take(k)

  override def reduce(buf: Seq[RankedRow], in: RankedRow): Seq[RankedRow] =
    insert(buf, in)

  override def merge(a: Seq[RankedRow], b: Seq[RankedRow]): Seq[RankedRow] =
    b.foldLeft(a)(insert)

  override def finish(r: Seq[RankedRow]): Seq[RankedRow] = r

  override def bufferEncoder: Encoder[Seq[RankedRow]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[RankedRow]] = ExpressionEncoder()
}

object TopK {
  /** Column-level entry: `topK(3)(col(price), col(key))` in an `agg`. */
  def apply(k: Int): expressions.UserDefinedFunction =
    udaf(new TopK(k), ExpressionEncoder[RankedRow]())
}

/** Long-keyed sibling of [[RankedRow]]/[[TopK]]: identical bounded-heap
  * shape, but the rank stays int64 end to end. Exists because a double
  * rank is exact only below 2^53 — q120's DLT priority
  * (n_chars · 10^9 div h) crosses that once n_chars ≳ 9·10^6 with a
  * small h, after which a double-keyed heap's ordering (and the τ
  * recovered by casting back to long) can diverge from the oracle's
  * exact BIGINT ROW_NUMBER. With a long heap key the ordering is exact
  * at ANY weight, no domain clamp needed.
  */
case class RankedRowL(priority: Long, key: Long)

class TopKLong(k: Int) extends Aggregator[RankedRowL, Seq[RankedRowL], Seq[RankedRowL]] {
  require(k > 0, s"k must be positive, got $k")

  private def better(a: RankedRowL, b: RankedRowL): Boolean =
    a.priority > b.priority || (a.priority == b.priority && a.key < b.key)

  override def zero: Seq[RankedRowL] = Nil

  private def insert(buf: Seq[RankedRowL], x: RankedRowL): Seq[RankedRowL] =
    if (buf.size >= k && better(buf.last, x)) buf
    else ((buf :+ x).sortWith(better)).take(k)

  override def reduce(buf: Seq[RankedRowL], in: RankedRowL): Seq[RankedRowL] =
    insert(buf, in)

  override def merge(a: Seq[RankedRowL], b: Seq[RankedRowL]): Seq[RankedRowL] =
    b.foldLeft(a)(insert)

  override def finish(r: Seq[RankedRowL]): Seq[RankedRowL] = r

  override def bufferEncoder: Encoder[Seq[RankedRowL]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[RankedRowL]] = ExpressionEncoder()
}

object TopKLong {
  def apply(k: Int): expressions.UserDefinedFunction =
    udaf(new TopKLong(k), ExpressionEncoder[RankedRowL]())
}

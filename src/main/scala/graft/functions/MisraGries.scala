package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Misra–Gries k-counter frequency summary as a typed Catalyst
  * aggregate — the deterministic-guarantee sibling of the bounded
  * [[TopK]] heap on the custom-`Aggregator` axis (state: ≤ k map
  * entries, so partial buffers and the shuffle stay O(k) per
  * partition regardless of input size).
  *
  * reduce: increment a tracked token; admit an untracked one while
  * under k counters; otherwise decrement ALL counters by 1 (dropping
  * zeros) — the classic step that destroys k+1 units of count mass
  * per eviction event.
  *
  * merge [Agarwal et al., PODS'12]: sum counters pairwise; if over k
  * survive, subtract the (k+1)-th largest value from every counter
  * and drop non-positives. At least k+1 counters sit at or above that
  * cut, so each merge also destroys ≥ (k+1)·cut mass while reducing
  * any single counter by ≤ cut — the N/(k+1) undercount bound is
  * preserved under arbitrary merge trees, which is what makes the
  * summary safe for partial aggregation across any partitioning.
  *
  * The SURVIVOR SET is merge-order-dependent (only the guarantees are
  * deterministic), so query output must be theorem-audit form
  * ([[graft.operators.Sketches.q135MisraGries]]), never the raw map.
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    b.get(tok) match {
      case Some(c) => b.updated(tok, c + 1L)
      case None if b.size < k => b.updated(tok, 1L)
      case None =>
        b.iterator.flatMap { case (t, c) =>
          if (c > 1L) Some(t -> (c - 1L)) else None
        }.toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val m = (a.keySet ++ b.keySet).iterator
      .map(t => t -> (a.getOrElse(t, 0L) + b.getOrElse(t, 0L))).toMap
    if (m.size <= k) m
    else {
      val cut = m.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
      m.iterator.flatMap { case (t, c) =>
        if (c > cut) Some(t -> (c - cut)) else None
      }.toMap
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}

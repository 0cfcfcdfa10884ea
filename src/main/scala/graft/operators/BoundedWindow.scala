package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions.{hash, lit, pmod}

/** Global-order windows over BOUNDED relations without the WindowExec
  * "No Partition Defined" log warning (round-8 verdict item 7).
  *
  * An empty partition spec is semantically what these sites want — the
  * relation is post-limit / sample-sized (≤ a few hundred rows), so one
  * partition holding everything IS the plan — but every execution then
  * logs the warning, and a log full of benign warnings is exactly what
  * hides a REAL single-partition regression on a corpus-sized window.
  * Partitioning on `pmod(hash(anchor), 1)` sends every row to the same
  * partition (identical execution) while the expression stays
  * unfoldable (it references a column), so the optimizer can't strip it
  * back to the warning-triggering empty spec. Each piece is
  * load-bearing: `hash` (not a bare `anchor`) makes the key null-PROOF
  * for ANY anchor type — `anchor * 0` is NULL for null anchors,
  * silently splitting the relation into two partitions and corrupting
  * any cumulative frame crossing them, while Murmur3 of a null is the
  * (non-null) seed; `pmod(·, 1)` (not `· * 0`) defeats Spark 4's
  * multiply-by-zero simplification, which folds `hash(x) * 0` to a
  * literal that a follow-up rule strips from the partition spec —
  * warning back (probed: pmod/%/&/x−x all survive the optimizer,
  * `* 0` does not). An `isnull(anchor)`-based key fails a third way:
  * on a NON-nullable anchor NullPropagation folds it.
  *
  * Callers MUST be bounded relations; on a corpus-sized input this
  * would silently serialize the window onto one task with no warning —
  * the opposite of what the log hygiene is for.
  */
object BoundedWindow {
  /** The never-null, never-foldable constant-0 partition key. `hash`
    * returns non-null int for EVERY input (including null anchors and
    * non-numeric anchor types), and pmod(int, 1) is always exactly 0.
    */
  private def key(anchor: Column): Column = pmod(hash(anchor), lit(1))

  /** Single-partition window ordered by `order`, anchored on any column
    * of the relation (nullable and non-numeric anchors included).
    */
  def ordered(anchor: Column, order: Column*): WindowSpec =
    Window.partitionBy(key(anchor)).orderBy(order: _*)

  /** Single-partition unordered frame (whole-relation aggregate). */
  def all(anchor: Column): WindowSpec =
    Window.partitionBy(key(anchor))
}

package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions.{isnull, lit}

/** Global-order windows over BOUNDED relations without the WindowExec
  * "No Partition Defined" log warning (round-8 verdict item 7).
  *
  * An empty partition spec is semantically what these sites want — the
  * relation is post-limit / sample-sized (≤ a few hundred rows), so one
  * partition holding everything IS the plan — but every execution then
  * logs the warning, and a log full of benign warnings is exactly what
  * hides a REAL single-partition regression on a corpus-sized window.
  * Partitioning on `isnull(anchor)::int * 0` sends every row to the
  * same partition (identical execution) while the expression stays
  * unfoldable (it references a column), so the optimizer can't strip it
  * back to the warning-triggering empty spec. `isnull` (not `anchor *
  * 0`) makes the key null-PROOF for any anchor type: a bare `anchor *
  * 0` is NULL for null anchors, silently splitting the relation into
  * two partitions and corrupting any cumulative frame crossing them.
  *
  * Callers MUST be bounded relations; on a corpus-sized input this
  * would silently serialize the window onto one task with no warning —
  * the opposite of what the log hygiene is for.
  */
object BoundedWindow {
  /** The never-null, never-foldable constant-0 partition key. `isnull`
    * returns non-null boolean for EVERY input (including null anchors
    * and non-numeric anchor types), so `* 0` is always exactly 0.
    */
  private def key(anchor: Column): Column = isnull(anchor).cast("int") * lit(0)

  /** Single-partition window ordered by `order`, anchored on any column
    * of the relation (nullable and non-numeric anchors included).
    */
  def ordered(anchor: Column, order: Column*): WindowSpec =
    Window.partitionBy(key(anchor)).orderBy(order: _*)

  /** Single-partition unordered frame (whole-relation aggregate). */
  def all(anchor: Column): WindowSpec =
    Window.partitionBy(key(anchor))
}

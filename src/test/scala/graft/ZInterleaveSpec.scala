package graft

import org.apache.spark.sql.functions._

/** [[graft.functions.ZInterleave]]: hand-computed Morton keys, the
  * locality property that justifies the layout, masking, and nulls.
  */
class ZInterleaveSpec extends SparkSpec {
  import spark.implicits._

  private def z(x: Long, y: Long): Long = {
    graft.plans.GraftExtensions.register(spark)
    Seq((x, y)).toDF("x", "y")
      .select(call_function("z_interleave16", $"x", $"y").as("z"))
      .as[Long].head()
  }

  test("hand-computed interleaves") {
    // x=3 (0b11) → bits 0,2; y=5 (0b101) → bits 1,5 ⇒ 0b100111 = 39
    assert(z(3, 5) == 39L)
    assert(z(0, 0) == 0L)
    assert(z(1, 0) == 1L)
    assert(z(0, 1) == 2L)
    assert(z(0xFFFFL, 0xFFFFL) == 0xFFFFFFFFL) // full 32-bit envelope
    assert(z(0xFFFFL, 0) == 0x55555555L) // even bits
    assert(z(0, 0xFFFFL) == 0xAAAAAAAAL) // odd bits
  }

  test("inputs are masked to 16 bits; nulls propagate") {
    assert(z(0x10003L, 5) == 39L) // bit 16 dropped
    graft.plans.GraftExtensions.register(spark)
    val r = Seq((Some(1L), Option.empty[Long])).toDF("x", "y")
      .select(call_function("z_interleave16", $"x", $"y")).collect()
    assert(r.head.isNullAt(0))
  }

  test("locality: a 16×16 aligned tile is one contiguous 256-key range") {
    // the property file-level min/max pruning relies on: every aligned
    // 2^k × 2^k tile of dimension space maps to one contiguous key range,
    // so a z-range file holds a bounded box of BOTH dimensions
    graft.plans.GraftExtensions.register(spark)
    val tile = (0 until 16).flatMap(x => (0 until 16).map(y => (16L + x, 32L + y)))
    val keys = tile.toDF("x", "y")
      .select(call_function("z_interleave16", $"x", $"y").as("z"))
      .as[Long].collect().sorted
    assert(keys.length == 256)
    assert(keys.last - keys.head == 255L, "tile keys must be contiguous")
  }
}

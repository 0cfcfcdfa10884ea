package graft

import graft.operators.ConnectedComponents

/** Unit graphs for the label-propagation operator — shapes the q59
  * oracle can't isolate: multi-hop chains (transitivity over several
  * rounds), rings, multiple components, and the fail-loud cap.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], maxRounds: Int = 20): Map[Long, Long] =
    ConnectedComponents.labels(spark, edges.toDF("a", "b"), "a", "b", maxRounds)
      .as[(Long, Long)].collect().toMap

  test("chain collapses to its minimum over multiple rounds") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L))
  }

  test("ring and separate components get distinct minima") {
    val got = cc(Seq((10L, 11L), (11L, 12L), (12L, 10L), (20L, 21L), (30L, 31L)))
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("empty edge list yields empty labels without failing") {
    assert(cc(Nil).isEmpty)
  }

  test("a component deeper than the round cap fails loudly, not wrongly") {
    val chain = (1L to 30L).sliding(2).map(p => (p.head, p.last)).toSeq
    intercept[IllegalStateException] { cc(chain, maxRounds = 3) }
  }
}

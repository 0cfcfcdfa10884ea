package graft

import graft.operators.ConnectedComponents

/** Unit graphs for the star-alternation components operator — shapes the
  * q59/q88 oracles can't isolate: multi-hop chains (the r5-bench
  * regression: diameter beyond any flooding cap), rings, multiple
  * components, random graphs against a driver-side union-find oracle,
  * and the fail-loud round cap.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], maxRounds: Int = 50): Map[Long, Long] =
    ConnectedComponents.labels(spark, edges.toDF("a", "b"), "a", "b", maxRounds)
      .as[(Long, Long)].collect().toMap

  /** Driver-side union-find oracle: component = min reachable id. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

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

  test("200-node chain converges within the default cap (r5 bench regression)") {
    // min-label flooding needed 199 rounds here and threw at 20; star
    // alternation must finish in O(log²) rounds
    val chain = (1L to 200L).sliding(2).map(p => (p.head, p.last)).toSeq
    val got = cc(chain)
    assert(got.size == 200 && got.values.forall(_ == 1L))
  }

  test("random graphs match a driver-side union-find oracle") {
    val rnd = new scala.util.Random(41)
    for (_ <- 1 to 3) {
      val n = 80
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong + 1, rnd.nextInt(n).toLong + 1))
        .filter(e => e._1 != e._2)
      assert(cc(edges) == unionFind(edges))
    }
  }

  test("an insufficient round cap fails loudly, not wrongly") {
    // one alternation cannot star a 6-chain; the probe must throw
    val chain = (1L to 6L).sliding(2).map(p => (p.head, p.last)).toSeq
    intercept[IllegalStateException] { cc(chain, maxRounds = 1) }
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the grouping
  * primitive behind near-dup cluster assignment (q59, q78, q88) and any
  * entity-resolution step.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). Each
  * operation is one groupBy-min plus one shuffle-join on the node id;
  * the pair provably converges in O(log² n) rounds on ANY graph shape —
  * unlike min-label flooding, whose round count is the component
  * DIAMETER (a 10⁶-node chain needs 10⁶ flooding rounds but ~25
  * star rounds; the r5 bench hit exactly this with a >20-diameter
  * near-dup chain at sf0.1). Round cost is proportional to the current
  * edge relation, which star operations only shrink (toward one star
  * per component), so later rounds get cheaper.
  *
  *  - large-star: for every node u, hang all LARGER neighbors off
  *    m(u) = min(Γ(u) ∪ {u}) — long tails collapse toward small ids.
  *  - small-star: orient every edge (larger → smaller); hang each
  *    node's smaller neighbors (and itself) off its minimum —
  *    flattening multi-level trees into stars.
  *
  * Convergence: the edge multiset is a fixpoint iff it is a union of
  * stars rooted at component minima. The probe compares a per-round
  * (count, Σ xxhash64(u,v)) fingerprint — two scalars to the driver,
  * computed INSIDE the round's checkpoint job via `observe` so each
  * round spends exactly one driver action —
  * and confirms a fingerprint match with one exact `exceptAll` check
  * (same count + empty difference ⇒ same multiset), so a 64-bit hash
  * collision can cost one extra probe job, never a wrong answer.
  *
  * Lineage: the edge relation localCheckpoints each round. Without
  * truncation every probe re-executes the whole upstream pipeline and
  * the lineage deepens per round (measured 14 s vs 2 s for q59 at
  * sf0.1). These relations are survivor-set-sized (bounded by the dedup
  * candidate count), not corpus-sized — the no-persist-in-queries rule
  * targets the latter.
  */
object ConnectedComponents {

  /** One large-star round: u's larger neighbors re-attach to
    * min(Γ(u) ∪ {u}). Self-loops (v == m) drop via the v > u filter
    * only when u is its own minimum; explicit m =!= v keeps the
    * relation loop-free.
    */
  private def largeStar(edges: DataFrame): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    val sym = edges.select($"u", $"v")
      .unionAll(edges.select($"v".as("u"), $"u".as("v")))
    // whole-partition window min instead of groupBy+self-join: the
    // neighborhood minimum rides along each row after ONE hash exchange
    // on u, where the join formulation re-shuffles the edge relation a
    // second time. No distinct here either: duplicate (v,m) pairs are
    // bounded by |sym| and the composite round ends in smallStar's
    // distinct.
    val byU = Window.partitionBy($"u")
    sym.withColumn("m", least($"u", min($"v").over(byU)))
      .filter($"v" > $"u")
      .select($"v".as("u"), $"m".as("v"))
  }

  /** One small-star round: orient larger→smaller, then hang each node's
    * smaller neighbors and itself off its minimum.
    */
  private def smallStar(edges: DataFrame): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    val oriented = edges
      .select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
      .filter($"u" =!= $"v")
    val byU = Window.partitionBy($"u")
    val withM = oriented.withColumn("m", min($"v").over(byU))
    // (u,m) self-edges duplicate per neighbor row; the closing distinct
    // dedups them with the round's one intentional exchange
    val hangNbrs = withM.filter($"v" =!= $"m").select($"v".as("u"), $"m".as("v"))
    val hangSelf = withM.select($"u", $"m".as("v"))
    hangNbrs.unionAll(hangSelf).distinct()
  }

  /** @param edges     two-column relation; each row an undirected edge.
    *                  Endpoint columns must be non-null longs (orderable).
    * @param aCol,bCol endpoint column names
    * @param maxRounds alternation-round cap before failing loudly —
    *                  O(log² n) suffices, so the default covers any
    *                  physically storable graph
    * @return (node, component) — component = min node id reachable;
    *         isolated nodes (no edges) are absent, callers union them
    *         back as their own singletons if needed
    */
  /** Observation names must be JVM-unique; labels() can run many times
    * per session (three CC consumers × bench passes).
    */
  private val obsSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Checkpoint `df` and return (checkpointed df, fingerprint), spending
    * ONE driver action: the (count, Σhash) fingerprint rides the eager
    * checkpoint's materialization job as an [[Observation]]
    * (CollectMetrics node), instead of a second scan-and-agg job. On a
    * small-diameter graph the per-round cost is dominated by fixed job
    * overhead, so halving actions-per-round halves the floor under every
    * CC consumer (q59/q88/q118 — the round-6 verdict's #1 watch-item).
    * The observation completes on the async QueryExecutionListener bus;
    * a bounded await plus an explicit-agg fallback keeps a lost listener
    * event a slow round, never a hang or a wrong fingerprint.
    */
  private def checkpointWithFingerprint(df: DataFrame): (DataFrame, (Long, String)) = {
    import df.sparkSession.implicits._
    val obs = org.apache.spark.sql.Observation(s"cc_fp_${obsSeq.getAndIncrement()}")
    // hashes sum in DECIMAL(38,0): 2^63-magnitude longs overflow an
    // ANSI long sum after a handful of rows
    val ck = df.observe(obs, count(lit(1)).as("cnt"),
        coalesce(sum(xxhash64($"u", $"v").cast("decimal(38,0)")), lit(0)).as("hs"))
      .localCheckpoint()
    val awaitT0 = System.nanoTime()
    val m = try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      Await.result(Future(obs.get), 60.seconds)
    } catch { case _: java.util.concurrent.TimeoutException => Map.empty[String, Any] }
    if (sys.env.contains("SPARK_GRAFT_CC_DEBUG"))
      System.err.println(f"[cc] obs await ${(System.nanoTime() - awaitT0) / 1e6}%.0f ms (hit=${m.nonEmpty})")
    val fp =
      if (m.nonEmpty) (m("cnt").asInstanceOf[Long], String.valueOf(m("hs")))
      else {
        val r = ck.agg(count(lit(1)),
          coalesce(sum(xxhash64($"u", $"v").cast("decimal(38,0)")), lit(0))).head
        (r.getLong(0), String.valueOf(r.get(1)))
      }
    (ck, fp)
  }

  def labels(s: SparkSession, edges: DataFrame, aCol: String, bCol: String,
             maxRounds: Int = 50): DataFrame = {
    import s.implicits._
    // Rejected alternative, measured: running the loop's actions with
    // AQE off (fewer jobs — each AQE query stage is its own job, ~4×
    // per round) was ~0.5 s SLOWER on q88 than leaving AQE on. The
    // extra jobs are cheap incremental stage materializations; the
    // coalesce-to-one-partition AQE applies to these tiny exchanges is
    // worth more than the job-count reduction. The action-count lever
    // that DID pay is the observe-fold above.
    {
      var (e, prevFp) = checkpointWithFingerprint(
        edges.select(col(aCol).as("u"), col(bCol).as("v"))
          .filter($"u" =!= $"v")
          .select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
          .distinct())
      if (prevFp._1 == 0L) return e.select($"u".as("node"), $"v".as("component"))
      var converged = false
      var rounds = 0
      // Rejected alternative, measured (same host window, min-of-6):
      // checkpointing/probing every TWO composite rounds — to halve the
      // per-round action + materialization floor — was ~0.9 s SLOWER on
      // q88 (4.5 vs 3.6 s floor). The probe stride doesn't change the
      // exchange count per round, and fingerprint equality is now
      // detected a full stride late, so the loop runs up to two extra
      // rounds of real exchanges past the fixpoint — more than the
      // saved fixed cost on the small-round graphs the dedup tiers
      // produce (6 rounds at sf0.1).
      while (!converged && rounds < maxRounds) {
        val (next, nextFp) = checkpointWithFingerprint(smallStar(largeStar(e)))
        if (nextFp == prevFp) {
          // hash agreement is probabilistic; confirm exactly once per
          // convergence (equal counts + empty difference ⇒ equal multisets)
          converged = next.exceptAll(e).isEmpty
        }
        prevFp = nextFp
        // previous rounds' checkpoint blocks are survivor-set-sized and
        // reclaimed by the ContextCleaner once `e` rebinds
        e = next
        rounds += 1
      }
      if (sys.env.contains("SPARK_GRAFT_CC_DEBUG"))
        System.err.println(s"[cc] converged=$converged rounds=$rounds")
      if (!converged) throw new IllegalStateException(
        s"star alternation did not converge in $rounds rounds — " +
          "raise maxRounds (O(log² n) bounds it; this graph should be inspected)")
      // fixpoint is a star forest oriented child(u) → root(v): every node's
      // label is its root; roots label themselves
      e.select($"u".as("node"), $"v".as("component"))
        .unionAll(e.select($"v".as("node"), $"v".as("component")))
        .groupBy($"node").agg(min($"component").as("component"))
    }
  }
}

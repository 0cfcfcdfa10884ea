package graft

import org.scalatest.Tag

/** Cross-round performance regression guard (round-6 verdict item 5):
  * every registered query must finish inside a loose per-query wall
  * ceiling at sf0.01, so a CATASTROPHIC complexity regression — an
  * accidental cartesian, a lost broadcast hint flooding a sort-merge
  * join, a dropped cap turning a bounded verify quadratic — fails CI
  * instead of waiting for the next bench diff. Ceilings are ~5× the
  * measured steady-state (min-of-2, warm, 32-thread local) with a 2 s
  * floor; TIGHT plan pins live in PlanSpec — this suite's job is the
  * order-of-magnitude tier, which is robust to host jitter.
  *
  * Host-noise posture: this guest intermittently degrades to ~8 MB/s
  * page-fault-in (see build.sbt). Each query gets up to 3 attempts and
  * the MINIMUM is compared — an isolated multi-second stall on one
  * attempt cannot fail the suite. A fixed calibration probe measures
  * the host first: ceilings scale with the measured slowdown, and a
  * host running > 8× slow cancels the suite (yellow, not red) — a
  * degraded guest is not a plan regression.
  */
object SlowTag extends Tag("graft.Slow")

class PerfCeilingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  /** Steady-state seconds for the ≥ 0.8 s tier (bench at sf0.01,
    * min-of-2 warm passes, round 7); unlisted queries default to 0.8 s.
    * Ceiling = max(5 × steady, 2 s) × calibration.
    */
  private val steady: Map[String, Double] = Map(
    // replay-class queries execute dozens of real merge/stream
    // write-read cycles (driver actions + filesystem commits), so their
    // sf0.01 wall is commit-latency-bound, not plan-bound — ambient
    // sensitivity is higher and the default-0.8 ceiling misfires on a
    // mid-suite degraded window (round-11 q168 false positive)
    "q168_scd2_replay" -> 1.60,
    "q198_schema_evolution_replay" -> 1.40,
    "q199_erase_merge_interleave" -> 1.40,
    "q201_stats_skipping_scan" -> 1.80,
    "q202_change_data_feed" -> 3.00,
    "q203_cdf_view_maintenance" -> 2.60,
    "q204_cdf_replication" -> 2.80,
    "q205_bloom_point_lookup" -> 2.60,
    "q206_partition_evolution" -> 2.40,
    "q207_transform_with_state" -> 2.20,
    "q208_zorder_box_scan" -> 1.80,
    "q209_lock_import" -> 2.40,
    "q210_streaming_cdf_view" -> 5.20,
    "q211_streaming_cdf_live" -> 5.00,
    "q212_streaming_replication" -> 8.20,
    "q160_first_wins_replay" -> 1.40,
    "q167_stream_neardup_gate" -> 1.60,
    "q169_stream_join_replay" -> 1.20,
    "q172_session_window_replay" -> 1.20,
    "q174_incremental_rollup" -> 1.20,
    "q175_time_travel" -> 1.20,
    "q182_cdc_tombstones" -> 1.20,
    "q184_join_view_maintenance" -> 1.20,
    "q88_semdedup" -> 2.34,
    "q118_simhash_clusters" -> 2.05,
    "q59_dedup_clusters" -> 2.04,
    "q78_curation_pipeline" -> 1.81,
    "q74_pq_adc" -> 1.34,
    "q56_winnow_fingerprint" -> 1.31,
    "q46_approx_distinct" -> 1.31,
    "q55_kmeans" -> 1.22,
    "q93_interpolate" -> 1.18,
    "q102_bfs_distance" -> 1.14,
    "q101_pagerank" -> 1.04,
    "q43_ann_lsh" -> 0.93,
    "q76_ivf_search" -> 0.92,
    // round-7 additions (same measurement protocol)
    "q124_bpe_train" -> 2.78,
    "q127_pca_power" -> 2.21,
    "q123_dsir_importance" -> 1.52,
    "q126_hard_negatives" -> 1.26,
    "q125_dup_span_coverage" -> 1.09,
    "q132_label_prop" -> 1.47,
    "q131_bm25" -> 1.00,
    // round-8 additions / re-measurements (same protocol): q122 dropped
    // to 0.33 s once the bucketed write became create-if-absent (0.8 s
    // floor applies); q37's audit now derives its ground truth by
    // prefix filtering instead of the embedded q36 chain
    "q133_bpe_encode" -> 1.85,
    "q136_kcore_peel" -> 1.14,
    "q134_allpairs_join" -> 0.90,
    "q139_curriculum_phases" -> 1.71,
    "q141_canonical_selection" -> 3.45,
    "q142_incremental_cc" -> 1.88,
    "q143_matryoshka_audit" -> 0.88,
    "q144_context_assembly" -> 0.98,
    "q37_simhash_dedup" -> 1.40)

  private def timeOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  test("every registered query stays under its sf0.01 wall ceiling", SlowTag) {
    // calibration: a fixed scan+agg probe, steady ≈ 0.2–0.4 s on a
    // healthy host (first run pays session/codegen warmup, so min-of-3)
    val calib = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .selectExpr("sum(l_quantity)", "count(distinct l_returnflag)").collect()
      (System.nanoTime() - t0) / 1e9
    }.min
    val scale = math.max(1.0, calib / 0.4)
    assume(scale <= 8.0,
      f"host calibration probe took $calib%.1f s (${scale}%.1f× slow) — degraded guest, not a plan signal")

    val failures = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val ceiling = math.max(5.0 * steady.getOrElse(name, 0.8), 2.0) * scale
      var best = Double.MaxValue
      var attempt = 0
      while (attempt < 3 && best > ceiling) {
        best = math.min(best, timeOnce(fn))
        attempt += 1
      }
      if (best > ceiling)
        failures += f"$name: min-of-$attempt = $best%.2f s > ceiling $ceiling%.2f s"
    }
    assert(failures.isEmpty,
      s"per-query wall ceilings exceeded (catastrophic plan regression?):\n  ${failures.mkString("\n  ")}")
  }

  test("plan-sensitive tier stays under 3× steady-state at sf0.1", SlowTag) {
    // Tighter ceilings for the queries whose historical regressions were
    // REAL and measured at sf0.1 — each entry names the failure mode the
    // ceiling re-catches:
    //  q105 2.0 s  — per-shingle window skew (round 5: >4 s)
    //  q54  1.1 s  — HOF dot product evaluated interpreted, twice per
    //                pair (round 5: ~2× the query)
    //  q102 2.0 s  — full-relabel BFS instead of delta-frontier
    //                (round 5: 4.54 s)
    //  q35  1.8 s  — broken exchange reuse re-ran the shingle pipeline
    //                per branch (round 1: 24.5 s)
    //  q114 1.05 s — the fused retrieval flagship; its round-5 lexical-
    //                arm regression costs only ~0.15 s on current code
    //                at sf0.1, so the WALL ceiling cannot see it —
    //                validated deliberately: re-introducing the
    //                distinct-before-filter shape passes this test but
    //                fails PlanSpec's "lexical arm broadcast-filtered
    //                BEFORE any exchange" pin. Division of labor: plan
    //                pins catch shape regressions whose cost only
    //                materializes at 100 TB; these ceilings catch
    //                complexity blowups (lost cap, lost broadcast,
    //                accidental cartesian) that are visible at sf0.1.
    val sf01 = "/root/testdata/sf0.1"
    val tier = Seq( // (name, steady-state seconds at sf0.1, min-of-3)
      "q114_hybrid_retrieval" -> 1.05,
      "q105_dup_shingle_frac" -> 1.97,
      "q54_embedding_dedup" -> 1.10,
      "q102_bfs_distance" -> 1.95,
      "q35_ngram_jaccard" -> 1.75)
    val calib = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.read.parquet(s"$sf01/lineitem.parquet")
        .selectExpr("sum(l_quantity)", "count(distinct l_returnflag)").collect()
      (System.nanoTime() - t0) / 1e9
    }.min
    val scale = math.max(1.0, calib / 0.6)
    assume(scale <= 8.0,
      f"host calibration probe took $calib%.1f s — degraded guest, not a plan signal")
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    tier.foreach { case (name, ss) =>
      val fn = SparkEntry.queries(name)
      val ceiling = 3.0 * ss * scale
      var best = Double.MaxValue
      var attempt = 0
      while (attempt < 3 && best > ceiling) {
        val t0 = System.nanoTime()
        fn(spark, sf01).write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        attempt += 1
      }
      if (best > ceiling)
        failures += f"$name: min-of-$attempt = $best%.2f s > ceiling $ceiling%.2f s (3× steady $ss%.2f s)"
    }
    assert(failures.isEmpty,
      s"plan-sensitive sf0.1 ceilings exceeded:\n  ${failures.mkString("\n  ")}")
  }
}

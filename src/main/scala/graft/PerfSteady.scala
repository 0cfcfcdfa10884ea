package graft

/** Healthy-host steady-state wall seconds per query at sf0.1 — the
  * reference ladder the bench adjudicates itself against (round-11
  * verdict item 3). Values are the slow tier of the round-11
  * authoritative record (min-of-2, calib 0.19/0.18, 32-thread local)
  * rounded up slightly; queries not listed sit in the sub-second
  * relational tier and take [[DefaultSf01]].
  *
  * Purpose: at ≥195 registered queries a single pass is ~deadline/2, so
  * healthy runs are often min-of-1 — which has NO pass-dispersion
  * signal. Two clean calibration probes bracket the run, but a
  * transient storm BETWEEN them could still inflate a handful of
  * queries. The per-query check closes that hole: a query running
  * > max(3.5 × steady, 3.5 s) is an OUTLIER; more than a couple of
  * outliers in a single-pass run means a mid-run storm (or a real
  * regression) and the artifact self-disqualifies either way — a
  * reader re-runs before adjudicating. The replay-class queries carry
  * honest commit-latency-bound entries so their by-design seconds
  * never trip the gate; ADD AN ENTRY HERE when registering a new
  * replay/iterative query (anything ≥ 2 s healthy).
  */
object PerfSteady {
  /** Sub-second relational tier default (healthy sf0.1 mean ≈ 0.8 s). */
  val DefaultSf01 = 1.0

  val sf01: Map[String, Double] = Map(
    // replay-class (dozens of real merge/stream/manifest commit cycles)
    "q168_scd2_replay" -> 6.9,
    "q167_stream_neardup_gate" -> 4.7,
    "q175_time_travel" -> 3.7,
    "q160_first_wins_replay" -> 3.1,
    "q182_cdc_tombstones" -> 3.2,
    "q172_session_window_replay" -> 2.6,
    "q186_erasure_replay" -> 2.2,
    "q169_stream_join_replay" -> 2.2,
    "q184_join_view_maintenance" -> 1.9,
    "q174_incremental_rollup" -> 1.7,
    "q188_stream_dedup_replay" -> 1.3,
    "q100_dedup_increment" -> 1.4,
    "q198_schema_evolution_replay" -> 3.8,
    "q199_erase_merge_interleave" -> 3.2,
    // lake replays (manifest commits + feed reconstruction) — refreshed
    // round 13 on the grouped single-scan read path (authoritative run:
    // 336.9 s / 207 q, calib 0.18/0.18, 0 outliers); q204 includes the
    // syncTo verb's idempotent second pass
    // round-15 re-anchors (parallel clustering rewrites + leaner merge
    // path + per-write committer v2 — see OPTIMIZATION_r15.md): steady =
    // round-15 authoritative full-bench draw × ~1.3 headroom
    "q201_stats_skipping_scan" -> 4.0,
    "q202_change_data_feed" -> 4.8,
    "q203_cdf_view_maintenance" -> 4.5,
    // round-14: syncTo coalesces catch-up into one endpoint hop — 3
    // replica commits instead of ~8 (authoritative round-14 record:
    // 4.93 s, calib 0.20/0.17, 0 outliers)
    "q204_cdf_replication" -> 5.4,
    "q205_bloom_point_lookup" -> 4.5,
    "q206_partition_evolution" -> 4.0,
    "q207_transform_with_state" -> 5.0,
    "q208_zorder_box_scan" -> 3.2,
    // round-13: lock-path import + post-import merge (two manifest
    // commits; in-place @root references since round 14)
    "q209_lock_import" -> 3.0,
    // round-14: TWO AvailableNow streaming passes (engine checkpoint
    // restart is the point) + 3 source commits + per-span view merges —
    // stream-startup + commit-latency bound by design (authoritative
    // round-14 record: 5.77 s; headroom for trigger-timing wobble)
    "q210_streaming_cdf_view" -> 6.2,
    // round-15: the LIVE ProcessingTime trigger — one continuous query
    // following two commits + an erasure at 250 ms cadence, stopped on
    // the durable offset reaching the source head (round-15 calibration:
    // 6.95 s raw at anchor ratio 1.18, ≈ 5.9 normalized; headroom for
    // trigger-timing wobble)
    "q211_streaming_cdf_live" -> 7.0,
    // round-15: TWO AvailableNow streaming passes driving syncTo's
    // merge + erase + offset commit cycles on the replica — the
    // heaviest replay query by commit count (round-15 calibration:
    // 9.09 s raw at anchor ratio 1.22, ≈ 7.5 normalized)
    "q212_streaming_replication" -> 9.0,
    // iterative / heavy-verify tier
    "q165_frequent_triples" -> 4.3,
    "q88_semdedup" -> 4.0,
    "q118_simhash_clusters" -> 3.5,
    "q78_curation_pipeline" -> 3.4,
    "q142_incremental_cc" -> 2.9,
    "q141_canonical_selection" -> 3.0,
    "q37_simhash_dedup" -> 2.9,
    "q74_pq_adc" -> 2.9,
    "q59_dedup_clusters" -> 2.8,
    "q136_kcore_peel" -> 2.8,
    "q194_table_stats" -> 2.3,
    "q101_pagerank" -> 2.6,
    "q150_cross_source_dups" -> 2.5,
    "q163_ann_recall_audit" -> 2.5,
    "q124_bpe_train" -> 2.5,
    "q134_allpairs_join" -> 2.5,
    "q127_pca_power" -> 2.3,
    "q35_ngram_jaccard" -> 2.2,
    "q102_bfs_distance" -> 2.1,
    "q105_dup_shingle_frac" -> 2.1,
    "q56_winnow_fingerprint" -> 2.1,
    "q133_bpe_encode" -> 2.0,
    "q108_triangle_count" -> 2.1,
    "q09_rollup" -> 2.3,
    "q132_label_prop" -> 1.6,
    "q139_curriculum_phases" -> 1.8)

  def at(name: String): Double = sf01.getOrElse(name, DefaultSf01)
}

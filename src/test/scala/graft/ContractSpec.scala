package graft

/** Driver-contract integrity: a typo'd map key would silently demote a
  * query from hash-checked to unchecked (the driver only checks names
  * present in BOTH maps), so pin the registry shape explicitly.
  */
class ContractSpec extends SparkSpec {

  test("every oracle key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL for unregistered queries: $orphans")
  }

  test("EVERY registered query has an oracle — no rows-only checks remain") {
    // Round 7 closed the last four no_oracle entries: q36's verified
    // pair set is hash-free and oracle-equal under recall-1 banding;
    // q37/q43/q46 ship planted-invariant audit outputs (ground-truth
    // counts DuckDB recomputes from raw data + floors the sketch must
    // clear). A query added without an oracle is a silent demotion to
    // unchecked — fail here instead.
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"queries without an oracle (add oracleSql or a justified audit form): $noOracle")
  }

  test("no query name collides across operator objects (++ would silently replace)") {
    // SparkEntry.queries is a ++ of per-object maps: a name reused in
    // two objects would drop one implementation with no error anywhere.
    // Sum the per-object counts and compare against the merged size.
    import graft.operators._
    val perObject = Seq(
      Relational.queries, Relational2.queries, Relational3.queries,
      EventOps.queries, TextOps.queries, VectorOps.queries, SeqOps.queries,
      CorpusOps.queries, StatsOps.queries, Curation.queries,
      PortableMinHash.queries, PortableAnn.queries, Mixing.queries,
      SemDedup.queries, RuntimeFilter.queries, Indicators.queries,
      Drift.queries, GraphOps.queries, LmOps.queries, Sketches.queries,
      Retrieval.queries, PortableSimHash.queries, Fuzzy.queries, DimOps.queries,
      LakeOps.queries)
    val flat = perObject.flatMap(_.keys)
    val dups = flat.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"query names registered by more than one object: $dups")
    // the queries registered directly in SparkEntry's closing Map must
    // be exactly the engine-sketch/multimodal set — and must not shadow
    // any object-registered name
    val direct = SparkEntry.queries.keySet -- flat.toSet
    assert(direct == Set("q36_minhash_dedup", "q37_simhash_dedup",
      "q43_ann_lsh", "q50_blob_meta", "q51_image_pipeline",
      "q117_audio_pipeline", "q119_video_pipeline",
      "q146_blob_dedup", "q147_blob_attr_fingerprint",
      "q166_image_resize_plan"),
      s"unexpected direct registrations: $direct")
    assert(SparkEntry.queries.size == flat.size + direct.size,
      s"merged registry lost entries: ${SparkEntry.queries.size} vs ${flat.size} + ${direct.size}")
  }

  test("entry() returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1)
  }
}

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

  test("entry() returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1)
  }
}

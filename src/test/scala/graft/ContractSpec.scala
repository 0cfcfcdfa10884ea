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

  test("exactly the four justified sketch/seed queries lack an oracle") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val justified = Set(
      "q36_minhash_dedup",   // xxhash64 seeds are engine-specific
      "q37_simhash_dedup",   // same
      "q43_ann_lsh",         // SRP plane seeds are engine-specific
      "q46_approx_distinct") // HLL sketch encoding is engine-specific
    assert(noOracle == justified,
      s"unexpected oracle coverage change: missing=${justified -- noOracle} new=${noOracle -- justified}")
  }

  test("entry() returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1)
  }
}

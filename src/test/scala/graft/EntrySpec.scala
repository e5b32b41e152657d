package graft

/** Guards the driver's smoke check: entry() must return rows. */
class EntrySpec extends SparkSpec {
  test("SparkEntry.entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("every query has either an oracle or a documented rows-only status") {
    // the 2 ANN queries: bucket layouts are float-order-sensitive
    // cross-engine; recall vs brute force is asserted in SimilaritySpec
    val rowsOnly = Set("q_knn_lsh", "q_knn_ivf")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == rowsOnly, s"undocumented rows-only queries: ${missing -- rowsOnly}")
    // and no orphan oracle entries
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }
}

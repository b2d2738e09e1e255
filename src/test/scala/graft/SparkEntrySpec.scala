package graft

/** The driver contract surface itself: the smoke entry point returns
  * rows, every declared query has an oracle, and the oracle SQL map
  * carries no stray names. */
class SparkEntrySpec extends SparkSpec {

  test("entry() returns rows on the smoke fixture (the driver's t1 check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracleSql cover each other exactly") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o,
      s"queries without oracle: ${(q -- o).toSeq.sorted}; " +
        s"oracles without query: ${(o -- q).toSeq.sorted}")
  }
}

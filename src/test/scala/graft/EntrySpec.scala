package graft

/** Mirrors the driver's smoke check: entry() on sf0.001 yields rows. */
class EntrySpec extends SparkTestBase {
  test("entry: flagship violation derivation returns rows at sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("violation_type"))
    assert(df.columns.contains("details"))
  }

  test("every registered query has matching column sets vs its oracle name expectations") {
    // structural guard: queries and oracleSql share keys (oracle may be a
    // subset for non-SQL-expressible ops — currently none)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size == 118)
    assert(SparkEntry.oracleSql.size == 118)
  }
}

package graft

/** Mirrors the driver's smoke check: entry() on sf0.001 yields rows. */
class EntrySpec extends SparkTestBase {
  test("entry: flagship violation derivation returns rows at sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("violation_type"))
    assert(df.columns.contains("details"))
  }

  test("registry is structurally consistent: distinct names, oracle for every query") {
    // Structural guards instead of a literal count (a pinned number went
    // stale twice when queries landed after the pin): every QueryDef name
    // is unique, the maps are exactly the defs, and every query carries an
    // oracle (non-SQL-expressible ops would shrink oracleSql — currently
    // none, so equality is the tightest valid assertion).
    val defs = SparkEntry.allDefs
    val names = defs.map(_.name)
    assert(names.distinct.sizeIs == names.size,
      s"duplicate query names: ${names.diff(names.distinct).distinct}")
    assert(SparkEntry.queries.keySet == names.toSet)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    val unoracled = names.toSet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"queries without an oracle: $unoracled")
  }
}

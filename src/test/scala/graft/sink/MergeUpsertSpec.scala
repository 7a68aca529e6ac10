package graft.sink

import org.scalatest.funsuite.AnyFunSuite

/** Statement construction for the MERGE swap-in (execution needs a
  * Delta/Iceberg catalog — environment-blocked; docs/SWAP_IN.md). */
class MergeUpsertSpec extends AnyFunSuite {

  test("mergeSql renders replace-on-key upsert with non-key SET list") {
    val sql = MergeUpsert.mergeSql("t.sessions", "src",
      Seq("device_uuid", "start", "touches"), Seq("device_uuid"))
    assert(sql.contains("MERGE INTO t.sessions t"))
    assert(sql.contains("ON t.`device_uuid` = s.`device_uuid`"))
    assert(sql.contains(
      "UPDATE SET t.`start` = s.`start`, t.`touches` = s.`touches`"))
    assert(sql.contains(
      "INSERT (`device_uuid`, `start`, `touches`) " +
        "VALUES (s.`device_uuid`, s.`start`, s.`touches`)"))
  }

  test("key-only schema renders insert-if-absent (no UPDATE clause)") {
    val sql = MergeUpsert.mergeSql("c.grams", "src", Seq("h"), Seq("h"))
    assert(!sql.contains("WHEN MATCHED"))
    assert(sql.contains("WHEN NOT MATCHED THEN INSERT (`h`) VALUES (s.`h`)"))
  }

  test("keys must be present in the column list") {
    intercept[IllegalArgumentException] {
      MergeUpsert.mergeSql("t", "s", Seq("a"), Seq("missing"))
    }
  }
}

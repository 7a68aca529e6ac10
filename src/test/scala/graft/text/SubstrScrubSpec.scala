package graft.text

import graft.SparkTestBase

/** substr_scrub: the span-excision rewrite of the substring-dedup
  * family. Pins (1) token conservation (kept + removed = original, per
  * doc), (2) canonical-keeps-all (the lowest-doc_id copy of a duplicated
  * passage is never scrubbed), (3) duplicate-loses-span (a verbatim
  * 8-token copy in a higher doc_id is fully excised), and (4) rewrite
  * determinism via the cleaned-text md5 on a hand-computed fixture. */
class SubstrScrubSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def run(dir: String) =
    graft.SparkEntry.queries("substr_scrub")(spark, dir)

  test("token conservation: n_kept + n_removed = n_tok for every doc") {
    val bad = run(sfDir)
      .filter(org.apache.spark.sql.functions
        .expr("n_kept + n_removed <> n_tok OR n_removed < 0 OR n_kept < 0"))
      .count()
    assert(bad === 0L)
  }

  test("row per document and md5 shape") {
    val out = run(sfDir).collect()
    assert(out.length === 500)
    assert(out.forall(_.getAs[String]("clean_md5").matches("[0-9a-f]{32}")))
  }

  test("fixture: canonical doc keeps the passage, the copy is excised") {
    import spark.implicits._
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha $shared omega", "en", "src0", 0L),
      (2L, s"beta $shared gamma delta", "en", "src0", 0L),
      (3L, "plain words nothing here repeats at all", "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("scrub_fix").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = run(dir).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap
    // doc 1 is canonical (lowest doc_id containing the shared window):
    // nothing removed, md5 of the original space-rejoined text
    assert(out(1L) === ((10L, 0L, 10L,
      org.apache.commons.codec.digest.DigestUtils.md5Hex(
        s"alpha $shared omega"))))
    // doc 2 loses exactly the 8 shared tokens; kept = beta gamma delta
    assert(out(2L) === ((11L, 8L, 3L,
      org.apache.commons.codec.digest.DigestUtils.md5Hex(
        "beta gamma delta"))))
    // doc 3 untouched
    assert(out(3L)._2 === 0L)
    graft.SharedStages.clear()
  }

  test("long doc: mostly-duplicated 20k-token doc rewrites linearly") {
    // the case the linear kept-token form exists for: |rem| ≈ n_tok ≈
    // 20 000, where the former per-token array_contains lambda did
    // O(n_tok·|rem|) ≈ 4·10⁸ comparisons per doc and the
    // array_except walk does O(n_tok + |rem|)
    import spark.implicits._
    val n = 20000
    val body = (1 to n).map(i => s"a$i").mkString(" ")
    val docs = Seq(
      (1L, body, "en", "src0", 0L),
      (2L, s"uniq1 uniq2 $body", "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("scrub_long").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = run(dir).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap
    // doc 1 canonical: untouched
    assert(out(1L) === ((n.toLong, 0L, n.toLong,
      org.apache.commons.codec.digest.DigestUtils.md5Hex(body))))
    // doc 2: every body token sits in a duplicated window whose
    // canonical home is doc 1; only the two unique lead tokens (whose
    // covering windows exist nowhere else) survive
    assert(out(2L) === ((n.toLong + 2, n.toLong, 2L,
      org.apache.commons.codec.digest.DigestUtils.md5Hex("uniq1 uniq2"))))
    graft.SharedStages.clear()
  }
}

package graft.embed

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** whiten_gate is the decision edge on whiten_check's eigen-share
  * verdict: raw cosine on a near-isotropic corpus, ABTT-residual
  * cosine on an anisotropic one. The registry fixtures are
  * near-isotropic, so the oracle only ever certifies the raw branch —
  * this spec crafts an anisotropic corpus (every vector shares one
  * dominant direction) to drive the OTHER branch and pins both the
  * switch and the reason the switch exists (the shared direction
  * inflates every raw cosine; the residual metric deflates them). */
class WhitenGateSpec extends SparkTestBase {
  import spark.implicits._

  test("near-isotropic fixture corpus keeps the raw branch (= embedPairs)") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("whiten_gate")(spark, dir)
    val modes = out.select("mode").distinct().as[String].collect().toSet
    assert(modes == Set("raw"), s"expected raw branch, got $modes")
    assert(out.count() == graft.SharedStages.embedPairs(spark, dir).count())
  }

  test("anisotropic corpus flips the gate to abtt and deflates the pair set") {
    val dir = java.nio.file.Files.createTempDirectory("wgate").toString
    val r = new scala.util.Random(11)
    val d = 64
    val u = Array.fill(d)(r.nextDouble() - 0.5)
    val un = math.sqrt(u.map(x => x * x).sum)
    val rows = (0 until 80).map { i =>
      val a = 0.5 + r.nextDouble() // positive common-direction weight
      val emb = (0 until d).map { j =>
        (a * u(j) / un + 0.05 * (r.nextDouble() - 0.5)).toFloat
      }
      (i.toLong, emb, 1 + i % 4)
    }
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val out = graft.SparkEntry.queries("whiten_gate")(spark, dir)
      .localCheckpoint()
    val modes = out.select("mode").distinct().as[String].collect().toSet
    assert(modes == Set("abtt"), s"expected abtt branch, got $modes")
    // the raw metric at 0.35 calls nearly every pair a near-dup here
    // (the common direction inflates all cosines); the gated residual
    // metric keeps only genuinely-aligned noise, i.e. strictly fewer
    val rawPairs = Similarity.cosinePairsBlocked(
      graft.Tables.embeddings(spark, dir),
      "vec_id", "embedding", "label", 0.35).count()
    val gated = out.count()
    assert(gated > 0, "abtt branch produced no rows — widen the fixture")
    assert(gated < rawPairs,
      s"residual metric should deflate the pair set: $gated !< $rawPairs")
  }
}

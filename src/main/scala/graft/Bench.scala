package graft

import org.apache.spark.sql.SparkSession

/** Bench main (driver contract): one JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR.
  *
  * Methodology: a warmup pass at sf0.001 first (JIT + codegen caches —
  * otherwise the first query pays ~5 s of JVM warmup and the numbers
  * measure HotSpot, not the plans), then each query timed end-to-end
  * with a `noop`-sink write, which materializes every output column
  * (`count()` would let Catalyst skip projections entirely).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String, dir: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()

    val names = SparkEntry.queries.keys.toSeq.sorted
    // warmup at the smallest SF (JIT, codegen cache, parquet footers)
    names.foreach { n =>
      try materialize(n, "/root/testdata/sf0.001")
      catch { case _: Throwable => () }
    }

    val results = names.map { name =>
      val t0 = System.nanoTime()
      try materialize(name, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // 3-decimal seconds: the driver captures a bounded stdout tail, and
    // round 3's full-precision line (~2.9 kB across 64 queries) was
    // head-truncated past parseability. 1 ms resolution is plenty.
    def sec3(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) => "\"" + k + "\":" + sec3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum

    // Streaming E2E latency at two triggers, next to the reference's
    // published 8 ms p50 / 26 ms p95 (BASELINE.md) — measured, not
    // declared. SPARK_GRAFT_LATENCY=0 skips (e.g. quick local loops).
    val latJson =
      if (sys.env.get("SPARK_GRAFT_LATENCY").contains("0")) ""
      else {
        def num(x: Double) = if (x.isNaN) "null" else math.round(x).toString // JSON-safe, whole ms
        val per = Seq(100L, 1000L).map { trig =>
          val (p50, p95, n) = graft.metrics.LatencyBench.run(spark, trig)
          s""""trigger_${trig}ms":{"p50_ms":${num(p50)},"p95_ms":${num(p95)},"n":$n}"""
        }.mkString(",")
        // Stateful sessionize path measured twice: the operator +
        // exactly-once machinery alone (100 ms trigger), and with the
        // BucketStore merge sink at a 250 ms trigger matched to the
        // sink's service rate (a heavy sink under a faster trigger only
        // measures backlog growth; the store's production swap-in is a
        // MERGE-capable table format).
        val (so50, so95, son) =
          graft.metrics.LatencyBench.runStateful(spark, 100L, withStore = false)
        val (sp50, sp95, sn) = graft.metrics.LatencyBench.runStateful(spark, 250L)
        val stateful =
          s""""stateful_session_path":{"p50_ms":${num(so50)},"p95_ms":${num(so95)},"n":$son,"trigger_ms":100},""" +
            s""""stateful_session_store_path":{"p50_ms":${num(sp50)},"p95_ms":${num(sp95)},"n":$sn,"trigger_ms":250}"""
        val (cp50, cp95, cn) = graft.metrics.LatencyBench.runContinuous(spark)
        val cont =
          s""""continuous_status_path":{"p50_ms":${num(cp50)},"p95_ms":${num(cp95)},"n":$cn}"""
        s""","latency":{$per,$stateful,$cont,"reference_e2e":{"p50_ms":8,"p95_ms":26}}"""
      }

    val json =
      s"""{"metric":"total","value":${sec3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"$latJson}"""

    // The metric line must be the FINAL stdout act: round 2's driver
    // artifact lost all numbers because the continuous-latency teardown
    // logs pages of TaskKilled/RejectedExecution warnings after this
    // point, pushing the JSON out of the driver's bounded tail capture.
    // Silence logging entirely, stop Spark (streaming queries are
    // already stopped by LatencyBench), THEN print.
    spark.sparkContext.setLogLevel("OFF")
    try spark.streams.active.foreach(q => try q.stop() catch { case _: Throwable => () })
    catch { case _: Throwable => () }
    try spark.stop() catch { case _: Throwable => () }
    println(json)
    System.out.flush()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Scratch profiler (test scope, not shipped): phase timing for the
  * heavy bench queries at sf0.1. Run: Test/runMain graft.ProfMain
  */
object ProfMain {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def mat(name: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      t(name) { df.write.format("noop").mode("overwrite").save() }

    // warm codegen/JIT at the small SF like Bench does
    Seq("dedup_components", "dedup_embed", "mm_frame_vbow", "curation_funnel")
      .foreach { q =>
        try SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
          .write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }

    mat("dedup_components")(SparkEntry.queries("dedup_components")(spark, d))
    mat("dedup_embed")(SparkEntry.queries("dedup_embed")(spark, d))
    mat("mm_frame_vbow")(SparkEntry.queries("mm_frame_vbow")(spark, d))
    mat("curation_funnel")(SparkEntry.queries("curation_funnel")(spark, d))
    // pass 2 — steady state
    mat("dedup_components#2")(SparkEntry.queries("dedup_components")(spark, d))
    mat("dedup_embed#2")(SparkEntry.queries("dedup_embed")(spark, d))
    mat("mm_frame_vbow#2")(SparkEntry.queries("mm_frame_vbow")(spark, d))
    mat("curation_funnel#2")(SparkEntry.queries("curation_funnel")(spark, d))

    spark.stop()
  }
}

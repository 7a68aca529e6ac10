package graft.dedup

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("duplicates within the watermark horizon are dropped across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val deduped = StreamingDedup.withinWatermark(
      input.toDF().toDF("fp", "sec")
        .withColumn("ts", timestamp_seconds($"sec"))
        .withWatermark("ts", "100 seconds"),
      Seq("fp"))
    val q = deduped.writeStream.format("memory").queryName("sdedup").start()
    try {
      input.addData(("a", 1000L), ("b", 1001L), ("a", 1002L)) // in-batch dup
      q.processAllAvailable()
      input.addData(("a", 1050L), ("c", 1060L)) // cross-batch dup of a
      q.processAllAvailable()
      val got = spark.table("sdedup").select($"fp").as[String]
        .collect().sorted.toSeq
      assert(got == Seq("a", "b", "c"))
    } finally q.stop()
  }

  test("state purges: a key re-appearing past the horizon is new again") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val deduped = StreamingDedup.withinWatermark(
      input.toDF().toDF("fp", "sec")
        .withColumn("ts", timestamp_seconds($"sec"))
        .withWatermark("ts", "100 seconds"),
      Seq("fp"))
    val q = deduped.writeStream.format("memory").queryName("sdedup2").start()
    try {
      input.addData(("a", 1000L))
      q.processAllAvailable()
      input.addData(("z", 5000L)) // advances watermark far past a's entry
      q.processAllAvailable()
      input.addData(("a", 5001L)) // same key, new horizon → kept
      q.processAllAvailable()
      val got = spark.table("sdedup2").select($"fp").as[String].collect().toSeq
      assert(got.count(_ == "a") == 2)
      assert(got.count(_ == "z") == 1)
    } finally q.stop()
  }
}

package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The transactional-table swap-in for [[BucketStore]]: renders and runs
  * the ANSI `MERGE INTO` an upsert-by-key sink issues against a
  * MERGE-capable catalog table (Delta, Iceberg — neither jar ships in
  * this environment, so execution is environment-blocked; the statement
  * construction and call shape compile and are unit-checked).
  *
  * Call-shape parity with [[BucketStore.upsert]]: (batch, target, keys).
  * See docs/SWAP_IN.md for the per-call-site mapping and required
  * session config.
  */
object MergeUpsert {

  /** The MERGE statement for replace-on-key upsert of `sourceView` into
    * `targetTable`. Column list is taken from the batch schema;
    * `keyCols` drive the ON clause. */
  def mergeSql(targetTable: String, sourceView: String,
               columns: Seq[String], keyCols: Seq[String]): String = {
    require(keyCols.nonEmpty && keyCols.forall(columns.contains))
    val on = keyCols.map(k => s"t.`$k` = s.`$k`").mkString(" AND ")
    val sets = columns.filterNot(keyCols.contains)
      .map(c => s"t.`$c` = s.`$c`").mkString(", ")
    val cols = columns.map(c => s"`$c`").mkString(", ")
    val vals = columns.map(c => s"s.`$c`").mkString(", ")
    val update = if (sets.isEmpty) "" else s"WHEN MATCHED THEN UPDATE SET $sets\n"
    s"""MERGE INTO $targetTable t
       |USING $sourceView s
       |ON $on
       |${update}WHEN NOT MATCHED THEN INSERT ($cols) VALUES ($vals)""".stripMargin
  }

  /** Upsert `batch` into `targetTable` by `keyCols` — identical call
    * shape to [[BucketStore.upsert]]. Requires a MERGE-capable catalog
    * (Delta/Iceberg) at runtime. */
  def upsert(spark: SparkSession, batch: DataFrame, targetTable: String,
             keyCols: Seq[String]): Unit = {
    val view = s"__merge_src_${System.nanoTime()}"
    batch.createOrReplaceTempView(view)
    try spark.sql(mergeSql(targetTable, view, batch.columns.toSeq, keyCols))
    finally spark.catalog.dropTempView(view)
  }
}

package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY §7.5 scale toolkit).
  *
  * A hash join on a hot key puts the whole key's volume in one task.
  * Salting splits each left key into `salts` sub-keys and replicates the
  * (small or moderate) right side once per salt, restoring parallelism at
  * the cost of |R|×salts build rows. AQE's skew-join handles sort-merge
  * cases adaptively; explicit salting is for when the skew is known and
  * the right side is replicable (e.g., hot-device telemetry × device
  * dimension at 100 TB).
  */
object SkewJoin {

  /** Inner equi-join `left ⋈ right` on `key`, salted `salts` ways.
    * Results are identical to `left.join(right, key)` for unique right
    * keys. */
  def saltedInner(left: DataFrame, right: DataFrame, key: String,
                  salts: Int): DataFrame = {
    val saltedLeft = left
      // deterministic spread: hash the whole row's key + a cheap uniform
      // component. pmod keeps it in [0, salts)
      .withColumn("__salt", pmod(hash(col(key), monotonically_increasing_id()), lit(salts)))
    val saltedRight = right
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed
  * `Aggregator` — the custom-UDAF surface (SURVEY §2.10: "custom
  * `Aggregator[IN,BUF,OUT]` only if we add sketches beyond built-ins").
  *
  * Estimator: keep the k smallest *distinct* hash values of a
  * 2^60-uniform portable hash; if fewer than k distinct values exist the
  * count is exact, else estimate ≈ (k−1) · 2^60 / h₍ₖ₎. Standard error
  * ~1/√(k−2) (≈13% at k=64).
  *
  * Because the hash is the deterministic md5 scheme (not a seeded
  * per-run hash), the k-th minimum — and therefore the estimate — is a
  * pure function of the input SET: order-free, merge-associative, and
  * bit-reproducible in the DuckDB oracle. Buffer is a sorted k-capped
  * array: merges are O(k), state is tiny (k longs ≈ 512 B vs an exact
  * distinct set), which is the entire point at 100 TB: shuffle k longs
  * per group, not the group's distinct universe.
  */
class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Double] {
  require(k >= 2)
  val MaxHash: Double = 1152921504606846976.0 // 2^60 (15 hex digits)

  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], h: Long): Array[Long] = insert(buf, h)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    b.foldLeft(a)(insert)

  override def finish(buf: Array[Long]): Double =
    if (buf.length < k) buf.length.toDouble
    else (k - 1) * MaxHash / buf.last

  private def insert(buf: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present (KMV is over the distinct set)
    else {
      val ins = -pos - 1
      if (ins >= k) buf
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) as a typed
  * mergeable Aggregator — the single-pass/streaming twin of the
  * relational two-aggregation form in `MiningQueries.hll_distinct`
  * (same registers, bit-identical estimate).
  *
  * Buffer = the m=64 register bytes; merge = elementwise max, so
  * Structured Streaming holds ONE 64-byte state per group and map-side
  * partials combine before any exchange — the canonical mergeable-
  * sketch shape (KMV, CMS and t-digest in this package share it).
  *
  * Exactness discipline (the package policy): rho is integer bit
  * arithmetic, the harmonic denominator accumulates as an exact BIGINT
  * (never a double sum — partition-order rounding would break
  * cross-engine parity), and the estimate is ONE mirrored double
  * expression. Raw-estimator regime; the occupied-register count and
  * scaled denominator ride along so a small-range linear-counting
  * correction stays a driver-side afterthought.
  */
object HllSketch {

  val P = 6                        // 2^6 = 64 registers
  val M: Int = 1 << P
  val RestBits: Int = 60 - P       // value bits below the bucket index
  val RestMask: Long = (1L << RestBits) - 1
  val RhoMax: Int = RestBits + 1   // rho when the rest is all zeros
  val Alpha = 0.709                // alpha_64 from the paper

  /** Register value (rho) and bucket of a 60-bit non-negative hash. */
  def bucketOf(h: Long): Int = (h >>> RestBits).toInt
  def rhoOf(h: Long): Int = {
    val rest = h & RestMask
    if (rest == 0L) RhoMax
    else RhoMax - (64 - java.lang.Long.numberOfLeadingZeros(rest))
  }

  /** The mirrored estimate expression — keep in lockstep with the
    * relational form and its DuckDB oracle. */
  def estimate(zScaled: Long): Double =
    Alpha * (M.toDouble * M) * ((1L << RhoMax).toDouble / zScaled.toDouble)

  final case class Out(n_buckets: Long, z_scaled: Long, hll_est: Double)

  /** Input: the 60-bit portable hash of the counted key. */
  final class Distinct extends Aggregator[Long, Array[Byte], Out] {
    def zero: Array[Byte] = new Array[Byte](M)

    def reduce(b: Array[Byte], h: Long): Array[Byte] = {
      val j = bucketOf(h); val r = rhoOf(h)
      if (r > b(j)) b(j) = r.toByte
      b
    }

    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var j = 0
      while (j < M) { if (b(j) > a(j)) a(j) = b(j); j += 1 }
      a
    }

    def finish(b: Array[Byte]): Out = {
      var z = 0L; var occupied = 0L
      var j = 0
      while (j < M) {
        val r = b(j)
        z += (if (r == 0) 1L << RhoMax else 1L << (RhoMax - r))
        if (r != 0) occupied += 1
        j += 1
      }
      Out(occupied, z, estimate(z))
    }

    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }
}

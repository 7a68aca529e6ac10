package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.scalatest.funsuite.AnyFunSuite

/** Unit twin for the native k-component ABTT residual: the oracle gate
  * (abtt_pairs) proves Spark ≡ DuckDB on the replayed arithmetic; THIS
  * spec proves the loop implements the intended update r ← (r·‖v‖² −
  * (r·v)·v)/sh against a BigInt step-by-step replay, and that the
  * single-component case preserves the exact-orthogonality contract. */
class AbttResidualSpec extends AnyFunSuite {

  private val Cap = 1L << 20

  private def run(q: Array[Long], pcs: Seq[Array[Long]]): Array[Long] =
    AbttResidual.residual(
      new GenericArrayData(q),
      new GenericArrayData(pcs.map(p => new GenericArrayData(p): ArrayData).toArray),
      Cap).toLongArray()

  private def bigReplay(q: Array[Long], pcs: Seq[Array[Long]]): Array[BigInt] = {
    def tdiv(x: BigInt, d: BigInt): BigInt = if (x < 0) -((-x) / d) else x / d
    var r = q.map(BigInt(_))
    pcs.foreach { pc =>
      val vn = pc.iterator.map(v => BigInt(v) * v).sum
      val proj = r.zip(pc).map { case (a, b) => a * b }.sum
      val t = r.indices.map(i => r(i) * vn - proj * pc(i)).toArray
      val m = t.iterator.map(_.abs).foldLeft(BigInt(0))(_ max _)
      val sh = (m / Cap).max(1)
      r = t.map(tdiv(_, sh))
    }
    r
  }

  test("matches the BigInt replay on full-magnitude inputs (no overflow)") {
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 100) {
      val d = 2 + rnd.nextInt(63)
      val q = Array.fill(d)(rnd.nextLong() % (1L << 20))
      // components at the fixed-point scale of PcaPower (|v| ≤ 2^17)
      val pcs = Seq.fill(4)(Array.fill(d)(rnd.nextLong() % (1L << 17)))
      val got = run(q, pcs)
      val want = bigReplay(q, pcs)
      got.zip(want).zipWithIndex.foreach { case ((l, b), i) =>
        assert(BigInt(l) == b, s"r[$i] diverged: long=$l bigint=$b (overflow?)")
      }
    }
  }

  test("single component: residual is exactly orthogonal before the downshift") {
    // With sh = 1 (tiny values), r·v = (q·v)·‖v‖² − (q·v)·‖v‖² = 0 exactly.
    val q = Array(123L, -456L, 789L)
    val pc = Array(3L, 5L, -7L)
    val r = run(q, Seq(pc))
    val dot = r.zip(pc).map { case (a, b) => a * b }.sum
    assert(dot == 0L, s"residual not orthogonal: r·v = $dot")
  }

  test("vector inside the removed subspace collapses to zero") {
    val pc = Array(2L, -1L, 4L)
    val q = pc.map(_ * 1000L) // parallel to the component
    val r = run(q, Seq(pc))
    assert(r.forall(_ == 0L), s"parallel vector left residual: ${r.mkString(",")}")
  }

  test("empty component list is the identity") {
    val q = Array(7L, -9L, 11L)
    assert(run(q, Seq.empty).sameElements(q))
  }
}

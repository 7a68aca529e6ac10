package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pruning (SURVEY §2.10 custom-UDAF surface; the
  * runtime-filter pattern for 100 TB joins): build a compact bit-set
  * over the small side's join keys with a mergeable Aggregator, then
  * prefilter the big side MAP-ONLY before the exact join — the shuffle
  * then carries only rows that might match (false-positive rate ε),
  * instead of the whole fact table. The exact join afterwards removes
  * false positives, so the composition is value-identical to the plain
  * join; the bloom only prunes.
  *
  * Design for Spark's execution model:
  *  - bit positions are computed in the DATAFRAME domain
  *    (`xxhash64(key, i) mod m` — codegen, no UDF), so the build
  *    aggregator is pure bit-setting and the probe is the same column
  *    expression on the other side: one hash definition, two uses;
  *  - the build is a mergeable OR over fixed-size Array[Long] words —
  *    partial aggregation below the exchange, constant state
  *    (m/8 bytes) regardless of group size;
  *  - the probe embeds the collected words as an array literal:
  *    `element_at` + fixed shifts — whole-stage codegen end to end,
  *    never a driver loop over rows. Collecting the single aggregated
  *    row is bounded driver traffic (m/8 bytes — the IVF-centroid
  *    pattern), and the literal ships to executors with the task
  *    closure exactly like a broadcast small table.
  *
  * Spark's own runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects this
  * same shape automatically inside one query; this operator is the
  * CROSS-JOB version — build once, prune many later queries (the
  * blocklist / decontamination membership shape), which the built-in
  * planner rule cannot express.
  */
object BloomSketch {

  /** Default geometry: m = 2^16 bits (8 KB), k = 5 probes — ε ≈ 0.9 %
    * at 5 k keys. Size m ≈ 10·n bits for the production key count. */
  val DefaultBits = 1 << 16
  val DefaultK = 5

  /** Hard ceiling on the auto-sized m: 2^27 bits = 16 MB — the same
    * order as Spark's own runtime-bloom cap. The collected words and
    * the probe-side literal are the repo's one driver-side structure
    * whose WANTED size tracks the data (10·n bits), so the cap is what
    * keeps a 10⁹-key build side from collecting ~1.2 GB onto the
    * driver and into every task binary. Past the cap the filter
    * degrades in ε only (prunes less); zero false negatives at any m,
    * so bloom_prune's value-identity is unaffected. A build side that
    * saturates even 2^27 bits (≳ 13 M keys) should prefer Spark's
    * injected runtime bloom filter or a partitioned semi-join. */
  val MaxBits = 1 << 27

  /** The k bit positions of `key` as an array<int> column:
    * pos_i = xxhash64(key, i) mod m. k independent seeded hashes —
    * no 64-bit multiply, so ANSI overflow semantics are irrelevant. */
  def positions(key: Column, mBits: Int = DefaultBits,
                k: Int = DefaultK): Column =
    array((0 until k).map(i =>
      pmod(xxhash64(key, lit(i)), lit(mBits.toLong)).cast("int")): _*)

  /** Membership test against collected filter words — the native
    * [[BloomMightContain]] expression: one generated probe loop, the
    * words array added to the task's codegen references ONCE. (The
    * previous k-probe Column composition re-referenced the words
    * literal per probe: k copies of the filter in every task binary —
    * 131 MiB tasks measured at the sf10 surrogate. The Column twin
    * lives on as [[mightContainColumns]] for the equivalence spec.) */
  def mightContain(key: Column, words: Array[Long],
                   mBits: Int = DefaultBits, k: Int = DefaultK): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      BloomMightContain(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(key),
        words, mBits, k))

  /** Legacy declarative probe (k × `element_at` on a words literal) —
    * kept ONLY as the independent formulation BloomSpec checks the
    * native expression against; not used on any query path. */
  private[graft] def mightContainColumns(
      key: Column, words: Array[Long],
      mBits: Int = DefaultBits, k: Int = DefaultK): Column = {
    val w = typedLit(words.toSeq)
    (0 until k).map { i =>
      val pos = pmod(xxhash64(key, lit(i)), lit(mBits.toLong)).cast("int")
      val word = element_at(w, shiftright(pos, 6) + 1)
      call_function("shiftright", word, pos.bitwiseAND(lit(63)))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Mergeable build: input = the [[positions]] array, state = the bit
    * words, merge = OR. Runs as ObjectHashAggregate with partials below
    * the exchange; the state never grows past m/8 bytes. */
  class Build(mBits: Int = DefaultBits)
      extends Aggregator[Seq[Int], Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](mBits >> 6)
    override def reduce(b: Array[Long], pos: Seq[Int]): Array[Long] = {
      val it = pos.iterator
      while (it.hasNext) { val p = it.next(); b(p >> 6) |= 1L << (p & 63) }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Build the filter words for a key column in one aggregation and
    * collect them (bounded: m/8 bytes). */
  def buildFilter(df: org.apache.spark.sql.DataFrame, key: Column,
                  mBits: Int = DefaultBits, k: Int = DefaultK): Array[Long] = {
    import df.sparkSession.implicits._
    df.select(positions(key, mBits, k).as("pos"))
      .as[Seq[Int]]
      .select(new Build(mBits).toColumn)
      .head()
  }

  /** [[buildFilter]] with m sized to the build side: a FIXED m saturates
    * when the key count grows 100× (ε → 1 — the filter stays correct
    * but prunes nothing), so the scale path counts the build side first
    * (one cheap agg over the rows about to be hashed anyway) and picks
    * the next power of two ≥ bitsPerKey·n, hard-capped at [[MaxBits]]
    * (see its doc for why the cap is load-bearing at 100 TB). Returns
    * the words AND the chosen m — the probe must bit-test with the
    * same m. */
  def buildFilterSized(df: org.apache.spark.sql.DataFrame, key: Column,
                       bitsPerKey: Int = 10, k: Int = DefaultK,
                       maxBits: Int = MaxBits): (Array[Long], Int) = {
    val n = df.count()
    val wanted = math.max(DefaultBits.toLong, n * bitsPerKey)
    val mBits = java.lang.Long.highestOneBit(
      math.min(wanted * 2 - 1, maxBits.toLong)).toInt
    (buildFilter(df, key, mBits, k), mBits)
  }
}

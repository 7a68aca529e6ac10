package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-shard suffix-array pass over tokenized documents — the production
  * twin of the stride-1 hash formulation behind `substr_dup` (Lee et
  * al., ''Deduplicating Training Data Makes Language Models Better'':
  * the published pipeline builds suffix arrays per shard and merges
  * duplicated-span reports).
  *
  * Shape per shard (documents are whole rows, so a doc never spans
  * shards):
  *   1. intern tokens to ints and lay the shard's documents out as one
  *      concatenated code buffer,
  *   2. sort the valid window start positions by their W-token prefix —
  *      a suffix array bounded at comparison depth W (the general
  *      variable-length-span form is the same sort carried to full
  *      suffix depth + an LCP walk; fixed W is what the `substr_dup`
  *      report contract needs),
  *   3. walk the sorted runs: each run is one DISTINCT window; hash the
  *      window string ONCE (the portable md5 scheme, so runs agree
  *      across shards) and emit one (h, doc_id, c) row per contributing
  *      document.
  *
  * Versus hashing every stride-1 occurrence: the shard ships the same
  * pre-aggregated (h, doc, c) rows to the global exchange, but computes
  * ONE digest per distinct window instead of one per occurrence — on
  * repetitive corpora (the ones substring dedup exists for) that is the
  * dominant cost, and the sorted layout is what the variable-length
  * span-report extension walks for free. Trade-off: the sort is
  * per-shard in-memory (O(W·n log n) comparisons), so shard sizing —
  * normal Spark partition sizing — bounds it.
  */
object SuffixArray {

  /** One row per (distinct W-token window, document) within each shard:
    * (h = portable window hash, doc_id, c = occurrences in doc).
    * Documents shorter than W tokens contribute nothing, matching the
    * gram-row builders. */
  def windowOccurrences(docs: DataFrame, idCol: String, textCol: String,
                        w: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    graft.Tables.parallelize(docs)
      .select(col(idCol).cast("long"),
        TextFunctions.tokens(col(textCol)))
      .as[(Long, Seq[String])]
      .mapPartitions(it => shardWindows(it, w))
      .toDF("h", "doc_id", "c")
  }

  /** All rungs of a width LADDER in ONE shard pass: (w, h, doc_id, c)
    * rows identical to running [[windowOccurrences]] once per width —
    * but the corpus is read, tokenized and int-interned ONCE, and only
    * the depth-w sort + run walk repeats per rung. dup_span_ladder's
    * four rungs previously paid four full scan+tokenize+intern passes
    * (and four separate h exchanges downstream) for work whose only
    * per-rung difference is the window width. */
  def windowOccurrencesMulti(docs: DataFrame, idCol: String, textCol: String,
                             ws: Seq[Int]): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val widths = ws.toArray
    graft.Tables.parallelize(docs)
      .select(col(idCol).cast("long"),
        TextFunctions.tokens(col(textCol)))
      .as[(Long, Seq[String])]
      .mapPartitions(it => shardWindowsMulti(it, widths))
      .toDF("w", "h", "doc_id", "c")
  }

  /** The portable 60-bit string hash ([[TextFunctions.portableHash]])
    * evaluated JVM-side: first 15 hex chars of md5 as a bigint. */
  def portableHashJvm(md: java.security.MessageDigest, s: String): Long = {
    val d = md.digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  /** Shard layout shared by every rung: documents tokenize + int-intern
    * ONCE; each width's sort/walk reads the same code buffer. */
  private final class Interned(val ids: Array[Long], val buf: Array[Int],
                               val docEnd: Array[Int],
                               val inv: Array[String])

  private def intern(docs: Iterator[(Long, Seq[String])]): Interned = {
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    val codeBuf = new java.util.ArrayList[Int]()
    val docEnd = scala.collection.mutable.ArrayBuffer.empty[Int]
    val dict = new java.util.HashMap[String, Int]()
    val inv = scala.collection.mutable.ArrayBuffer.empty[String]
    docs.foreach { case (id, toks) =>
      ids += id
      toks.foreach { t =>
        var c = dict.getOrDefault(t, -1)
        if (c < 0) { c = inv.length; dict.put(t, c); inv += t }
        codeBuf.add(c)
      }
      docEnd += codeBuf.size()
    }
    val buf = new Array[Int](codeBuf.size())
    var bi = 0
    while (bi < buf.length) { buf(bi) = codeBuf.get(bi); bi += 1 }
    new Interned(ids.toArray, buf, docEnd.toArray, inv.toArray)
  }

  private[text] def shardWindows(docs: Iterator[(Long, Seq[String])],
                                 w: Int): Iterator[(Long, Long, Long)] = {
    val in = intern(docs)
    if (in.ids.isEmpty) Iterator.empty else walkWidth(in, w)
  }

  /** One interned shard, every rung: (w, h, doc_id, c) — row-identical
    * to per-width [[shardWindows]] runs over the same documents. */
  private[text] def shardWindowsMulti(docs: Iterator[(Long, Seq[String])],
                                      ws: Array[Int])
      : Iterator[(Int, Long, Long, Long)] = {
    val in = intern(docs)
    if (in.ids.isEmpty) Iterator.empty
    else ws.iterator.flatMap(w =>
      walkWidth(in, w).map { case (h, d, c) => (w, h, d, c) })
  }

  private def walkWidth(in: Interned, w: Int): Iterator[(Long, Long, Long)] = {
    val ids = in.ids
    val buf = in.buf
    val docEnd = in.docEnd
    val inv = in.inv

    // valid window starts: inside one document, w tokens available;
    // doc of a position resolves by walking docEnd in the same pass
    val startsBuf = scala.collection.mutable.ArrayBuffer.empty[Int]
    val docOfBuf = scala.collection.mutable.ArrayBuffer.empty[Int]
    var begin = 0
    var di = 0
    while (di < docEnd.length) {
      var p = begin
      while (p + w <= docEnd(di)) {
        startsBuf += p; docOfBuf += di; p += 1
      }
      begin = docEnd(di)
      di += 1
    }
    val starts = startsBuf.toArray
    val docOf = new Array[Int](buf.length max 1)
    var k = 0
    while (k < starts.length) { docOf(starts(k)) = docOfBuf(k); k += 1 }

    // depth-W suffix sort: order window starts by their token codes
    val sorted = starts.map(Integer.valueOf)
    java.util.Arrays.sort(sorted, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        var i = 0; var r = 0
        while (i < w && r == 0) {
          r = Integer.compare(buf(a + i), buf(b + i)); i += 1
        }
        if (r == 0) Integer.compare(a, b) else r
      }
    })

    def sameWindow(a: Int, b: Int): Boolean = {
      var i = 0
      while (i < w) { if (buf(a + i) != buf(b + i)) return false; i += 1 }
      true
    }

    val md = java.security.MessageDigest.getInstance("MD5")
    val out = List.newBuilder[(Long, Long, Long)]
    var runStart = 0
    val n = sorted.length
    while (runStart < n) {
      var runEnd = runStart + 1
      while (runEnd < n && sameWindow(sorted(runStart), sorted(runEnd)))
        runEnd += 1
      // one digest per DISTINCT window
      val p0: Int = sorted(runStart)
      val win = (0 until w).map(i => inv(buf(p0 + i))).mkString(" ")
      val h = portableHashJvm(md, win)
      val perDoc = scala.collection.mutable.Map.empty[Int, Long]
      var i = runStart
      while (i < runEnd) {
        val d = docOf(sorted(i))
        perDoc.update(d, perDoc.getOrElse(d, 0L) + 1L)
        i += 1
      }
      perDoc.foreach { case (d, c) => out += ((h, ids(d), c)) }
      runStart = runEnd
    }
    out.result().iterator
  }
}

package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase, Tables}

/** Inverted-index all-pairs lexical cosine: the posting-list join with
  * df pruning must reproduce a brute-force sparse-vector cosine over the
  * same pruned trigram space, with exact integer dot products. */
class LexCosineSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("lex_cosine_pairs equals brute-force pruned-space cosine") {
    val got = SparkEntry.queries("lex_cosine_pairs")(spark, sf)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
      .toMap

    // brute force: per-doc trigram tf maps, df-pruned at 25, all-pairs
    val tf = TextFunctions.ngramRows(
        Tables.documents(spark, sf), "doc_id", "text", 3)
      .groupBy(col("doc_id"), col("s")).agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val df = tf.groupBy(_._2).view.mapValues(_.length).toMap
    val pruned = tf.filter(t => df(t._2) <= 25)
    val vecs = pruned.groupBy(_._1).view
      .mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val brute = (for {
      (a, va) <- vecs.toSeq; (b, vb) <- vecs.toSeq if a < b
      dot = va.keysIterator.filter(vb.contains)
        .map(k => va(k) * vb(k)).sum if dot > 0
      na2 = va.values.map(v => v * v).sum
      nb2 = vb.values.map(v => v * v).sum
      cos = dot.toDouble / math.sqrt(na2.toDouble * nb2.toDouble)
      if cos >= 0.5
    } yield ((a, b), (dot, cos))).toMap

    assert(got.keySet == brute.keySet,
      s"pair sets differ: got ${got.size}, brute ${brute.size}")
    assert(got.nonEmpty, "corpus should contain lexically similar pairs")
    // integer dots match exactly; cosines bit-equal (same IEEE ops)
    got.foreach { case (k, (dot, cos)) =>
      assert(dot == brute(k)._1, s"$k dot $dot != ${brute(k)._1}")
      assert(cos == brute(k)._2, s"$k cos $cos != ${brute(k)._2}")
    }
  }

  test("lex_cosine_pairs agrees with the MinHash candidate family on high-sim pairs") {
    // every exact-Jaccard-verified near-dup pair above 0.5 trigram
    // cosine should surface here too (two independent routes to the
    // same duplicates); sanity cross-check, not a strict equivalence
    val lex = SparkEntry.queries("lex_cosine_pairs")(spark, sf)
      .filter(col("cos") >= 0.9)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
      .filter(col("jaccard") >= 0.9)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.subsetOf(lex),
      s"jaccard>=0.9 pairs missing from cosine>=0.9: ${mh.diff(lex)}")
  }
}

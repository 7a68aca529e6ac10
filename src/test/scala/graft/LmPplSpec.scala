package graft

import org.apache.spark.sql.functions._

import graft.text.UnigramTrain

/** lm_ppl's integer log chain and bucket semantics.
  *
  * The per-occurrence −log2 P is computed by a codegen column chain
  * (TextQueries.withIlog2q8) that must stay in LOCKSTEP with the
  * driver-side UnigramTrain.ilog2q8 the oracle replays — a drift would
  * silently desync the lm_ppl gate the way a widthFor/CASE-chain drift
  * would desync rp_cand (both have dedicated pins for that reason). */
class LmPplSpec extends SparkTestBase {
  import spark.implicits._

  test("column ilog2q8 chain == driver ilog2q8 across the domain") {
    val xs = (1L to 2048L) ++
      Seq(4095L, 4096L, 4097L, 65535L, 1L << 30, (1L << 53) + 17,
        (1L << 54) - 1)
    val got = graft.queries.TextQueries
      .withIlog2q8(xs.toDF("x"), "x", "lg")
      .select(col("x"), col("lg")).as[(Long, Long)].collect().toMap
    xs.foreach { x =>
      assert(got(x) == UnigramTrain.ilog2q8(x), s"x=$x")
    }
  }

  test("mink_prob: top-k% mean dominates the overall mean, same doc set") {
    val sf = "/root/testdata/sf0.001"
    val ppl = SparkEntry.queries("lm_ppl")(spark, sf)
      .select(col("doc_id"), col("mean_bits")).as[(Long, Double)]
      .collect().toMap
    val mink = SparkEntry.queries("mink_prob")(spark, sf)
      .select(col("doc_id"), col("k_occ"), col("n_bigrams"), col("mink_bits"))
      .as[(Long, Long, Long, Double)].collect()
    // every scored doc appears in both reports
    assert(mink.map(_._1).toSet == ppl.keySet)
    mink.foreach { case (id, k, n, mb) =>
      // k = ceil(n/5), at least 1
      assert(k == (n + 4) / 5 && k >= 1, s"doc $id: k=$k n=$n")
      // the mean of the k LARGEST occurrence scores can never be below
      // the mean over all occurrences (equality iff all scores equal)
      assert(mb >= ppl(id) - 1e-9, s"doc $id: mink $mb < mean ${ppl(id)}")
    }
  }

  test("mink_prob kernel: window walk == brute force on random tables") {
    // the boundary-remainder arithmetic is the one place an off-by-one
    // would silently shift h_topk_q8 — drive the kernel with seeded
    // random per-(doc, bits) tables and replay each doc by brute force
    val rnd = new scala.util.Random(0xC0FFEE)
    val rows = for {
      doc <- 1 to 40
      nBits = 1 + rnd.nextInt(6)
      bits <- rnd.shuffle((1 to 50).toList).take(nBits)
    } yield (doc.toLong, "en", bits.toLong, 1L + rnd.nextInt(7))
    val db = rows.toDF("doc_id", "lang", "bits_q8", "cnt")
    val got = graft.queries.TextQueries.minkOf(db)
      .select(col("doc_id"), col("n_bigrams"), col("k_occ"), col("h_topk_q8"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      // expand to occurrences, sort descending, sum the k largest
      val occ = rs.flatMap(r => Seq.fill(r._4.toInt)(r._3))
        .sortBy(-_)
      val n = occ.size.toLong
      val k = (n + 4) / 5
      val brute = occ.take(k.toInt).sum
      assert(got(doc) == ((n, k, brute)), s"doc $doc: ${got(doc)} vs ($n, $k, $brute)")
    }
  }

  test("quality_auc: bucketed U equals the brute-force pair count") {
    val sf = "/root/testdata/sf0.001"
    val Array(row) = SparkEntry.queries("quality_auc")(spark, sf).collect()
    val (nPos, nNeg, u2, auc) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3))
    // brute-force the doubled U over the collected (score, keep) pairs:
    // 2·#(s_keep < s_drop) + #(s_keep = s_drop)
    val ppl = SparkEntry.queries("lm_ppl")(spark, sf)
      .select(col("doc_id"), col("mean_bits")).as[(Long, Double)]
      .collect().toMap
    val keep = SparkEntry.queries("gopher_rules")(spark, sf)
      .select(col("doc_id"), col("keep")).as[(Long, Boolean)]
      .collect().toMap
    val scored = ppl.keys.toSeq.filter(keep.contains)
      .map(id => (ppl(id), keep(id)))
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filterNot(_._2).map(_._1)
    assert(nPos == pos.size && nNeg == neg.size)
    val brute = (for (p <- pos; n <- neg) yield {
      if (p < n) 2L else if (p == n) 1L else 0L
    }).sum
    assert(u2 == brute, s"u2 $u2 != brute $brute")
    assert(auc >= 0.0 && auc <= 1.0)
  }

  test("lm_ppl: terciles per lang, higher-entropy docs land in tail") {
    val out = SparkEntry.queries("lm_ppl")(spark, "/root/testdata/sf0.001")
      .localCheckpoint()
    // every lang splits into at most 3 buckets with |head| >= |tail|
    val sizes = out.groupBy(col("lang"), col("bucket")).count()
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    sizes.foreach { case (lang, m) =>
      assert(m.keySet.subsetOf(Set("head", "middle", "tail")), lang)
      assert(m.getOrElse("head", 0L) >= m.getOrElse("tail", 0L), lang)
    }
    // bucket order follows mean_bits within each lang
    val rows = out.select(col("lang"), col("bucket"), col("mean_bits"))
      .as[(String, String, Double)].collect()
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val maxHead = rs.filter(_._2 == "head").map(_._3)
        .foldLeft(Double.MinValue)(math.max)
      val minTail = rs.filter(_._2 == "tail").map(_._3)
        .foldLeft(Double.MaxValue)(math.min)
      assert(maxHead <= minTail, s"$lang: head $maxHead !<= tail $minTail")
    }
  }
}

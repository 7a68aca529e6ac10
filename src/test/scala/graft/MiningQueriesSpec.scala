package graft

import org.apache.spark.sql.functions._

/** Behavior specs for the round-7 corpus-mining operators at sf0.001
  * (value-level cross-engine gate = DuckDB oracle at sf0.01). */
class MiningQueriesSpec extends SparkTestBase {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("hll_distinct estimates within HLL error bounds of the true count") {
    val est = SparkEntry.queries("hll_distinct")(spark, d)
      .select($"event_type", $"n_buckets", $"hll_est")
      .as[(String, Long, Double)].collect().toSeq
    assert(est.nonEmpty)
    val truth = Tables.events(spark, d)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    est.foreach { case (et, nBuckets, e) =>
      assert(nBuckets >= 1 && nBuckets <= 64)
      val t = truth(et).toDouble
      // the query emits the RAW estimator plus the occupied-register
      // count — exactly what the paper's small-range correction needs.
      // Apply it driver-side (linear counting when E <= 2.5m and empty
      // registers exist), then gate at ~3 sigma of the 1.04/sqrt(64)
      // standard error so the test pins sanity, not luck.
      val m = 64.0
      val corrected =
        if (e <= 2.5 * m && nBuckets < 64) m * math.log(m / (m - nBuckets))
        else e
      assert(math.abs(corrected - t) / t <= 0.39,
        s"$et: corrected $corrected (raw $e) vs true $t out of bounds")
    }
  }

  test("hll_distinct (relational) equals the HllSketch Aggregator sketch") {
    val rel = SparkEntry.queries("hll_distinct")(spark, d)
      .select($"event_type", $"n_buckets", $"z_scaled", $"hll_est")
      .as[(String, Long, Long, Double)].collect().toSet
    val hll = udaf(new graft.functions.HllSketch.Distinct)
    val agg = Tables.events(spark, d)
      .select($"event_type",
        graft.text.TextFunctions.portableHash($"user_id".cast("string")).as("h"))
      .groupBy($"event_type").agg(hll($"h").as("sk"))
      .select($"event_type", $"sk.n_buckets", $"sk.z_scaled", $"sk.hll_est")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(rel == agg, "two HLL forms must produce identical registers + estimate")
  }

  test("winnow fingerprints cover every window: selected-position gaps <= w") {
    val sel = SparkEntry.queries("winnow_fingerprint")(spark, d)
      .select($"doc_id", $"pos").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(sel.nonEmpty)
    // the winnowing guarantee: every w-window of gram positions
    // contains a selected position, so consecutive selections are at
    // most w apart and the first/last sit within w of the ends
    sel.foreach { case (doc, positions) =>
      positions.toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(b - a <= 4, s"doc $doc gap $a->$b")
        case _         => ()
      }
      assert(positions.head <= 4, s"doc $doc first selection late")
    }
  }

  test("winnow fingerprint density sits near the expected 2/(w+1)") {
    val docs = Tables.documents(spark, d).count().toDouble
    val grams = SparkEntry.queries("winnow_fingerprint")(spark, d).count()
    val gramRows = graft.text.TextFunctions
      .ngramRows(Tables.documents(spark, d), "doc_id", "text", 3).count()
    val density = grams.toDouble / gramRows
    assert(docs > 0 && density > 0.25 && density < 0.55,
      s"density $density outside [0.25, 0.55] (expected ~0.4)")
  }

  test("ngram_novelty: first document is all-novel, ratios in [0,1], novel grams partition the corpus gram set") {
    val out = SparkEntry.queries("ngram_novelty")(spark, d)
      .select($"doc_id", $"n_grams", $"n_novel", $"novelty_ratio")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out.nonEmpty)
    assert(out.forall { case (_, n, nov, r) =>
      nov >= 0 && nov <= n && r >= 0.0 && r <= 1.0
    })
    val firstDoc = out.map(_._1).min
    val first = out.find(_._1 == firstDoc).get
    assert(first._2 == first._3, "lowest doc_id must be fully novel")
    // every distinct corpus gram is novel in exactly one document
    val distinctGrams = graft.text.TextFunctions
      .ngramRows(Tables.documents(spark, d), "doc_id", "text", 5)
      .select(col("s")).distinct().count()
    assert(out.map(_._3).sum == distinctGrams)
  }

  test("hard_negatives: one top negative per query, label differs, cos is the different-label max") {
    val labels = Tables.embeddings(spark, d)
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val out = SparkEntry.queries("hard_negatives")(spark, d)
      .select($"query_id", $"neighbor_id", $"neg_label", $"cos")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out.map(_._1).distinct.size == out.size, "one row per query")
    out.foreach { case (q, nb, negLabel, _) =>
      assert(labels(nb).toLong == negLabel)
      assert(labels(q).toLong != negLabel, s"query $q negative shares label")
    }
    // brute-force the expected max different-label cosine per query
    // with the same quantized arithmetic
    val qd = graft.embed.Similarity
      .quantized(Tables.embeddings(spark, d), "vec_id", "embedding")
      .select($"vec_id", $"label", $"q", $"nq")
    val expected = qd.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"label".as("ql"),
        $"q".as("qq"), $"nq".as("qnq"))
      .join(qd, col("label") =!= col("ql"))
      .withColumn("cos", graft.embed.Similarity.cosine(
        graft.embed.Similarity.dotQ("qq", "q"), col("qnq"), col("nq")))
      .groupBy($"query_id").agg(max($"cos").as("best"))
      .as[(Long, Double)].collect().toMap
    out.foreach { case (q, _, _, cos) =>
      assert(cos == expected(q), s"query $q: $cos != brute ${expected(q)}")
    }
  }
}

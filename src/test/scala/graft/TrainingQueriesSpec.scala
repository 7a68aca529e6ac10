package graft

import org.apache.spark.sql.functions._

/** Behavior specs for the round-5 training-composition operators at
  * sf0.001 (value-level cross-engine gate = DuckDB oracle at sf0.01). */
class TrainingQueriesSpec extends SparkTestBase {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("len_buckets conserves docs/tokens and prices padding correctly") {
    val out = SparkEntry.queries("len_buckets")(spark, d)
      .select($"bucket", $"n_docs", $"real_tokens", $"padded_tokens", $"waste")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (b, _, _, _, _) => Set(16L, 32L, 64L, 128L)(b) })
    // conservation: bucket rows cover every non-empty doc exactly once
    val docs = Tables.documents(spark, d)
      .select(size(graft.text.TextFunctions.tokens($"text")).cast("long").as("n"))
      .filter($"n" > 0).as[Long].collect()
    assert(out.map(_._2).sum == docs.length)
    assert(out.map(_._3).sum == docs.sum)
    out.foreach { case (b, nd, real, padded, waste) =>
      assert(padded == b * nd)
      assert(real <= padded)
      assert(waste == 1.0 - real.toDouble / padded)
    }
  }

  test("dup_inflation attributes every doc once and inflation >= 1 per source") {
    val out = SparkEntry.queries("dup_inflation")(spark, d)
      .select($"source", $"n_docs", $"n_kept", $"tokens_total", $"tokens_kept",
        $"inflation")
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    val nDocs = Tables.documents(spark, d).count()
    assert(out.map(_._2).sum == nDocs)
    // keepers across sources = docs minus the non-canonical cluster members
    val dropped = SparkEntry.queries("dedup_components")(spark, d)
      .filter($"canonical_id" =!= $"doc_id").count()
    assert(out.map(_._3).sum == nDocs - dropped)
    out.foreach { case (_, n, kept, tot, keptTok, infl) =>
      assert(kept <= n && keptTok <= tot)
      assert(infl >= 1.0)
      assert(infl == tot.toDouble / keptTok)
    }
    // the corpus has engineered near-dup clusters: someone must inflate
    assert(out.exists(_._6 > 1.0))
  }

  test("split_leakage cells partition the verified pair set") {
    val out = SparkEntry.queries("split_leakage")(spark, d)
      .select($"split_a", $"split_b", $"n_pairs")
      .as[(String, String, Long)].collect()
    val splits = Set("train", "val", "test")
    assert(out.forall { case (a, b, n) =>
      splits(a) && splits(b) && n > 0
    })
  }

  test("kmeans_step emits 8 cells x 64 dims with exact member means") {
    val out = SparkEntry.queries("kmeans_step")(spark, d)
    val rows = out.collect()
    assert(rows.length == 8 * 64)
    // n_members constant across dims within a cell; totals = corpus size
    val perCell = rows.groupBy(_.getAs[Long]("cell"))
      .view.mapValues(_.map(_.getAs[Long]("n_members")).distinct).toMap
    assert(perCell.values.forall(_.size == 1))
    val total = perCell.values.map(_.head).sum
    assert(total == Tables.embeddings(spark, d).count())
    // centroid of each cell must be inside the quantized value range
    assert(rows.forall(r => math.abs(r.getAs[Double]("centroid")) <= 1.0))
  }

  test("mix_temperature: ratio is 1 for the largest stratum, (0,1] otherwise") {
    val out = SparkEntry.queries("mix_temperature")(spark, d)
      .select($"n_docs", $"ratio").as[(Long, Double)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (_, r) => r > 0 && r <= 1.0 })
    val maxN = out.map(_._1).max
    assert(out.filter(_._1 == maxN).forall(_._2 == 1.0))
  }

  test("resample_locf: full grid per user, carried values match the latest observation") {
    import java.sql.Timestamp
    val out = SparkEntry.queries("resample_locf")(spark, d)
      .select($"user_id", $"minute_ts", $"value_locf", $"last_obs")
      .as[(Long, Timestamp, Option[Double], Option[Timestamp])].collect()
    val users = out.map(_._1).distinct
    assert(users.nonEmpty)
    // every user carries the full 240-minute grid
    users.foreach { u => assert(out.count(_._1 == u) == 240) }
    // carried observation never postdates its grid point, and value/ts
    // are observed-together (both defined or both absent)
    assert(out.forall { case (_, m, v, o) =>
      v.isDefined == o.isDefined && o.forall(!_.after(m))
    })
    // LOCF is monotone: once a user has an observation, later grid
    // points keep one (possibly newer)
    users.foreach { u =>
      val series = out.filter(_._1 == u).sortBy(_._2.getTime).map(_._4)
      val firstDefined = series.indexWhere(_.isDefined)
      if (firstDefined >= 0)
        assert(series.drop(firstDefined).forall(_.isDefined))
    }
  }

  test("vocab_drift: 50 vocabulary terms, counts split-consistent, chi2 finite") {
    val out = SparkEntry.queries("vocab_drift")(spark, d)
      .select($"term", $"a", $"b", $"e", $"chi2_term")
      .as[(String, Long, Long, Double, Double)].collect()
    // the synthetic corpus vocabulary is ~31 distinct words — smaller
    // than the 50-term cap, so the report covers ALL of it
    assert(out.length > 20 && out.length <= 50)
    assert(out.forall { case (_, a, b, e, chi) =>
      a + b > 0 && e > 0 && chi >= 0 && !chi.isNaN && !chi.isInfinite
    })
    // on an un-drifted synthetic corpus the statistic should be modest:
    // chi2 per term well under the count scale
    assert(out.map(_._5).max < out.map(r => (r._2 + r._3).toDouble).max)
  }

  test("quant_int8: codes bounded, saturation present, small exact error") {
    val out = SparkEntry.queries("quant_int8")(spark, d)
      .select($"vec_id", $"scale_q", $"n_sat", $"code_energy", $"err2")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length == Tables.embeddings(spark, d).count())
    out.foreach { case (_, scale, nSat, energy, err2) =>
      assert(scale > 0)
      // the max-|component| dimension quantizes to exactly ±127
      assert(nSat >= 1)
      assert(energy <= 64L * 127 * 127)
      // per-dim truncation error < scale/127 + 1 quantized unit
      val bound = 64L * {
        val u = scale / 127 + 2; u * u
      }
      assert(err2 >= 0 && err2 <= bound, s"err2 $err2 > bound $bound")
    }
  }

  test("chunk_stride: windows tile every token with the declared overlap") {
    val out = SparkEntry.queries("chunk_stride")(spark, d)
      .select($"doc_id", $"chunk_idx", $"start_tok", $"chunk_len", $"n_tok")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, chunks) =>
      val sorted = chunks.sortBy(_._2)
      val n = sorted.head._5
      // first chunk starts at 0; last chunk reaches the end; every chunk
      // is within bounds and overlaps the next by W - S tokens
      assert(sorted.head._3 == 0L)
      assert(sorted.last._3 + sorted.last._4 == n)
      assert(sorted.forall { case (_, i, st, len, nt) =>
        st == i * 96 && len > 0 && st + len <= nt && len <= 128
      })
    }
  }

  test("oov_rate: top-100 vocab coverage yields rates in [0,1]") {
    val out = SparkEntry.queries("oov_rate")(spark, d)
      .filter($"n_tokens" > 0)
      .select($"n_tokens", $"n_invocab", $"oov_rate")
      .as[(Long, Long, Double)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (n, inv, r) =>
      inv <= n && r >= 0.0 && r <= 1.0 &&
        math.abs(r - (n - inv).toDouble / n) == 0.0
    })
  }

  test("dup_cluster_sizes: sizes >= 2 and members sum to labeled nodes") {
    val out = SparkEntry.queries("dup_cluster_sizes")(spark, d)
      .select($"cluster_size", $"n_clusters").as[(Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.forall(_._1 >= 2)) // only nodes on edges are labeled
  }

  test("mix_dedup_weights: weights are the exact effective-token shares") {
    val out = SparkEntry.queries("mix_dedup_weights")(spark, d)
      .select($"source", $"tok_total", $"tok_dup", $"tok_eff", $"weight")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    val effTotal = out.map(_._4).sum
    out.foreach { case (src, total, dup, eff, w) =>
      assert(dup >= 0 && dup <= total, s"$src: dup $dup of $total")
      assert(eff == total - dup, s"$src: eff mismatch")
      assert(w == eff.toDouble / effTotal.toDouble, s"$src: weight drift")
    }
    assert(math.abs(out.map(_._5).sum - 1.0) < 1e-9)
    // consistency with dedup_exact: duplicate token mass exists iff
    // some fingerprint group has more than one member
    val dupGroups = SparkEntry.queries("dedup_exact")(spark, d)
      .filter($"n_docs" > 1).count()
    assert((out.map(_._3).sum > 0) == (dupGroups > 0))
  }
}

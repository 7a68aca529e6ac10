package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.embed.{RpLsh, Similarity}

/** Similarity-search operator exposure over `embeddings` (SURVEY §7.5). */
object EmbedQueries {

  // ----------------------------------------------------------- knn_topk
  // Brute-force cosine top-5 for the first 10 vectors as queries.
  private def knnTopK(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    Similarity.knn(e.filter(col("vec_id") < 10), e, "vec_id", "embedding", 5)
  }

  private val knnTopKSql =
    s"""WITH ${Similarity.duckdbQuantizedCte},
       |pairs AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    CAST(${Similarity.duckdbDot("a.q", "b.q")} AS DOUBLE)
       |      / sqrt(CAST(a.nq AS DOUBLE) * CAST(b.nq AS DOUBLE)) AS cos
       |  FROM qv a JOIN qv b ON a.vec_id < 10 AND a.vec_id <> b.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY cos DESC, neighbor_id) AS rk
       |  FROM pairs)
       |SELECT query_id, neighbor_id, cos, rk FROM ranked WHERE rk <= 5""".stripMargin

  // -------------------------------------------------- embed_cosine_pairs
  // IVF-style blocked near-dup: pairs within the same coarse cell
  // (label) with cosine >= 0.35 (the corpus has no engineered near-dups;
  // max pairwise cosine is ~0.51, so the threshold sits where real
  // result sets exist).
  private def cosinePairs(s: SparkSession, d: String): DataFrame =
    Similarity.cosinePairsBlocked(
      Tables.embeddings(s, d), "vec_id", "embedding", "label", 0.35)

  private val cosinePairsSql =
    s"""WITH ${Similarity.duckdbQuantizedCte}
       |SELECT a.label AS cell, a.vec_id AS a_id, b.vec_id AS b_id,
       |  CAST(${Similarity.duckdbDot("a.q", "b.q")} AS DOUBLE)
       |    / sqrt(CAST(a.nq AS DOUBLE) * CAST(b.nq AS DOUBLE)) AS cos
       |FROM qv a JOIN qv b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE CAST(${Similarity.duckdbDot("a.q", "b.q")} AS DOUBLE)
       |    / sqrt(CAST(a.nq AS DOUBLE) * CAST(b.nq AS DOUBLE)) >= CAST(0.35 AS DOUBLE)""".stripMargin

  // ----------------------------------------------------------- ann_rp_lsh
  // Global (unblocked) ANN: random-hyperplane bucket candidates, exact
  // quantized-cosine verification at 0.35 (see embed_cosine_pairs note;
  // LSH recall at this angle is partial BY DESIGN - the oracle mirrors
  // the identical candidate generation, so results still hash-match).
  private def annRpLsh(s: SparkSession, d: String): DataFrame =
    RpLsh.annPairs(Tables.embeddings(s, d), "vec_id", "embedding", 0.35)

  private val annRpLshSql =
    s"""WITH ${Similarity.duckdbQuantizedCte},
       |${RpLsh.duckdbCandidateCte},
       |scored AS (
       |  SELECT c.a_id, c.b_id,
       |    CAST(${Similarity.duckdbDot("a.q", "b.q")} AS DOUBLE)
       |      / sqrt(CAST(a.nq AS DOUBLE) * CAST(b.nq AS DOUBLE)) AS cos
       |  FROM rp_cand c
       |  JOIN qv a ON a.vec_id = c.a_id
       |  JOIN qv b ON b.vec_id = c.b_id)
       |SELECT a_id, b_id, cos FROM scored WHERE cos >= CAST(0.35 AS DOUBLE)""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("knn_topk", knnTopK, Some(knnTopKSql)),
    QueryDef("embed_cosine_pairs", cosinePairs, Some(cosinePairsSql)),
    QueryDef("ann_rp_lsh", annRpLsh, Some(annRpLshSql)))
}

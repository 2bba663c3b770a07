package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Similarity

/** Similarity-search operators over `embeddings`: brute-force cosine
  * top-k (baseline), IVF-cell top-k (scale path), and embedding
  * near-dup pairs.
  */
object VectorOps {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** Deterministic small query set: every 50th vector. */
  private def querySet(e: DataFrame): DataFrame =
    e.filter(col("vec_id") % 50 === 0)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v1_knn_brute" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.bruteForceKnn(e, querySet(e), k = 3)
    },

    "v2_knn_ivf" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.ivfKnn(e, querySet(e), k = 3)
    },

    "v4_knn_lsh" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.lshKnn(e, querySet(e), k = 3)
    },

    // deterministic seed centroids: the first 8 vectors (a production
    // run would seed via k-means||; the assignment pass is identical)
    "v5_cell_assign" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.assignCells(e, e.filter(col("vec_id") < 8))
    },

    // threshold 0.3: the synthetic embeddings have no true near-dups
    // (max within-label cosine ≈ 0.47), so a production-style 0.9 gate
    // would be vacuous; 0.3 keeps the verification pass non-empty.
    "v3_embedding_neardup" -> { (s, dir) =>
      Similarity.nearDupPairs(emb(s, dir), threshold = 0.3)
    },

    // iters=1 keeps the DuckDB oracle writable (one argmax + one mean
    // update, mirrored CTE by CTE); the library supports arbitrary
    // iters — monotonicity and partition-independence are spec-pinned
    "v6_kmeans_train" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.assignModel(e, Similarity.trainKmeans(e, k = 8, iters = 1))
    },

    "v7_knn_sq8" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.sqKnn(e, querySet(e), k = 3)
    })

  /** SQL mirror of Similarity.dot: strict left fold over the zipped
    * product list, double precision — bit-identical to Spark's
    * `aggregate(zip_with(...))`.
    */
  private def sqlDot(a: String, b: String): String =
    s"""list_reduce(
       |  list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(list_zip($a, $b),
       |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),
       |  (acc, v) -> acc + v)""".stripMargin

  private def sqlCos(qa: String, qb: String, na: String, nb: String): String =
    s"${sqlDot(qa, qb)} / nullif($na * $nb, 0.0)"

  private val sqlWithNorm =
    s"""SELECT vec_id, label, embedding,
       | sqrt(${sqlDot("embedding", "embedding")}) AS nrm
       |FROM embeddings""".stripMargin

  private def sqlKnn(joinCond: String): String =
    s"""WITH e AS ($sqlWithNorm)
       |SELECT q_id, n_id, rnk, cos_sim FROM (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |    ${sqlCos("q.embedding", "c.embedding", "q.nrm", "c.nrm")} AS cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${sqlCos("q.embedding", "c.embedding", "q.nrm", "c.nrm")} DESC,
       |               c.vec_id) AS rnk
       |  FROM e q JOIN e c ON $joinCond
       |  WHERE q.vec_id % 50 = 0)
       |WHERE rnk <= 3""".stripMargin

  /** SQL mirror of Similarity.hyperplanes/lshSignature: ±1 from the
    * parity of md5("p:d")'s first hex digit (strpos is 1-based, so
    * even digit ⇔ odd strpos), signature = Σ 1<<p over planes whose
    * dot is > 0. Dots are the same strict left fold as sqlDot, so the
    * > 0 comparisons agree bit-for-bit with Spark.
    */
  private val sqlLshSig =
    s"""SELECT e.vec_id,
       |  CAST(SUM(CASE WHEN ${sqlDot("e.embedding", "pl.h")} > 0
       |           THEN 1 << pl.p ELSE 0 END) AS BIGINT) AS sig
       |FROM embeddings e CROSS JOIN (
       |  SELECT p, list_transform(range(0, 64),
       |    d -> CASE WHEN strpos('0123456789abcdef',
       |                          substr(md5(p || ':' || d), 1, 1)) % 2 = 1
       |         THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END) AS h
       |  FROM range(0, 8) t(p)) pl
       |GROUP BY e.vec_id""".stripMargin

  def oracle: Map[String, String] = Map(
    "v1_knn_brute" -> sqlKnn("q.vec_id <> c.vec_id"),

    "v2_knn_ivf" -> sqlKnn("q.label = c.label AND q.vec_id <> c.vec_id"),

    // max(struct(cos, -cid)) ≡ QUALIFY ROW_NUMBER() ORDER BY cos DESC,
    // c_id — cosines are bit-identical (strict fold), so the argmax row
    // is the same on both engines
    "v5_cell_assign" ->
      s"""WITH e AS ($sqlWithNorm)
         |SELECT vec_id, cell, cell_cos FROM (
         |  SELECT v.vec_id, c.vec_id AS cell,
         |    ${sqlCos("v.embedding", "c.embedding", "v.nrm", "c.nrm")} AS cell_cos,
         |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
         |      ORDER BY ${sqlCos("v.embedding", "c.embedding", "v.nrm", "c.nrm")} DESC,
         |               c.vec_id) AS rnk
         |  FROM e v CROSS JOIN (SELECT * FROM e WHERE vec_id < 8) c)
         |WHERE rnk = 1""".stripMargin,

    "v4_knn_lsh" ->
      s"""WITH e0 AS ($sqlWithNorm),
         |sg AS ($sqlLshSig),
         |e AS (SELECT e0.*, sg.sig FROM e0 JOIN sg USING (vec_id))
         |SELECT q_id, n_id, rnk, cos_sim FROM (
         |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |    ${sqlCos("q.embedding", "c.embedding", "q.nrm", "c.nrm")} AS cos_sim,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${sqlCos("q.embedding", "c.embedding", "q.nrm", "c.nrm")} DESC,
         |               c.vec_id) AS rnk
         |  FROM e q JOIN e c ON q.sig = c.sig AND q.vec_id <> c.vec_id
         |  WHERE q.vec_id % 50 = 0)
         |WHERE rnk <= 3""".stripMargin,

    "v3_embedding_neardup" ->
      s"""WITH e AS ($sqlWithNorm)
         |SELECT vec_a, vec_b, cos_sim FROM (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    ${sqlCos("a.embedding", "b.embedding", "a.nrm", "b.nrm")} AS cos_sim
         |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
         |WHERE cos_sim >= 0.3""".stripMargin
  )
}

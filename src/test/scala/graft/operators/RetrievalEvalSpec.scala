package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[Similarity.retrievalEval]] (MRR@k, binary-relevance NDCG@k)
  * against hand-computed values, including the fp-determinism
  * contract: the DCG is a FIXED left-assoc fold over per-rank hit
  * flags, never a partition-order row sum.
  */
class RetrievalEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d = Similarity.dcgDiscounts(3)

  test("dcgDiscounts: 1/log2(r+1), prefix sums strictly increasing") {
    assert(d(0) === 1.0)
    assert(d(2) === 0.5)
    assert(math.abs(d(1) - 0.6309297535714574) < 1e-15)
  }

  test("hand-computed MRR and NDCG, including miss and partial hits") {
    // truth: q1 -> {10, 11, 12}; q2 -> {20, 21, 22}; q3 -> {30}
    val truth = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 20L), (2L, 21L), (2L, 22L),
      (3L, 30L)).toDF("q_id", "n_id")
    // ranked: q1 perfect order; q2 hits only rank 2 (21) and rank 3
    // is irrelevant; q3 retrieves nothing relevant
    val ranked = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 99L, 1), (2L, 21L, 2), (2L, 98L, 3),
      (3L, 97L, 1), (3L, 96L, 2), (3L, 95L, 3))
      .toDF("q_id", "n_id", "rnk")
    val got = Similarity.retrievalEval(truth, ranked, k = 3)
      .select("q_id", "n_rel", "mrr", "dcg", "ndcg")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // q1: all three at their ideal ranks -> mrr 1, ndcg 1
    val idcg3 = (0.0 + d(0)) + d(1) + d(2)
    assert(got(1L) === ((1L, 3L, 1.0, idcg3, idcg3 / idcg3)))
    // q2: one hit at rank 2 -> mrr 1/2, dcg d2, idcg over n_rel=3
    assert(got(2L) === ((2L, 3L, 0.5, d(1), d(1) / idcg3)))
    // q3: single-truth query, no hit -> mrr 0, dcg 0, ndcg 0
    // (idcg uses min(n_rel, k) = 1)
    assert(got(3L) === ((3L, 1L, 0.0, 0.0, 0.0)))
  }

  test("a truth query absent from the ranked list still gets a row") {
    val truth = Seq((7L, 70L), (7L, 71L)).toDF("q_id", "n_id")
    val ranked = Seq((8L, 80L, 1)).toDF("q_id", "n_id", "rnk")
    val got = Similarity.retrievalEval(truth, ranked, k = 3)
      .select("q_id", "n_rel", "mrr", "ndcg")
      .as[(Long, Long, Double, Double)].collect()
    assert(got.toSeq === Seq((7L, 2L, 0.0, 0.0)))
  }

  test("MRR@k gates on k: a first hit past rank k scores 0, not 1/rank") {
    // the ranked list is DEEPER than k — the @k metric must ignore
    // anything below the cut, exactly like the DCG's per-rank flags
    val truth = Seq((1L, 10L), (2L, 20L)).toDF("q_id", "n_id")
    val ranked = Seq(
      (1L, 10L, 5), // relevant, but first surfaces at rank 5 > k=3
      (2L, 20L, 2)) // in-window control
      .toDF("q_id", "n_id", "rnk")
    val got = Similarity.retrievalEval(truth, ranked, k = 3)
      .select("q_id", "mrr", "dcg", "ndcg")
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 0.0, 0.0, 0.0)))
    assert(got(2L) === ((2L, 0.5, d(1), d(1) / d(0))))
  }

  test("duplicate ranked rows collapse to their best rank: n_rel and DCG stable") {
    val truth = Seq((1L, 10L), (1L, 11L)).toDF("q_id", "n_id")
    // doc 10 listed at ranks 1 AND 3 (a dirty ranked list): it must
    // count once at rank 1 — not fan n_rel to 3, not flag h3
    val dup = Seq((1L, 10L, 1), (1L, 10L, 3), (1L, 11L, 2))
      .toDF("q_id", "n_id", "rnk")
    val clean = Seq((1L, 10L, 1), (1L, 11L, 2))
      .toDF("q_id", "n_id", "rnk")
    def rows(r: org.apache.spark.sql.DataFrame) =
      Similarity.retrievalEval(truth, r, k = 3)
        .select("q_id", "n_rel", "mrr", "dcg", "ndcg")
        .as[(Long, Long, Double, Double, Double)].collect().toSet
    assert(rows(dup) === rows(clean))
    assert(rows(dup).head._2 === 2L)
  }
}

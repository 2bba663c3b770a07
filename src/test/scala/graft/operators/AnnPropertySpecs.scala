package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property tests for the round-14 ANN serving equivalences over
  * GENERATED vector corpora (incl. zero vectors, duplicate vectors,
  * boundary-sitting queries — the cases a fixed fixture undersamples):
  * each property pins one algebraic identity the serve paths promise,
  * either against a sibling operator or an in-memory reference.
  */
class AnnPropertySpecs extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic sample from a Gen (fixed seed — reproducible). */
  private def sample[A](g: Gen[A], n: Int, seed: Long = 77L): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  // 4-dim float vectors over a small integer lattice: collisions,
  // exact ties, and the all-zero vector all occur with real mass
  private val vecGen: Gen[Array[Float]] =
    Gen.listOfN(4, Gen.chooseNum(-3, 3)).map(_.map(_.toFloat).toArray)

  private def corpus(n: Int, seed: Long) =
    sample(vecGen, n, seed).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }

  test("full-probe indexed multiprobe equals brute force on generated corpora") {
    val rows = corpus(40, seed = 101L)
    val c = rows.toDF("vec_id", "embedding")
    val cents = rows.take(4).toDF("vec_id", "embedding")
    val q = rows.filter(_._1 % 7 == 0).toDF("vec_id", "embedding")
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id", "rnk").as[(Long, Long, Int)].collect().toSet
    val brute = res(Similarity.bruteForceKnn(c, q, k = 3))
    assert(brute.nonEmpty)
    // nprobe = |centroids| probes every cell; every corpus vector has
    // exactly one cell, so the candidate set is the full corpus and
    // the rank must agree pair-for-pair with the exhaustive scan
    val served = res(Similarity.ivfMultiprobeKnnIndexed(
      Similarity.indexCells(c, cents), q, cents, k = 3, nprobe = 4))
    assert(served === brute)
  }

  test("indexCells inline-centroid path equals the join fallback on generated corpora") {
    // includes zero vectors (null cosine to every centroid -> the
    // lowest-centroid-id tie rule) and duplicated vectors
    for (seed <- Seq(5L, 6L, 7L)) {
      val rows = corpus(50, seed)
      val c = rows.toDF("vec_id", "embedding")
      val cents = rows.take(3).toDF("vec_id", "embedding")
      def cells(maxInline: Int) =
        Similarity.indexCells(c, cents, maxInlineCentroids = maxInline)
          .select("vec_id", "cell").as[(Long, Long)].collect().toMap
      val inline = cells(64)
      assert(inline.size === rows.size)
      assert(inline === cells(0), s"seed=$seed")
    }
  }

  test("full-probe IVF-PQ serve equals the exhaustive ADC scan on generated corpora") {
    val rows = corpus(40, seed = 202L)
    val c = rows.toDF("vec_id", "embedding")
    val cents = rows.take(4).toDF("vec_id", "embedding")
    val q = rows.filter(_._1 % 9 == 0).toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebook(c, m = 2, k = 4)
    val index = Similarity.indexCells(c, cents, codebook = Some(cb))
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id", "rnk", "dist")
        .as[(Long, Long, Int, Double)].collect().toSet
    val exhaustive = res(Similarity.pqScoreCodes(
      index.select(col("vec_id").as("n_id"), col("codes")), q, cb, k = 3))
    assert(exhaustive.nonEmpty)
    assert(res(Similarity.pqScoreCodesIndexed(index, q, cents, cb,
      k = 3, nprobe = 4)) === exhaustive)
  }

  test("retrievalEval matches an in-memory reference on generated rankings") {
    val discs = Similarity.dcgDiscounts(3)
    val qGen = Gen.chooseNum(1L, 8L)
    val truthRows = sample(Gen.zip(qGen, Gen.chooseNum(0L, 20L)), 60,
      seed = 303L).distinct
    // ranked lists DEEPER than k (ranks 1..5): hits past the cut must
    // score 0 in MRR@3, mirroring the DCG's per-rank flags
    val rankedRows = sample(qGen, 30, seed = 404L).distinct.flatMap(q =>
      sample(Gen.pick(5, 0L to 20L), 1, seed = 500L + q).flatMap(ns =>
        ns.toSeq.sorted.zipWithIndex.map { case (n, i) => (q, n, i + 1) }))
    val got = Similarity.retrievalEval(
        truthRows.toDF("q_id", "n_id"),
        rankedRows.toDF("q_id", "n_id", "rnk"), k = 3)
      .select("q_id", "n_rel", "mrr", "dcg", "ndcg")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val rankOf = rankedRows.map { case (q, n, r) => (q, n) -> r }.toMap
    val byQ = truthRows.groupBy(_._1)
    assert(got.keySet === byQ.keySet)
    byQ.foreach { case (qid, ts) =>
      val ranks = ts.flatMap { case (q, n) => rankOf.get((q, n)) }
      val inK = ranks.filter(_ <= 3)
      val mrr = if (inK.isEmpty) 0.0 else 1.0 / inK.min
      // the operator's fixed fold: ((h1*d1) + (h2*d2)) + (h3*d3)
      val hs = (1 to 3).map(r => if (ranks.contains(r)) 1.0 else 0.0)
      val dcg = hs.zip(discs).map { case (h, d) => h * d }.reduce(_ + _)
      val idcg = discs.scanLeft(0.0)(_ + _).tail(
        math.min(ts.size, 3) - 1)
      val (_, nRel, gMrr, gDcg, gNdcg) = got(qid)
      assert(nRel === ts.size.toLong, s"q=$qid")
      assert(gMrr === mrr, s"q=$qid")
      assert(gDcg === dcg, s"q=$qid")
      assert(gNdcg === dcg / idcg, s"q=$qid")
    }
  }
}

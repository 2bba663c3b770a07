package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the SemDeDup decision rule (v10) on crafted clusters where
  * the keep/drop verdicts are known by hand.
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // two orthogonal centroids: cell 0 = x-axis, cell 1 = y-axis
  private val model: Similarity.KmeansModel = Seq(
    0 -> Seq(1.0, 0.0, 0.0, 0.0),
    1 -> Seq(0.0, 1.0, 0.0, 0.0))

  private def df(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("lowest id in a near-dup group is kept; partners point at it") {
    val d = df(
      1L -> Seq(1.0f, 0.0f, 0.0f, 0.0f),   // cell 0, representative
      2L -> Seq(0.99f, 0.05f, 0.0f, 0.0f), // cell 0, ~cos 1 with id 1
      3L -> Seq(0.0f, 1.0f, 0.0f, 0.0f),   // cell 1, alone there
      5L -> Seq(0.98f, 0.02f, 0.0f, 0.0f)) // cell 0, dup of id 1
    val out = Similarity.semDedup(d, model, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(1L -> -1L, 2L -> 1L, 3L -> -1L, 5L -> 1L))
  }

  test("pairs in different cells are never compared") {
    // cos(x, y) ≈ 0.38 ≥ 0.3, but argmax sends them to different
    // cells — SemDeDup's point: candidate pairs are cell-bounded
    val d = df(
      1L -> Seq(1.0f, 0.2f, 0.0f, 0.0f),
      2L -> Seq(0.2f, 1.0f, 0.0f, 0.0f))
    val out = Similarity.semDedup(d, model, threshold = 0.3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(1L -> -1L, 2L -> -1L))
  }

  test("greedy-by-id chains: each drop points at its smallest partner") {
    // angles 0° / 15° / 30° off the x-axis with τ = 0.95 ≈ cos 18.2°:
    // 1–2 and 2–3 are 15° apart (cos ≈ 0.966 ≥ τ), 1–3 is 30°
    // (cos ≈ 0.866 < τ): 3 drops via 2 even though 2 itself dropped
    // via 1 (greedy by id, not transitive closure)
    val d = df(
      1L -> Seq(1.0f, 0.0f, 0.0f, 0.0f),
      2L -> Seq(0.9659f, 0.2588f, 0.0f, 0.0f),
      3L -> Seq(0.8660f, 0.5f, 0.0f, 0.0f))
    val out = Similarity.semDedup(d, model, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(1L -> -1L, 2L -> 1L, 3L -> 2L))
  }

  test("zero vectors are excluded; empty model yields empty output") {
    val d = df(
      1L -> Seq(1.0f, 0.0f, 0.0f, 0.0f),
      9L -> Seq(0.0f, 0.0f, 0.0f, 0.0f))
    val out = Similarity.semDedup(d, model, threshold = 0.5)
    assert(out.select("vec_id").as[Long].collect().toSeq === Seq(1L))
    assert(Similarity.semDedup(d, Seq.empty, threshold = 0.5).count() === 0)
  }

  test("verdicts are partition-independent") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = Similarity.trainKmeans(e, k = 4, iters = 1)
    val a = Similarity.semDedup(e.repartition(1), m, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val b = Similarity.semDedup(e.repartition(7), m, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(a.toSeq === b.toSeq)
  }
}

/** Pins the rare-term scorer (t17): integer rarity rule, exact
  * counts, strict threshold, empty-doc absence.
  */
class RareTermSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  import graft.functions.TextFunctions.tokenize

  private def score(docs: Seq[(Long, String)], permille: Long) =
    Frequency.rareTermScore(docs.toDF("doc_id", "text"), "doc_id",
      tokenize(col("text")), permille)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap

  test("counts and rarity verdicts on a hand-checked corpus") {
    // vocab: a→3, b→1, c→1; tot = 5. permille=300 → rare iff
    // cf·1000 < 1500 ⇔ cf = 1 → b and c rare.
    val out = score(Seq(1L -> "a a b", 2L -> "a c", 3L -> ""), 300L)
    assert(out(1L) === ((3L, 1L, 1L, 1.0 / 3.0)))
    assert(out(2L) === ((2L, 1L, 1L, 0.5)))
    assert(!out.contains(3L)) // zero-token doc absent (sparse result)
  }

  test("threshold is strict: cf·1000 == permille·tot is NOT rare") {
    // vocab: a→2, b→2; tot = 4. permille=500 → 2·1000 == 500·4.
    val out = score(Seq(1L -> "a a b b"), 500L)
    assert(out(1L) === ((4L, 2L, 0L, 0.0)))
  }

  test("scores are partition-independent") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run(n: Int) = Frequency.rareTermScore(docs.repartition(n),
        "doc_id", tokenize(col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).sorted.toSeq
    assert(run(1) === run(7))
  }
}

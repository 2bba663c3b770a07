package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[LateInteraction]] MaxSim semantics against an in-test JVM
  * replay, the indexed two-stage serve against the brute baseline,
  * and the contract edges (zero-norm filtering, quantized-sum
  * determinism, candidate bounding).
  */
class LateInteractionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def chunksDF(rows: Seq[(Long, Int, Seq[Double])]) =
    rows.toDF("doc_id", "chunk_idx", "embedding")

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.foldLeft(0.0)(_ + _)
    val na = math.sqrt(a.map(x => x * x).foldLeft(0.0)(_ + _))
    val nb = math.sqrt(b.map(x => x * x).foldLeft(0.0)(_ + _))
    d / (na * nb)
  }

  /** JVM replay of the quantized MaxSim score. */
  private def maxSimScore(q: Seq[Seq[Double]], d: Seq[Seq[Double]]): BigInt =
    q.map(qc => BigInt(math.floor(
      d.map(dc => cos(qc, dc)).max * 1e12).toLong)).sum

  test("MaxSim ranking matches the JVM replay on a hand-built fixture") {
    // query doc 100: two chunks probing different directions;
    // corpus docs 1..3 with 2 chunks each
    val q = Seq(
      (100L, 0, Seq(1.0, 0.0, 0.0)),
      (100L, 1, Seq(0.0, 1.0, 0.0)))
    val d = Seq(
      (1L, 0, Seq(1.0, 0.1, 0.0)), (1L, 1, Seq(0.0, 0.2, 1.0)),
      (2L, 0, Seq(0.9, 0.9, 0.0)), (2L, 1, Seq(0.3, 0.0, 0.5)),
      (3L, 0, Seq(-1.0, 0.0, 0.0)), (3L, 1, Seq(0.0, -1.0, 0.1)))
    val got = LateInteraction.maxSimTopK(chunksDF(q), chunksDF(d), k = 3)
      .orderBy("rnk").as[(Long, Long, Int, Double)].collect().toSeq
    val expect = Seq(1L, 2L, 3L).map { doc =>
      val dc = d.filter(_._1 == doc).map(_._3)
      doc -> maxSimScore(q.map(_._3), dc)
    }.sortBy { case (doc, s) => (-s, doc) }
    assert(got.map(_._2) === expect.map(_._1))
    got.zip(expect).foreach { case ((_, _, _, score), (_, sq)) =>
      assert(math.abs(score - sq.toDouble / 1e12) < 1e-15)
    }
  }

  test("self-pairs are excluded; k truncates") {
    val ch = Seq(
      (1L, 0, Seq(1.0, 0.0)), (2L, 0, Seq(0.9, 0.1)),
      (3L, 0, Seq(0.0, 1.0)), (4L, 0, Seq(0.5, 0.5)))
    val got = LateInteraction.maxSimTopK(
        chunksDF(ch.take(1)), chunksDF(ch), k = 2)
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(got.map(_._2).toSet === Set(2L, 4L))
    assert(!got.exists(_._2 == 1L))
  }

  test("zero-norm chunks drop from both sides instead of nulling the max") {
    val q = Seq((10L, 0, Seq(1.0, 0.0)), (10L, 1, Seq(0.0, 0.0)))
    val d = Seq((1L, 0, Seq(0.0, 0.0)), (1L, 1, Seq(1.0, 1.0)),
      (2L, 0, Seq(0.0, 0.0))) // doc 2 is ALL zero-norm: absent
    val got = LateInteraction.maxSimTopK(chunksDF(q), chunksDF(d), k = 5)
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(got.map(_._2) === Seq(1L))
    val expect = BigInt(math.floor(cos(Seq(1.0, 0.0), Seq(1.0, 1.0)) * 1e12).toLong)
    assert(math.abs(got.head._4 - expect.toDouble / 1e12) < 1e-15)
  }

  test("indexed serve with full probe coverage equals the brute baseline") {
    val docs = (0L until 60L)
      .map(i => (i, s"w${i % 5} w${i % 7} w${i % 11} u$i x${i % 3}"))
      .toDF("doc_id", "text")
    val ch = Chunking.slidingChunks(docs, "doc_id", "text",
        window = 2, stride = 2)
      .withColumn("chunk_uid",
        col("doc_id") * 1000000L + col("chunk_idx"))
    val ce = Similarity.hashEmbed(ch, dims = 16, idCol = "chunk_uid",
      textCol = "chunk_text",
      carryCols = Seq("doc_id", "chunk_idx")).cache()
    val live = ce.filter(Similarity.norm(col("embedding")) > 0)
    val cents = live.filter(col("chunk_idx") === 0 && col("doc_id") < 4)
    val idx = Similarity.indexCells(live, cents, idCol = "chunk_uid",
      carryCols = Seq("doc_id"))
    val qs = ce.filter(col("doc_id") % 20 === 0)
    val brute = LateInteraction.maxSimTopK(qs,
      ce.select(col("doc_id"), col("chunk_idx"), col("embedding")), k = 3)
    // nprobe = |centroids| ⇒ every cell probed ⇒ candidates = all docs
    val served = LateInteraction.maxSimTopKIndexed(qs, idx, cents,
      k = 3, nprobe = 4)
    val a = brute.orderBy("q_doc", "rnk")
      .as[(Long, Long, Int, Double)].collect().toSeq
    val b = served.orderBy("q_doc", "rnk")
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(a.nonEmpty)
    assert(a === b)
    ce.unpersist()
  }

  test("narrow probe only surfaces docs sharing a probed cell") {
    val ch = Seq(
      // two tight clusters; centroids = one chunk from each
      (1L, 0, Seq(1.0, 0.0)), (2L, 0, Seq(0.99, 0.01)),
      (3L, 0, Seq(0.98, 0.02)),
      (11L, 0, Seq(0.0, 1.0)), (12L, 0, Seq(0.01, 0.99)))
      .toDF("doc_id", "chunk_idx", "embedding")
      .withColumn("chunk_uid", col("doc_id") * 1000000L + col("chunk_idx"))
    val cents = ch.filter(col("doc_id").isin(1L, 11L))
    val idx = Similarity.indexCells(ch, cents, idCol = "chunk_uid",
      carryCols = Seq("doc_id"))
    val qs = ch.filter(col("doc_id") === 2L)
    val got = LateInteraction.maxSimTopKIndexed(qs, idx, cents,
        k = 5, nprobe = 1)
      .as[(Long, Long, Int, Double)].collect().toSeq
    // cell of centroid 1 holds docs 1, 2, 3 — doc 11/12 never score
    assert(got.map(_._2).toSet === Set(1L, 3L))
  }

  test("latestChunkState: a doc update replaces the WHOLE chunk set; tombstone kills it") {
    def chunk(doc: Long, idx: Long, v: Seq[Double], op: String,
              seq: Long) =
      (doc, doc * 1000000L + idx, idx, v, op, seq)
    val feed = Seq(
      // doc 1 inserts 3 chunks, then seq-2 edits down to ONE chunk —
      // the resolve must drop chunks 1/2 without being told their ids
      chunk(1L, 0, Seq(1.0, 0.0), "insert", 1L),
      chunk(1L, 1, Seq(0.5, 0.5), "insert", 1L),
      chunk(1L, 2, Seq(0.0, 1.0), "insert", 1L),
      chunk(1L, 0, Seq(0.9, 0.1), "update", 2L),
      // doc 2 inserts 2 chunks then deletes at doc level (one
      // tombstone row, no chunk identity)
      chunk(2L, 0, Seq(1.0, 1.0), "insert", 1L),
      chunk(2L, 1, Seq(1.0, 0.5), "insert", 1L),
      (2L, -1L, -1L, null.asInstanceOf[Seq[Double]], "delete", 2L),
      // doc 3: delete at seq 2, then a LATE full-set update at seq 1
      // arrives after — the doc's max seq is the tombstone's, so the
      // late set stays dead
      chunk(3L, 0, Seq(0.2, 0.8), "insert", 1L),
      (3L, -1L, -1L, null.asInstanceOf[Seq[Double]], "delete", 3L),
      chunk(3L, 0, Seq(0.3, 0.7), "update", 2L),
      // doc 4 untouched
      chunk(4L, 0, Seq(0.6, 0.4), "insert", 1L))
      .toDF("doc_id", "chunk_uid", "chunk_idx", "embedding", "op", "seq")
    val live = Similarity.latestChunkState(feed)
      .select($"doc_id", $"chunk_idx", $"seq")
      .as[(Long, Long, Long)].collect().toSet
    assert(live === Set((1L, 0L, 2L), (4L, 0L, 1L)),
      "doc 1 shrank to its seq-2 set, docs 2/3 dead, doc 4 intact")
  }
}

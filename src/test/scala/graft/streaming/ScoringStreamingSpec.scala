package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextFunctions.tokenize
import graft.operators.{Classify, Dsir}

/** Train-once/score-forever: the streaming scorers must equal their
  * batch twins bit-for-bit, independently of micro-batch slicing
  * (scoring is stateless per doc), and out-of-train tokens must weigh
  * the documented unseen floor rather than dropping rows.
  */
class ScoringStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val train = Seq(
    (1L, "good clean prose with varied words", true),
    (2L, "more curated text of fine quality", true),
    (3L, "spam spam spam buy buy buy", false),
    (4L, "click here buy spam now", false))

  private def trainDf = train.toDF("doc_id", "text", "pos")

  private val arriving = Seq(
    (10L, "varied clean prose arrives here"),
    (11L, "buy spam now"),
    (12L, "words of fine quality"))

  test("NB stream scores equal the batch op regardless of batch slicing") {
    val model = Classify.nbTrain(
      trainDf, tokenize(lower(col("text"))), col("pos"))
    val unseen = Classify.unseenBits(
      trainDf, tokenize(lower(col("text"))), col("pos"))
    val batchScores = Classify.nbScore(
        arriving.toDF("doc_id", "text"), "doc_id",
        tokenize(lower(col("text"))), model, unseen)
      .as[(Long, Long, Long, Double, Boolean)].collect().toSet

    for (slices <- Seq(Seq(arriving), arriving.grouped(1).toSeq)) {
      implicit val sq = spark.sqlContext
      val got = scala.collection.mutable
        .Set[(Long, Long, Long, Double, Boolean)]()
      val input = MemoryStream[(Long, String)]
      val q = ScoringStreaming.nbScoreStream(
          input.toDF().toDF("doc_id", "text"), model,
          (_, df) => got ++=
            df.as[(Long, Long, Long, Double, Boolean)].collect(),
          unseenW = unseen)
        .start()
      try {
        slices.foreach { s => input.addData(s: _*); q.processAllAvailable() }
      } finally q.stop()
      assert(got.toSet === batchScores, s"slicing=${slices.size} batches")
    }
    assert(batchScores.nonEmpty)
  }

  test("DSIR stream scores equal the batch op; drift weighs the floor") {
    val B = 16
    val toks = tokenize(lower(col("text")))
    val model = Dsir.model(trainDf, toks, col("pos"), B)
    // doc 13 is pure out-of-train vocabulary: with a tiny train
    // corpus some of its hashed buckets are unseen -> they weigh the
    // floor (here 0), and the doc still scores instead of dropping
    val drifted = arriving :+ (13L, "zq zr zs zt zu zv zw zx")
    val batchScores = Dsir.scores(
        drifted.toDF("doc_id", "text"), "doc_id", toks, model, B)
      .as[(Long, Long, Long)].collect().toSet
    assert(batchScores.exists(_._1 == 13L))

    implicit val sq = spark.sqlContext
    val got = scala.collection.mutable.Set[(Long, Long, Long)]()
    val input = MemoryStream[(Long, String)]
    val q = ScoringStreaming.dsirScoreStream(
        input.toDF().toDF("doc_id", "text"), model, B,
        (_, df) => got ++= df.as[(Long, Long, Long)].collect())
      .start()
    try {
      input.addData(drifted.take(2): _*); q.processAllAvailable()
      input.addData(drifted.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    assert(got.toSet === batchScores)
  }

  test("ANN stream results equal the batch multiprobe search per slicing") {
    import graft.operators.Similarity
    // frozen index: 4 corpus vectors, centroids = vectors 0 and 2
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.1f, 0.9f))).toDF("vec_id", "embedding")
    val centroids = corpus.filter(col("vec_id").isin(0L, 2L))
    // arriving queries (ids disjoint from the corpus — a query stream)
    val arrivingQ = Seq(
      (100L, Array(0.8f, 0.2f)),
      (101L, Array(0.2f, 0.8f)),
      (102L, Array(0.7f, 0.7f)))
    val batchRes = Similarity.ivfMultiprobeKnn(
        corpus, arrivingQ.toDF("vec_id", "embedding"), centroids,
        k = 2, nprobe = 2)
      .select("q_id", "n_id", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(batchRes.nonEmpty)

    for (slices <- Seq(Seq(arrivingQ), arrivingQ.grouped(1).toSeq)) {
      implicit val sq = spark.sqlContext
      val got = scala.collection.mutable.Set[(Long, Long, Int)]()
      val input = MemoryStream[(Long, Array[Float])]
      val q = ScoringStreaming.knnScoreStream(
          input.toDF().toDF("vec_id", "embedding"), corpus, centroids,
          k = 2, nprobe = 2,
          (_, df) => got ++=
            df.select("q_id", "n_id", "rnk")
              .as[(Long, Long, Int)].collect())
        .start()
      try {
        slices.foreach { s => input.addData(s: _*); q.processAllAvailable() }
      } finally q.stop()
      assert(got.toSet === batchRes, s"slicing=${slices.size} batches")
    }
  }

  test("BPE stream counts equal the batch op for a TRAINED tokenizer") {
    import graft.functions.Bpe
    // train a tokenizer on the corpus itself (t52's operator), then
    // freeze its merges and serve them — the production economics
    val corpus = Seq(
      (1L, "lower lowest low low lower"),
      (2L, "newer newest new new newer"),
      (3L, "low new lower newer"),
      (4L, ""))
    val merges = Bpe.mergesOf(
      Bpe.train(corpus.toDF("doc_id", "text"), nMerges = 6))
    assert(merges.nonEmpty && merges.size <= 6)
    val batchCounts = Bpe.docTokenCountsWith(
        corpus.toDF("doc_id", "text"), merges)
      .as[(Long, Long, Long)].collect().toSet
    // the trained tokenizer must actually compress: fewer BPE tokens
    // than characters for the repetitive words
    assert(batchCounts.exists { case (_, nw, bt) => nw > 0 && bt < nw * 3 })
    assert(batchCounts.contains((4L, 0L, 0L)), "empty doc scores zero")

    for (slices <- Seq(Seq(corpus), corpus.grouped(1).toSeq,
        corpus.grouped(3).toSeq)) {
      implicit val sq = spark.sqlContext
      val got = scala.collection.mutable.Set[(Long, Long, Long)]()
      val input = MemoryStream[(Long, String)]
      val q = ScoringStreaming.bpeCountStream(
          input.toDF().toDF("doc_id", "text"), merges,
          (_, df) => got ++= df.as[(Long, Long, Long)].collect())
        .start()
      try {
        slices.foreach { s => input.addData(s: _*); q.processAllAvailable() }
      } finally q.stop()
      assert(got.toSet === batchCounts, s"slicing=${slices.size} batches")
    }
  }

  test("MaxSim text-query stream equals the batch two-stage serve per slicing") {
    import graft.operators.{Chunking, LateInteraction, Similarity}
    // corpus: 40 docs, chunked 4/4 and hash-embedded; index staged
    // exactly as v32 does it
    val corpus = (0L until 40L)
      .map(i => (i, s"w${i % 5} w${i % 7} w${i % 11} u$i x${i % 3} y${i % 13} z$i q${i % 2}"))
      .toDF("doc_id", "text")
    def chunksOf(df: org.apache.spark.sql.DataFrame) = {
      val ch = Chunking.slidingChunks(df, "doc_id", "text", 4, 4)
        .withColumn("chunk_uid", col("doc_id") * 1000000L + col("chunk_idx"))
      Similarity.hashEmbed(ch, dims = 16, idCol = "chunk_uid",
          textCol = "chunk_text", carryCols = Seq("doc_id", "chunk_idx"))
        .filter(Similarity.norm(col("embedding")) > 0)
    }
    val ce = chunksOf(corpus).cache()
    val cents = ce.filter(col("chunk_idx") === 0 && col("doc_id") < 4)
    val idx = Similarity.indexCells(ce, cents, idCol = "chunk_uid",
      carryCols = Seq("doc_id"))
    // arriving TEXT queries, ids disjoint from the corpus
    val arriving = Seq(
      (100L, "w1 w2 u7 x1 y4 z9 q0 w3"),
      (101L, "w4 w6 u13 x2 y11 z20 q1 w0"),
      (102L, "w0 w0 u1 x0 y1 z2 q0 w1"))
    val batchRes = LateInteraction.maxSimTopKIndexed(
        chunksOf(arriving.toDF("doc_id", "text")), idx, cents,
        k = 3, nprobe = 2)
      .select("q_doc", "n_doc", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(batchRes.nonEmpty)
    for (slices <- Seq(Seq(arriving), arriving.grouped(1).toSeq)) {
      implicit val sq = spark.sqlContext
      val got = scala.collection.mutable.Set[(Long, Long, Int)]()
      val input = MemoryStream[(Long, String)]
      val q = ScoringStreaming.maxSimScoreStream(
          input.toDF().toDF("doc_id", "text"), idx, cents,
          k = 3, nprobe = 2,
          (_, df) => got ++= df.select("q_doc", "n_doc", "rnk")
            .as[(Long, Long, Int)].collect(),
          window = 4, stride = 4, dims = 16)
        .start()
      try {
        slices.foreach { s => input.addData(s: _*); q.processAllAvailable() }
      } finally q.stop()
      assert(got.toSet === batchRes, s"slicing=${slices.size} batches")
    }
    ce.unpersist()
  }
}

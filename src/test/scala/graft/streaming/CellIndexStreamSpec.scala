package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.{Dedup, Similarity}

/** The corpus-side half of ANN serving: the stream-maintained cell
  * index must equal the batch [[Similarity.indexCells]] builder over
  * the union of arrived vectors — under any micro-batch slicing, and
  * across a kill + restart (assignment is stateless per vector; the
  * batch_id partition dir + Overwrite makes replays idempotent).
  * Serving through [[Similarity.ivfMultiprobeKnnIndexed]] over the
  * maintained index must reproduce the batch multiprobe search, and
  * [[Dedup.compactIndex]] (schema-agnostic) must preserve the rows.
  */
class CellIndexStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def centroids = Seq(
    (0L, Array(1.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")

  private val vecs = Seq(
    (10L, Array(0.9f, 0.1f)),
    (11L, Array(0.1f, 0.9f)),
    (12L, Array(0.7f, 0.6f)),
    (13L, Array(0.2f, 0.8f)),
    (14L, Array(0.8f, 0.3f)),
    (15L, Array(0.4f, 0.6f)))

  private def batchIndex(rows: Seq[(Long, Array[Float])]): DataFrame =
    Similarity.indexCells(rows.toDF("vec_id", "embedding"), centroids)

  /** (id, vector, nrm, cell) rows as a comparable set — norms are
    * computed by the same fold on both paths and parquet round-trips
    * floats/doubles exactly, so equality is exact, not approximate.
    */
  private def canon(df: DataFrame): Set[(Long, Seq[Float], Double, Long)] =
    df.select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
      .as[(Long, Seq[Float], Double, Long)].collect().toSet

  test("maintained index equals the batch builder under any slicing") {
    val expected = canon(batchIndex(vecs))
    assert(expected.map(_._4) === Set(0L, 1L), "both cells populated")
    for (slices <- Seq(Seq(vecs), vecs.grouped(1).toSeq,
        vecs.grouped(4).toSeq)) {
      implicit val sq = spark.sqlContext
      val idx = Files.createTempDirectory("cellidx").toString
      val input = MemoryStream[(Long, Array[Float])]
      val q = ScoringStreaming.cellIndexStream(
        input.toDF().toDF("vec_id", "embedding"), centroids, idx).start()
      try slices.foreach { s => input.addData(s: _*); q.processAllAvailable() }
      finally q.stop()
      assert(canon(ScoringStreaming.servedCellIndex(spark, idx)) === expected,
        s"slicing=${slices.size} batches")
    }
  }

  test("indexed serve over the maintained index equals the batch search") {
    implicit val sq = spark.sqlContext
    val idx = Files.createTempDirectory("cellidx_serve").toString
    val input = MemoryStream[(Long, Array[Float])]
    val q = ScoringStreaming.cellIndexStream(
      input.toDF().toDF("vec_id", "embedding"), centroids, idx).start()
    try {
      input.addData(vecs.take(3): _*); q.processAllAvailable()
      input.addData(vecs.drop(3): _*); q.processAllAvailable()
    } finally q.stop()
    val queries = Seq(
      (100L, Array(0.8f, 0.2f)),
      (101L, Array(0.2f, 0.8f))).toDF("vec_id", "embedding")
    def res(df: DataFrame) = df.select("q_id", "n_id", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    val batch = res(Similarity.ivfMultiprobeKnn(
      vecs.toDF("vec_id", "embedding"), queries, centroids,
      k = 2, nprobe = 2))
    assert(batch.nonEmpty)
    assert(res(Similarity.ivfMultiprobeKnnIndexed(
      ScoringStreaming.servedCellIndex(spark, idx), queries, centroids,
      k = 2, nprobe = 2)) === batch)
  }

  test("maintained PQ codes equal the batch encoder; ADC serve matches") {
    implicit val sq = spark.sqlContext
    // hand 2-subspace codebook over the 2-dim vectors (1 dim each,
    // codewords 0.0/1.0) — every encode decision is hand-checkable
    val cb: Similarity.PqCodebook =
      Seq(Seq(Seq(0.0), Seq(1.0)), Seq(Seq(0.0), Seq(1.0)))
    val idx = Files.createTempDirectory("cellidx_pq").toString
    val input = MemoryStream[(Long, Array[Float])]
    val q = ScoringStreaming.cellIndexStream(
      input.toDF().toDF("vec_id", "embedding"), centroids, idx,
      codebook = Some(cb)).start()
    try {
      input.addData(vecs.take(2): _*); q.processAllAvailable()
      input.addData(vecs.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    val served = ScoringStreaming.servedCellIndex(spark, idx)
    def codes(df: DataFrame, id: String) =
      df.select(col(id), col("codes"))
        .as[(Long, Seq[Int])].collect().toSet
    assert(codes(served, "vec_id") ===
      codes(Similarity.pqEncodeCorpus(
        vecs.toDF("vec_id", "embedding"), cb), "n_id"))
    // the served codes feed the ADC scan directly — equal to the
    // fused batch pqKnn row-for-row
    val queries = Seq((100L, Array(0.8f, 0.2f))).toDF("vec_id", "embedding")
    def res(df: DataFrame) = df.select("q_id", "n_id", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    assert(res(Similarity.pqScoreCodes(
        served.select(col("vec_id").as("n_id"), col("codes")),
        queries, cb, k = 2)) ===
      res(Similarity.pqKnn(vecs.toDF("vec_id", "embedding"), queries,
        cb, k = 2)))
  }

  test("indexCells inline-centroid cells equal the assignCells join fallback") {
    // maxInlineCentroids = 0 forces the large-codebook equi-join path;
    // the default takes the one-projection literal-centroid path —
    // VecDot promotes floats to double before multiplying, so both
    // must agree exactly (including norms), not approximately
    val src = vecs.toDF("vec_id", "embedding")
    val inline = canon(Similarity.indexCells(src, centroids))
    val joined = canon(Similarity.indexCells(src, centroids,
      maxInlineCentroids = 0))
    assert(inline.nonEmpty)
    assert(inline === joined)
  }

  test("indexed query-stream serve equals the batch search per slicing") {
    // build the maintained index once, then stream QUERIES against it
    // — the knnScoreStreamIndexed path never re-assigns the corpus
    implicit val sq = spark.sqlContext
    val idx = Files.createTempDirectory("cellidx_qserve").toString
    val vin = MemoryStream[(Long, Array[Float])]
    val maintain = ScoringStreaming.cellIndexStream(
      vin.toDF().toDF("vec_id", "embedding"), centroids, idx).start()
    try { vin.addData(vecs: _*); maintain.processAllAvailable() }
    finally maintain.stop()
    val index = ScoringStreaming.servedCellIndex(spark, idx)

    val arrivingQ = Seq(
      (100L, Array(0.8f, 0.2f)),
      (101L, Array(0.2f, 0.8f)),
      (102L, Array(0.7f, 0.7f)))
    val batchRes = Similarity.ivfMultiprobeKnn(
        vecs.toDF("vec_id", "embedding"), arrivingQ.toDF("vec_id", "embedding"),
        centroids, k = 2, nprobe = 2)
      .select("q_id", "n_id", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(batchRes.nonEmpty)
    for (slices <- Seq(Seq(arrivingQ), arrivingQ.grouped(1).toSeq)) {
      val got = scala.collection.mutable.Set[(Long, Long, Int)]()
      val qin = MemoryStream[(Long, Array[Float])]
      val q = ScoringStreaming.knnScoreStreamIndexed(
          qin.toDF().toDF("vec_id", "embedding"), index, centroids,
          k = 2, nprobe = 2,
          (_, df) => got ++= df.select("q_id", "n_id", "rnk")
            .as[(Long, Long, Int)].collect())
        .start()
      try slices.foreach { s => qin.addData(s: _*); q.processAllAvailable() }
      finally q.stop()
      assert(got.toSet === batchRes, s"slicing=${slices.size} batches")
    }
  }

  test("IVF-PQ serve over the maintained index: full probe equals the exhaustive ADC scan") {
    implicit val sq = spark.sqlContext
    val cb: Similarity.PqCodebook =
      Seq(Seq(Seq(0.0), Seq(1.0)), Seq(Seq(0.0), Seq(1.0)))
    val idx = Files.createTempDirectory("cellidx_ivfpq").toString
    val input = MemoryStream[(Long, Array[Float])]
    val q = ScoringStreaming.cellIndexStream(
      input.toDF().toDF("vec_id", "embedding"), centroids, idx,
      codebook = Some(cb)).start()
    try { input.addData(vecs: _*); q.processAllAvailable() }
    finally q.stop()
    val index = ScoringStreaming.servedCellIndex(spark, idx)
    val queries = Seq(
      (100L, Array(0.8f, 0.2f)),
      (101L, Array(0.2f, 0.8f))).toDF("vec_id", "embedding")
    def res(df: DataFrame) = df.select("q_id", "n_id", "rnk", "dist")
      .as[(Long, Long, Int, Double)].collect().toSet
    // nprobe = |centroids| probes every cell -> the cell pruning is a
    // no-op and the indexed serve must equal the exhaustive scan
    val full = res(Similarity.pqScoreCodes(
      index.select(col("vec_id").as("n_id"), col("codes")), queries, cb,
      k = 3))
    assert(full.nonEmpty)
    assert(res(Similarity.pqScoreCodesIndexed(index, queries, centroids,
      cb, k = 3, nprobe = 2)) === full)
    // the streaming twin must reproduce the batch serve under any
    // slicing (stateless per query row)
    val qRows = Seq(
      (100L, Array(0.8f, 0.2f)),
      (101L, Array(0.2f, 0.8f)))
    for (slices <- Seq(Seq(qRows), qRows.grouped(1).toSeq)) {
      val got = scala.collection.mutable.Set[(Long, Long, Int, Double)]()
      val qin = MemoryStream[(Long, Array[Float])]
      val qs = ScoringStreaming.pqScoreStreamIndexed(
          qin.toDF().toDF("vec_id", "embedding"), index, centroids, cb,
          k = 3, nprobe = 2,
          (_, df) => got ++= df.select("q_id", "n_id", "rnk", "dist")
            .as[(Long, Long, Int, Double)].collect())
        .start()
      try slices.foreach { s => qin.addData(s: _*); qs.processAllAvailable() }
      finally qs.stop()
      assert(got.toSet === full, s"slicing=${slices.size} batches")
    }
    // nprobe = 1 restricts candidates to the query's best cell: every
    // returned neighbor must live in exactly that cell
    val pruned = res(Similarity.pqScoreCodesIndexed(index, queries,
      centroids, cb, k = 3, nprobe = 1))
    val probe1 = Similarity.probeCells(queries, centroids, nprobe = 1)
      .select(col("q_id"), col("q_cell")).as[(Long, Long)].collect().toMap
    val cellOf = index.select(col("vec_id"), col("cell"))
      .as[(Long, Long)].collect().toMap
    assert(pruned.nonEmpty)
    assert(pruned.forall { case (qid, nid, _, _) =>
      cellOf(nid) == probe1(qid) })
  }

  test("kill + restart: index intact; compaction preserves every row") {
    val srcDir = Files.createTempDirectory("cellsrc").toString
    val ck = Files.createTempDirectory("cellck").toString
    val idx = Files.createTempDirectory("cellidx_restart").toString
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def feed(n: Int, rows: Seq[(Long, Array[Float])]): Unit = {
      val lines = rows.map { case (id, e) =>
        s"""{"vec_id":$id,"embedding":[${e.mkString(",")}]}""" }
      Files.write(Paths.get(s"$srcDir/f$n.json"),
        lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    }
    def start() = ScoringStreaming.cellIndexStream(
        spark.readStream.schema(schema).json(srcDir), centroids, idx)
      .option("checkpointLocation", ck).start()

    feed(1, vecs.take(2))
    val q1 = start()
    q1.processAllAvailable(); q1.stop() // kill
    feed(2, vecs.slice(2, 4)) // arrives while the maintainer is down
    val q2 = start() // restart from the same checkpoint
    q2.processAllAvailable()
    feed(3, vecs.drop(4))
    q2.processAllAvailable(); q2.stop()

    val expected = canon(batchIndex(vecs))
    assert(canon(ScoringStreaming.servedCellIndex(spark, idx)) === expected)
    // three committed batch dirs -> compactIndex folds all but the
    // newest (replayable) one; the served rows must not change
    val upto = Dedup.compactIndex(spark, idx)
    assert(upto >= 0, "compaction had >= 3 batch dirs to merge")
    assert(canon(ScoringStreaming.servedCellIndex(spark, idx)) === expected)
  }
}

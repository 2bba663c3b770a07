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

  // ---- upsert maintenance: the index under UPDATE/DELETE ----------

  /** op-carrying feed over `vecs`: everything inserts at seq 1, ids
    * 10/12/14 update at seq 2 (vector components swapped — pure data
    * movement), ids 11/12 delete at seq 3. Latest state: 11 and 12
    * absent, 10/14 swapped, 13/15 as inserted.
    */
  private def swap(e: Array[Float]) = Array(e(1), e(0))
  private val feedRows: Seq[(Long, Array[Float], String, Long)] =
    vecs.map { case (id, e) => (id, e, "insert", 1L) } ++
      vecs.filter(v => Seq(10L, 12L, 14L).contains(v._1))
        .map { case (id, e) => (id, swap(e), "update", 2L) } ++
      Seq((11L, null.asInstanceOf[Array[Float]], "delete", 3L),
        (12L, null.asInstanceOf[Array[Float]], "delete", 3L))
  private val latestRows: Seq[(Long, Array[Float])] = Seq(
    10L -> swap(vecs(0)._2), 13L -> vecs(3)._2,
    14L -> swap(vecs(4)._2), 15L -> vecs(5)._2)

  private def canonUpsert(df: DataFrame): Set[(Long, Seq[Float], Double, Long)] =
    canon(df.select(col("vec_id"), col("embedding"), col("nrm"),
      col("cell")))

  test("upsert-maintained index equals indexCells(latestState(feed)) under any slicing") {
    val expected = canonUpsert(batchIndex(latestRows))
    assert(expected.map(_._1) === Set(10L, 13L, 14L, 15L),
      "deletes excluded, survivors present")
    // resolve-then-index must equal index-then-resolve (pure per-row
    // index columns): the batch composition the stream is pinned to
    assert(canonUpsert(Similarity.latestIndexState(
      Similarity.indexChangelog(
        feedRows.toDF("vec_id", "embedding", "op", "seq"),
        centroids))) === expected)
    for (slices <- Seq(Seq(feedRows), feedRows.grouped(1).toSeq,
        feedRows.grouped(5).toSeq)) {
      implicit val sq = spark.sqlContext
      val idx = Files.createTempDirectory("upsertidx").toString
      val input = MemoryStream[(Long, Array[Float], String, Long)]
      val q = ScoringStreaming.upsertCellIndexStream(
        input.toDF().toDF("vec_id", "embedding", "op", "seq"),
        centroids, idx).start()
      try slices.foreach { s => input.addData(s: _*); q.processAllAvailable() }
      finally q.stop()
      assert(canonUpsert(
        ScoringStreaming.servedUpsertCellIndex(spark, idx)) === expected,
        s"slicing=${slices.size} batches")
    }
  }

  test("upsert index: the changelog fallback join path (maxInlineCentroids=0) matches inline") {
    // a changelog REPEATS ids (insert + update) — the fallback
    // assignment must key on (id, seq), not fan out id-joined rows
    val feed = feedRows.toDF("vec_id", "embedding", "op", "seq")
    val inline = Similarity.indexChangelog(feed, centroids)
    val joined = Similarity.indexChangelog(feed, centroids,
      maxInlineCentroids = 0)
    assert(joined.count() === feedRows.size.toLong, "one row per change")
    def rows(df: DataFrame) =
      df.select(col("vec_id"), col("seq"), col("op"), col("embedding"),
          col("nrm"), col("cell"))
        .as[(Long, Long, String, Seq[Float], Option[Double], Option[Long])]
        .collect().toSet
    assert(rows(inline) === rows(joined))
  }

  test("delete then kill+restart: served state stays the latest, tombstones survive compaction") {
    val srcDir = Files.createTempDirectory("upsrc").toString
    val ck = Files.createTempDirectory("upck").toString
    val idx = Files.createTempDirectory("upsertidx_restart").toString
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("op", StringType),
      StructField("seq", LongType)))
    def feed(n: Int, rows: Seq[(Long, Array[Float], String, Long)]): Unit = {
      val lines = rows.map { case (id, e, op, seq) =>
        val emb = if (e == null) "null" else s"[${e.mkString(",")}]"
        s"""{"vec_id":$id,"embedding":$emb,"op":"$op","seq":$seq}""" }
      Files.write(Paths.get(s"$srcDir/f$n.json"),
        lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    }
    def start() = ScoringStreaming.upsertCellIndexStream(
        spark.readStream.schema(schema).json(srcDir), centroids, idx)
      .option("checkpointLocation", ck).start()

    val (inserts, rest) = feedRows.splitAt(vecs.size)
    feed(1, inserts) // all inserts
    val q1 = start()
    q1.processAllAvailable(); q1.stop() // kill
    feed(2, rest.take(2)) // two updates arrive while down
    val q2 = start() // restart from the same checkpoint
    q2.processAllAvailable()
    feed(3, rest.drop(2)) // last update + both DELETES
    q2.processAllAvailable(); q2.stop()

    val expected = canonUpsert(batchIndex(latestRows))
    assert(canonUpsert(
      ScoringStreaming.servedUpsertCellIndex(spark, idx)) === expected)
    // the serve over the maintained index equals the batch serve over
    // the resolved corpus — deleted vectors must never surface
    val queries = Seq(
      (100L, Array(0.8f, 0.2f)),
      (101L, Array(0.2f, 0.8f))).toDF("vec_id", "embedding")
    def res(df: DataFrame) = df.select("q_id", "n_id", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    val served = res(Similarity.ivfMultiprobeKnnIndexed(
      ScoringStreaming.servedUpsertCellIndex(spark, idx), queries,
      centroids, k = 2, nprobe = 2))
    assert(served === res(Similarity.ivfMultiprobeKnn(
      latestRows.toDF("vec_id", "embedding"), queries, centroids,
      k = 2, nprobe = 2)))
    assert(!served.exists { case (_, nid, _) => nid == 11L || nid == 12L })
    // compaction folds batch dirs WITHOUT resolving: tombstones must
    // survive it (a compacted window still reports "ended deleted"),
    // and the served state must not change
    val upto = Dedup.compactIndex(spark, idx)
    assert(upto >= 0)
    val compacted = ScoringStreaming.servedCellIndex(spark, idx)
    assert(compacted.filter(col("op") === "delete").count() === 2L,
      "tombstones kept in storage")
    assert(canonUpsert(Similarity.latestIndexState(compacted)) === expected)
  }

  test("centroid-generation swap at a micro-batch boundary: no batch serves a mixed index") {
    implicit val sq = spark.sqlContext
    val corpus = vecs.toDF("vec_id", "embedding")
    val gen2Cents = Seq(
      (0L, Array(0.7f, 0.7f)),
      (1L, Array(0.0f, 1.0f)),
      (2L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    // both generations staged through Artifacts under ONE logicalId:
    // publishing gen2 must prune gen1 by the recorded-logical-id rule
    val artRoot = Files.createTempDirectory("genart").toString
    val prevRoot = sys.props.get("graft.artifacts.root")
    sys.props("graft.artifacts.root") = artRoot
    try {
      val logical = "cellindex|spec-gen-swap"
      def logicalDirs() =
        Option(new java.io.File(artRoot).listFiles()).getOrElse(Array.empty)
          .filter(d => d.isDirectory &&
            new java.io.File(d, "_logical").exists() &&
            java.nio.file.Files.readString(
              new java.io.File(d, "_logical").toPath) == logical)
      val idx1 = graft.core.Artifacts.table(spark, logical, "gen1")(
        Similarity.indexCells(corpus, centroids))
      val gens = new java.util.concurrent.atomic.AtomicReference(
        ("gen1", centroids, idx1))
      val arrivingQ = Seq(
        (100L, Array(0.8f, 0.2f)),
        (101L, Array(0.2f, 0.8f)),
        (102L, Array(0.7f, 0.7f)))
      val got = scala.collection.mutable.ArrayBuffer[
        (Long, String, Set[(Long, Long, Int)])]()
      val qin = MemoryStream[(Long, Array[Float])]
      val q = ScoringStreaming.knnScoreStreamGenerational(
          qin.toDF().toDF("vec_id", "embedding"),
          () => gens.get(), k = 2, nprobe = 2,
          (bid, gen, df) => got += ((bid, gen,
            df.select("q_id", "n_id", "rnk")
              .as[(Long, Long, Int)].collect().toSet)))
        .start()
      try {
        qin.addData(arrivingQ.take(2): _*); q.processAllAvailable()
        // RETRAIN: publish gen2 (prunes gen1), swap the serving ref —
        // the swap lands between micro-batches by construction
        val idx2 = graft.core.Artifacts.table(spark, logical, "gen2")(
          Similarity.indexCells(corpus, gen2Cents))
        gens.set(("gen2", gen2Cents, idx2))
        qin.addData(arrivingQ.drop(2): _*); q.processAllAvailable()
      } finally q.stop()
      assert(logicalDirs().length === 1, "old generation pruned")
      assert(got.map(_._2).toSet === Set("gen1", "gen2"),
        "batches on both sides of the swap")
      // every batch's rows equal the batch serve under the ONE
      // generation it reports — no batch mixed generations
      def batchServe(qs: Set[Long], cents: DataFrame) =
        Similarity.ivfMultiprobeKnn(corpus,
            arrivingQ.filter(v => qs.contains(v._1))
              .toDF("vec_id", "embedding"), cents, k = 2, nprobe = 2)
          .select("q_id", "n_id", "rnk")
          .as[(Long, Long, Int)].collect().toSet
      got.foreach { case (bid, gen, rows) =>
        val qids = rows.map(_._1)
        val cents = if (gen == "gen1") centroids else gen2Cents
        if (rows.nonEmpty)
          assert(rows === batchServe(qids, cents), s"batch $bid gen $gen")
      }
      // post-swap results exist and equal the new-generation serve
      val postSwap = got.filter(_._2 == "gen2").flatMap(_._3).toSet
      assert(postSwap.nonEmpty)
      assert(postSwap === batchServe(Set(102L), gen2Cents))
    } finally {
      prevRoot match {
        case Some(r) => sys.props("graft.artifacts.root") = r
        case None => sys.props.remove("graft.artifacts.root")
      }
    }
  }

  test("retrain loop closed: drift degrades imbalance, retrain fires exactly once, recall recovers") {
    implicit val sq = spark.sqlContext
    val root = Files.createTempDirectory("retrainidx").toString
    val cents0 = centroids // (1,0) / (0,1)
    // balanced start: 2 per cell -> imbalance 1.0, far below threshold
    val balanced = Seq(
      (10L, Array(0.9f, 0.1f)), (11L, Array(0.1f, 0.9f)),
      (12L, Array(0.8f, 0.2f)), (13L, Array(0.2f, 0.8f)))
    // drift cluster, two waves: every vector has x > y, so ALL land in
    // cell 0 under gen1. Wave 1 -> occupancy 5/2, imbalance
    // 5*2/7 = 1.43 < 1.5 (degraded but under threshold — the window
    // where the serve is measurably bad); wave 2 -> 8/2,
    // 8*2/10 = 1.6 > 1.5 (the trigger)
    val drift1 = Seq(
      (20L, Array(0.9f, 0.5f)), (21L, Array(0.88f, 0.55f)),
      (22L, Array(0.86f, 0.58f)))
    val drift2 = Seq(
      (23L, Array(0.85f, 0.6f)), (24L, Array(0.82f, 0.62f)),
      (25L, Array(0.8f, 0.65f)))
    // post-retrain healthy arrivals: every cell lands at 3 -> imb 1.0
    val healthy = Seq(
      (14L, Array(0.95f, 0.05f)), (15L, Array(0.05f, 0.95f)))
    // deterministic recenter the spec controls: keep the axis
    // centroids, add two splitting the drift cluster -> occupancy
    // 2/2/3/3 at the swap (imbalance 1.2 < 1.5: no refire)
    val cents2 = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.88f, 0.54f)), (3L, Array(0.82f, 0.62f)))
      .toDF("vec_id", "embedding")
    val fires =
      scala.collection.mutable.ArrayBuffer[(String, String, Double)]()
    val ref = new java.util.concurrent.atomic.AtomicReference(
      ("g0001", cents0))
    ScoringStreaming.publishGeneration(root, "g0001", cents0)

    val vin = MemoryStream[(Long, Array[Float])]
    val maintain = ScoringStreaming.cellIndexStreamWithRetrain(
        vin.toDF().toDF("vec_id", "embedding"), root, ref,
        maxImbalance = 1.5, retrain = _ => cents2,
        onRetrain = (from, to, imb) => fires += ((from, to, imb)))
      .start()
    // the serving stream shares the SAME ref: resolve reads it once
    // per query micro-batch, so the swap is batch-atomic on this side
    val served = scala.collection.mutable.ArrayBuffer[
      (Long, String, Set[(Long, Long, Int)])]()
    val qin = MemoryStream[(Long, Array[Float])]
    val serve = ScoringStreaming.knnScoreStreamGenerational(
        qin.toDF().toDF("vec_id", "embedding"),
        () => {
          val (g, c) = ref.get()
          (g, c, ScoringStreaming.servedGenIndex(spark, root, g))
        },
        k = 3, nprobe = 1,
        (bid, gen, df) => served += ((bid, gen,
          df.select("q_id", "n_id", "rnk")
            .as[(Long, Long, Int)].collect().toSet)))
      .start()
    // the drift-region query: y-leaning, so under gen1 its nprobe=1
    // cell is c1 — while its TRUE neighbors are drift vectors in c0
    val query = Seq((100L, Array(0.68f, 0.7f)))
    def brute(corpus: Seq[(Long, Array[Float])]): Set[Long] =
      Similarity.bruteForceKnn(corpus.toDF("vec_id", "embedding"),
          query.toDF("vec_id", "embedding"), k = 3)
        .select("n_id").as[Long].collect().toSet
    try {
      vin.addData(balanced: _*); maintain.processAllAvailable()
      assert(fires.isEmpty, "balanced index must not trigger")
      assert(ref.get()._1 === "g0001")
      // wave 1: degraded (hot cell) but under threshold — no fire
      vin.addData(drift1: _*); maintain.processAllAvailable()
      assert(fires.isEmpty, "under-threshold drift must not trigger")
      // the degraded serve: the query probes c1, every true neighbor
      // (all drift) sits in hot c0 — recall@3 = 0
      qin.addData(query: _*); serve.processAllAvailable()
      val pre = served.last
      assert(pre._2 === "g0001")
      val preTruth = brute(balanced ++ drift1)
      assert(preTruth === Set(20L, 21L, 22L), "true neighbors are drift")
      assert(pre._3.map(_._2).intersect(preTruth).isEmpty,
        "pre-retrain recall@3 is 0 under the drifted index")
      // wave 2 crosses the threshold: the retrain fires, exactly once
      vin.addData(drift2: _*); maintain.processAllAvailable()
      assert(fires.toSeq.map(t => (t._1, t._2)) ===
        Seq(("g0001", "g0002")))
      assert(fires.head._3 > 1.5, "trigger carried the degraded stat")
      assert(ref.get()._1 === "g0002")
      // healthy arrivals post-swap: stats stay under threshold — the
      // trigger must NOT re-fire (exactly-once per degradation)
      vin.addData(healthy: _*); maintain.processAllAvailable()
      assert(fires.size === 1, "no refire while healthy")
      // post-swap recall recovers: the retrained cells isolate the
      // drift region, so the same nprobe=1 query now finds the truth
      qin.addData(query: _*); serve.processAllAvailable()
      val post = served.last
      assert(post._2 === "g0002")
      val postTruth = brute(balanced ++ drift1 ++ drift2 ++ healthy)
      assert(post._3.map(_._2) === postTruth,
        "post-retrain recall@3 = 1 (equals brute)")
      // no mixed generations anywhere
      assert(served.map(_._2).toSet === Set("g0001", "g0002"))
    } finally { maintain.stop(); serve.stop() }
    // restart story: the newest committed generation recovers with its
    // retrained centroids
    val (gen, cents) = ScoringStreaming.resumeGeneration(spark, root)
    assert(gen === "g0002")
    assert(cents.count() === 4L)
  }

  test("growth retrain: a 10x flood fires a k-grown retrain once; occupancy returns to band") {
    implicit val sq = spark.sqlContext
    val root = Files.createTempDirectory("growthidx").toString
    val cents0 = centroids // k = 2
    // seed: 6 vectors on 2 cells -> occupancy 3, far under the bar
    val seed = vecs
    // the FLOOD: 10x the seed, spread uniformly on the unit circle's
    // first quadrant, so no single cell is hot — imbalance stays
    // healthy while occupancy blows through the bar (the trigger
    // imbalance alone is blind to: the corpus outgrew k, not skewed)
    val flood = (0 until 60).map { i =>
      val a = (i + 0.5) * (math.Pi / 2) / 60
      (1000L + i, Array(math.cos(a).toFloat, math.sin(a).toFloat))
    }
    val nAll = (seed.size + flood.size).toLong // 66
    val kGrown = Similarity.growthK(nAll) // ceil(sqrt(66)) = 9
    assert(kGrown === 9)
    val fires =
      scala.collection.mutable.ArrayBuffer[(String, String, Double)]()
    val ref = new java.util.concurrent.atomic.AtomicReference(
      ("g0001", cents0))
    ScoringStreaming.publishGeneration(root, "g0001", cents0)
    val vin = MemoryStream[(Long, Array[Float])]
    // maxOccupancy = 10: seed occupancy 3 (no fire); post-flood
    // 66/2 = 33 (fire); post-retrain 66/9 = 7.3 (back in band, no
    // refire). The retrain is the DEFAULT policy — k grows with N
    val maintain = ScoringStreaming.cellIndexStreamWithRetrain(
        vin.toDF().toDF("vec_id", "embedding"), root, ref,
        maxImbalance = Double.PositiveInfinity,
        retrain = Similarity.growthRetrain(),
        onRetrain = (from, to, imb) => fires += ((from, to, imb)),
        maxOccupancy = 10.0)
      .start()
    try {
      vin.addData(seed: _*); maintain.processAllAvailable()
      assert(fires.isEmpty, "seed occupancy 3 must not trigger")
      vin.addData(flood: _*); maintain.processAllAvailable()
      assert(fires.toSeq.map(t => (t._1, t._2)) ===
        Seq(("g0001", "g0002")), "the flood fires exactly once")
      val (gen2, cents2) = ref.get()
      assert(gen2 === "g0002")
      assert(cents2.count() === kGrown.toLong,
        "the new generation's k follows the sqrt(N) rule")
      // healthy arrivals post-swap: occupancy 68/9 = 7.6 < 10 — the
      // trigger must NOT re-fire (the k-grown codebook absorbed the
      // growth; a fixed-k recenter here would re-fire forever)
      vin.addData((2000L, Array(0.9f, 0.4f)),
        (2001L, Array(0.3f, 0.9f)))
      maintain.processAllAvailable()
      assert(fires.size === 1, "no refire once occupancy is in band")
      // the maintained index is intact and back in band
      val idx = ScoringStreaming.servedGenIndex(spark, root, gen2)
      assert(idx.count() === nAll + 2)
      val st = Similarity.indexStats(idx, cents2)
        .select(col("n_total"), col("n_cells"), col("n_occupied"))
        .as[(Long, Long, Long)].head()
      assert(st._1.toDouble / st._2 <= 10.0, "occupancy in band")
      assert(st._3 >= 5L, "the grown codebook actually spreads load")
    } finally maintain.stop()
    // restart recovery picks up the grown generation + its centroids
    val (gen, cents) = ScoringStreaming.resumeGeneration(spark, root)
    assert(gen === "g0002")
    assert(cents.count() === kGrown.toLong)
    // retention GC: an incomplete dir NEWER than the kept set (a
    // mid-publish retrain) must survive; old committed generations
    // and older crash debris are swept; the served generation resolves
    // unchanged afterwards
    Files.createDirectories(Paths.get(s"$root/g0003")) // mid-publish
    Files.createDirectories(Paths.get(s"$root/g0000")) // crash debris
    assert(ScoringStreaming.pruneGenerations(root, keep = 1) ===
      Seq("g0000", "g0001"))
    assert(ScoringStreaming.pruneGenerations(root, keep = 1) === Nil)
    val (gen2b, cents2b) = ScoringStreaming.resumeGeneration(spark, root)
    assert(gen2b === "g0002" && cents2b.count() === kGrown.toLong)
    assert(new java.io.File(s"$root/g0003").exists(),
      "incomplete newer dir untouched")
  }

  test("upsertCellIndexStream(maxDepth): deep changelog auto-folds in-stream; serve unchanged") {
    implicit val sq = spark.sqlContext
    val idx = Files.createTempDirectory("depthidx").toString
    val input = MemoryStream[(Long, Array[Float], String, Long)]
    val q = ScoringStreaming.upsertCellIndexStream(
      input.toDF().toDF("vec_id", "embedding", "op", "seq"),
      centroids, idx, maxDepth = Some(2.0)).start()
    val b1 = vecs.map { case (id, e) => (id, e, "insert", 1L) }
    val b2 = vecs.filter(v => Seq(10L, 12L, 14L).contains(v._1))
      .map { case (id, e) => (id, swap(e), "update", 2L) }
    val b3 = vecs.map { case (id, e) => (id, swap(e), "update", 3L) }
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      // depth 9/6 = 1.5 <= 2.0: below the bar — nothing folded
      assert(spark.read.parquet(idx).count() === 9L)
      input.addData(b3: _*); q.processAllAvailable()
      // depth 15/6 = 2.5 > 2.0: batches 0-1 fold to one row per id
      // (6), the newest dir (the one legal replay) stays untouched (6)
      assert(spark.read.parquet(idx).count() === 12L)
    } finally q.stop()
    val folded = ScoringStreaming.servedCellIndex(spark, idx)
      .filter(col("batch_id") < 2)
    assert(folded.count() === 6L, "folded region is one row per id")
    // the auto-fold never changes what the serve returns: latest
    // state equals the batch composition over the whole feed
    val expected = canonUpsert(batchIndex(
      vecs.map { case (id, e) => (id, swap(e)) }))
    assert(canonUpsert(
      ScoringStreaming.servedUpsertCellIndex(spark, idx)) === expected)
  }

  test("chunk upsert stream: set-valued serve equals batch composition; depth fold keeps sets") {
    implicit val sq = spark.sqlContext
    val idx = Files.createTempDirectory("chunkidx").toString
    def ch(doc: Long, i: Long, v: Array[Float], op: String, seq: Long) =
      (doc, doc * 1000000L + i, i, v, op, seq)
    val b1 = Seq( // three docs, multi-chunk sets
      ch(1L, 0, Array(0.9f, 0.1f), "insert", 1L),
      ch(1L, 1, Array(0.1f, 0.9f), "insert", 1L),
      ch(1L, 2, Array(0.5f, 0.5f), "insert", 1L),
      ch(2L, 0, Array(0.8f, 0.3f), "insert", 1L),
      ch(2L, 1, Array(0.3f, 0.8f), "insert", 1L),
      ch(3L, 0, Array(0.2f, 0.8f), "insert", 1L))
    val b2 = Seq( // doc 1 edits down to ONE chunk
      ch(1L, 0, Array(0.7f, 0.2f), "update", 2L))
    val b3 = Seq( // doc 2 dies at doc level
      (2L, -1L, -1L, null.asInstanceOf[Array[Float]], "delete", 3L))
    val b4 = Seq( // doc 2's LATE lower-seq set must stay dead
      ch(2L, 0, Array(0.6f, 0.6f), "update", 2L))
    val feed = b1 ++ b2 ++ b3 ++ b4
    val input = MemoryStream[(Long, Long, Long, Array[Float], String, Long)]
    // maxDepth 1.2: after b2 doc versions/docs = 4/3 = 1.33 > 1.2 —
    // the set-preserving fold fires mid-stream
    // centroid frame keyed by the doc column (the ingest assigns
    // cells by idCol on BOTH sides — the v43 discipline)
    val docCents = centroids.withColumnRenamed("vec_id", "doc_id")
    val q = ScoringStreaming.upsertChunkIndexStream(
      input.toDF().toDF("doc_id", "chunk_uid", "chunk_idx",
        "embedding", "op", "seq"),
      docCents, idx, maxDepth = Some(1.2)).start()
    try Seq(b1, b2, b3, b4).foreach { b =>
      input.addData(b: _*); q.processAllAvailable()
    } finally q.stop()
    def canonChunks(df: DataFrame): Set[(Long, Long, Seq[Float], Long)] =
      df.select(col("doc_id"), col("chunk_idx"), col("embedding"),
        col("cell")).as[(Long, Long, Seq[Float], Long)].collect().toSet
    val served = canonChunks(ScoringStreaming.servedChunkIndex(spark, idx))
    // batch twin: resolve-then-index composition over the whole feed
    val expected = canonChunks(Similarity.latestChunkState(
      Similarity.indexChangelog(
        feed.toDF("doc_id", "chunk_uid", "chunk_idx", "embedding",
          "op", "seq"),
        docCents, idCol = "doc_id",
        carryCols = Seq("chunk_uid", "chunk_idx"))))
    assert(served === expected)
    assert(served.map(_._1) === Set(1L, 3L),
      "doc 1 survived shrunk, doc 2 dead despite the late set")
    assert(served.count(_._1 == 1L) === 1, "doc 1 is its seq-2 set only")
    // storage kept doc 2's tombstone (it is the ONLY thing keeping
    // the late b4 set dead) and doc 1's full seq-1 set never leaks
    // back from the folded region
    val stored = spark.read.parquet(idx)
    assert(stored.filter(col("doc_id") === 2L &&
      col("op") === "delete").count() === 1L)
    assert(Dedup.snapshotChunkIndex(spark, idx) >= -1L, "idempotent")
    assert(canonChunks(
      ScoringStreaming.servedChunkIndex(spark, idx)) === expected,
      "explicit fold changes nothing the serve sees")
  }

  test("snapshotIndex: history collapses to one row per id; serve and tombstones survive") {
    implicit val sq = spark.sqlContext
    val idx = Files.createTempDirectory("snapidx").toString
    val input = MemoryStream[(Long, Array[Float], String, Long)]
    val q = ScoringStreaming.upsertCellIndexStream(
      input.toDF().toDF("vec_id", "embedding", "op", "seq"),
      centroids, idx).start()
    // four batch dirs so the DELETES land inside the folded region
    // (the newest dir stays replayable and is never folded)
    val (inserts, rest) = feedRows.splitAt(vecs.size)
    try {
      input.addData(inserts: _*); q.processAllAvailable()
      input.addData(rest.take(3): _*); q.processAllAvailable() // updates
      input.addData(rest.drop(3): _*); q.processAllAvailable() // deletes
      input.addData((16L, Array(0.6f, 0.4f), "insert", 1L))
      q.processAllAvailable()
    } finally q.stop()
    val before = canonUpsert(
      ScoringStreaming.servedUpsertCellIndex(spark, idx))
    assert(before.map(_._1) === Set(10L, 13L, 14L, 15L, 16L))
    val upto = Dedup.snapshotIndex(spark, idx)
    assert(upto >= 2L, "deletes folded into the snapshot")
    // served state identical across the snapshot
    assert(canonUpsert(
      ScoringStreaming.servedUpsertCellIndex(spark, idx)) === before)
    // the folded region holds exactly ONE row per id — the resolve
    // now scans |keys| + |post-fold deltas|, not the full history
    val folded = ScoringStreaming.servedCellIndex(spark, idx)
      .filter(col("batch_id") <= upto)
    assert(folded.count() ===
      folded.select(col("vec_id")).distinct().count())
    assert(folded.filter(col("op") === "delete").count() === 2L,
      "tombstones survive the snapshot")
    // the tombstone still guards: a late sub-seq update for deleted
    // id 11 arriving AFTER the snapshot must not resurrect it
    Similarity.indexChangelog(
        Seq((11L, Array(0.5f, 0.5f), "update", 2L))
          .toDF("vec_id", "embedding", "op", "seq"), centroids)
      .write.mode("overwrite").parquet(s"$idx/batch_id=9")
    val after = canonUpsert(
      ScoringStreaming.servedUpsertCellIndex(spark, idx))
    assert(!after.map(_._1).contains(11L), "late sub-seq update dead")
    // idempotent: nothing left to fold (newest dir excluded)
    assert(Dedup.snapshotIndex(spark, idx) >= -1L)
  }

  test("upsert retrain: flood fires k-grown retrain; tombstones carry into the seed") {
    implicit val sq = spark.sqlContext
    val root = Files.createTempDirectory("upgrowthidx").toString
    val cents0 = centroids // k = 2
    // phase 1 (pre-flood): 6 inserts, one update, one DELETE (id 11)
    val phase1: Seq[(Long, Array[Float], String, Long)] =
      vecs.map { case (id, e) => (id, e, "insert", 1L) } ++ Seq(
        (10L, swap(vecs(0)._2), "update", 2L),
        (11L, null.asInstanceOf[Array[Float]], "delete", 3L))
    // the flood: 54 fresh inserts spread on the quarter circle ->
    // live = 5 + 54 = 59, occupancy 29.5 > 10 fires; k = ceil(√59) = 8
    val flood: Seq[(Long, Array[Float], String, Long)] =
      (0 until 54).map { i =>
        val a = (i + 0.5) * (math.Pi / 2) / 54
        (1000L + i,
          Array(math.cos(a).toFloat, math.sin(a).toFloat), "insert", 1L)
      }
    val kGrown = Similarity.growthK(59) // 8
    // phase 3 (post-swap): a delete of a SEEDED id, and a LATE update
    // for the pre-retrain-deleted id 11 with seq 2 < its delete's
    // seq 3 — the seed's tombstone must keep it dead
    val phase3: Seq[(Long, Array[Float], String, Long)] = Seq(
      (12L, null.asInstanceOf[Array[Float]], "delete", 3L),
      (11L, Array(0.5f, 0.5f), "update", 2L))
    val allFeed = phase1 ++ flood ++ phase3
    val fires =
      scala.collection.mutable.ArrayBuffer[(String, String, Double)]()
    val ref = new java.util.concurrent.atomic.AtomicReference(
      ("g0001", cents0))
    ScoringStreaming.publishGeneration(root, "g0001", cents0)
    val vin = MemoryStream[(Long, Array[Float], String, Long)]
    val maintain = ScoringStreaming.upsertCellIndexStreamWithRetrain(
        vin.toDF().toDF("vec_id", "embedding", "op", "seq"), root, ref,
        maxImbalance = Double.PositiveInfinity,
        retrain = Similarity.growthRetrain(),
        onRetrain = (from, to, imb) => fires += ((from, to, imb)),
        maxOccupancy = 10.0)
      .start()
    try {
      vin.addData(phase1: _*); maintain.processAllAvailable()
      assert(fires.isEmpty, "occupancy 2.5 must not trigger")
      vin.addData(flood: _*); maintain.processAllAvailable()
      assert(fires.toSeq.map(t => (t._1, t._2)) ===
        Seq(("g0001", "g0002")), "the flood fires exactly once")
      val (gen2, cents2) = ref.get()
      assert(gen2 === "g0002")
      assert(cents2.count() === kGrown.toLong, "k follows the sqrt rule")
      vin.addData(phase3: _*); maintain.processAllAvailable()
      assert(fires.size === 1, "59/8 = 7.4 occupancy: no refire")
    } finally maintain.stop()
    // the served generation equals the BATCH composition of the whole
    // feed against the new centroids (resolve-then-index ≡
    // index-then-resolve — the upsertCellIndexStream pin, now across
    // a generation swap)
    def rows(df: DataFrame) =
      df.select(col("vec_id"), col("embedding"), col("cell"))
        .as[(Long, Seq[Float], Long)].collect().toSet
    val gen2Cents = spark.read.parquet(s"$root/g0002/_centroids")
    val served = rows(
      ScoringStreaming.servedGenUpsertIndex(spark, root, "g0002"))
    val batch = rows(Similarity.latestIndexState(
      Similarity.indexChangelog(
        allFeed.toDF("vec_id", "embedding", "op", "seq"), gen2Cents,
        maxInlineCentroids = 0)))
    assert(served === batch)
    val ids = served.map(_._1)
    assert(!ids.contains(11L),
      "the seed's tombstone keeps the late sub-seq update dead")
    assert(!ids.contains(12L), "post-swap delete of a seeded id lands")
    assert(ids.contains(10L) && ids.size === 58)
    // restart recovery resolves the grown generation
    val (gen, cents) = ScoringStreaming.resumeGeneration(spark, root)
    assert(gen === "g0002" && cents.count() === kGrown.toLong)
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

  test("text stream -> hashEmbed -> maintained index: the crawl-to-ANN pipeline") {
    // hashEmbed is a pure projection, so it rides the micro-batch
    // plan untouched: a TEXT feed becomes a servable cell index with
    // no vector source anywhere — the from-crawl ingest shape
    implicit val sq = spark.sqlContext
    val docs = (0L until 30L)
      .map(i => (i, s"tok${i % 5} tok${i % 7} body$i tok${i % 3}"))
    val embed = (df: DataFrame) => Similarity.hashEmbed(
      df, dims = 16, idCol = "doc_id", textCol = "text")
    val textCents = embed(docs.take(2).toDF("doc_id", "text"))
    val idx = Files.createTempDirectory("cellidx_text").toString
    val input = MemoryStream[(Long, String)]
    val q = ScoringStreaming.cellIndexStream(
      embed(input.toDF().toDF("doc_id", "text")), textCents, idx,
      idCol = "doc_id").start()
    try {
      input.addData(docs.take(17): _*); q.processAllAvailable()
      input.addData(docs.drop(17): _*); q.processAllAvailable()
    } finally q.stop()
    val served = ScoringStreaming.servedCellIndex(spark, idx)
      .select(col("doc_id"), col("embedding"), col("nrm"), col("cell"))
      .as[(Long, Seq[Double], Double, Long)].collect().toSet
    val expected = Similarity.indexCells(
        embed(docs.toDF("doc_id", "text")), textCents, idCol = "doc_id")
      .select(col("doc_id"), col("embedding"), col("nrm"), col("cell"))
      .as[(Long, Seq[Double], Double, Long)].collect().toSet
    assert(served === expected)
    assert(expected.map(_._4).size === 2, "both text cells populated")
  }
}

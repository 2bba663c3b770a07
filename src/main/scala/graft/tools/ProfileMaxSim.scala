package graft.tools

import org.apache.spark.sql.functions._



/** Decompose where v32/v43 (the indexed ColBERT serves) spend time:
  * `sbt "runMain graft.tools.ProfileMaxSim <sfDir>"`. Each leg is
  * timed with the noop sink (guide §1.4) so the timed action computes
  * every column and nothing is pruned by count().
  */
object ProfileMaxSim {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // mimic the Bench session: local[32], 8 shuffle partitions
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.VectorOps
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // touch the staged artifacts once (prestage economics)
    VectorOps.queries("v32_maxsim_rerank")(spark, dir)
    VectorOps.queries("v43_chunk_upsert_serve")(spark, dir)
    val ce = VectorOps.profileChunkEmbeds(spark, dir)

    // same-JVM A/B: OLD serve shape (no semi-restrict, no spread)
    // vs the operator's current shape, alternating to cancel JIT
    // and host noise
    def oldServe(index: org.apache.spark.sql.DataFrame): Long = {
      import graft.operators.Similarity.{probeCells, norm}
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val qChunks = ce.filter(col("doc_id") % 50 === 0)
      val cents = ce.filter(col("chunk_idx") === 0 && col("doc_id") < 8)
      val probes = probeCells(qChunks, cents, 2, idCol = "chunk_uid",
        vecCol = "embedding")
      val qMap = qChunks.select(col("chunk_uid").as("q_id"),
        col("doc_id").as("q_doc"))
      val cand = broadcast(
          probes.select(col("q_id"), col("q_cell")).join(qMap, "q_id")
            .select(col("q_doc"), col("q_cell")).distinct())
        .join(index.select(col("cell"), col("doc_id").as("n_doc")),
          col("q_cell") === col("cell"))
        .filter(col("q_doc") =!= col("n_doc"))
        .select(col("q_doc"), col("n_doc")).distinct()
      val q = broadcast(qChunks.select(col("doc_id").as("q_doc"),
          col("chunk_idx").as("q_chunk"), col("embedding").as("q_vec"),
          norm(col("embedding")).as("q_nrm"))
        .filter(col("q_nrm") > 0))
      val c = index.select(col("doc_id").as("n_doc"),
          col("embedding").as("n_vec"), col("nrm").as("n_nrm"))
        .filter(col("n_nrm") > 0)
      val pairs = broadcast(cand).join(c, "n_doc").join(q, "q_doc")
      val cos = graft.operators.Similarity.dot(col("q_vec"), col("n_vec")) /
        (col("q_nrm") * col("n_nrm"))
      val perChunk = pairs.withColumn("_cos", cos)
        .groupBy(col("q_doc"), col("q_chunk"), col("n_doc"))
        .agg(max(col("_cos")).as("_mc"))
      val perDoc = perChunk
        .withColumn("_q", floor(col("_mc") * 1e12).cast(DecimalType(38, 0)))
        .groupBy(col("q_doc"), col("n_doc"))
        .agg(sum(col("_q")).as("_sq"))
      val w = Window.partitionBy(col("q_doc"))
        .orderBy(col("_sq").desc, col("n_doc"))
      perDoc.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("q_doc"), col("n_doc"), col("rnk"),
          (col("_sq").cast(DoubleType) / 1e12).as("score")).count()
    }
    (1 to 3).foreach { i =>
      time(s"AB old v32 $i")(oldServe(VectorOps.profileMaxSimIdx(spark, dir)))
      time(s"AB new v32 $i")(
        VectorOps.queries("v32_maxsim_rerank")(spark, dir).count())
      time(s"AB old v43 $i")(oldServe(VectorOps.profileMaxSimUpsertIdx(spark, dir)))
      time(s"AB new v43 $i")(
        VectorOps.queries("v43_chunk_upsert_serve")(spark, dir).count())
    }
    (1 to 2).foreach { i =>
      time(s"chunkEmbeds FULL noop $i")(noop(ce))
      time(s"chunkEmbeds %50 noop $i")(
        noop(ce.filter(col("doc_id") % 50 === 0)))
      time(s"chunkEmbeds cent noop $i")(
        noop(ce.filter(col("chunk_idx") === 0 && col("doc_id") < 8)))
      time(s"v32 idx scan noop $i")(noop(VectorOps.profileMaxSimIdx(spark, dir)))
      time(s"v43 idx scan noop $i")(noop(VectorOps.profileMaxSimUpsertIdx(spark, dir)))
      time(s"v32 full count $i")(
        VectorOps.queries("v32_maxsim_rerank")(spark, dir).count())
      time(s"v43 full count $i")(
        VectorOps.queries("v43_chunk_upsert_serve")(spark, dir).count())
      // parallelism experiment: same serve with the index stream side
      // repartitioned to the session parallelism before the heavy join
      val p = spark.sparkContext.defaultParallelism
      time(s"v32 serve idx-repart($p) $i") {
        val ce2 = ce
        graft.operators.LateInteraction.maxSimTopKIndexed(
          ce2.filter(col("doc_id") % 50 === 0),
          VectorOps.profileMaxSimIdx(spark, dir).repartition(p, col("doc_id")),
          ce2.filter(col("chunk_idx") === 0 && col("doc_id") < 8),
          k = 3, nprobe = 2).count()
      }
      time(s"v43 serve idx-repart($p) $i") {
        val ce2 = ce
        graft.operators.LateInteraction.maxSimTopKIndexed(
          ce2.filter(col("doc_id") % 50 === 0),
          VectorOps.profileMaxSimUpsertIdx(spark, dir)
            .repartition(p, col("doc_id")),
          ce2.filter(col("chunk_idx") === 0 && col("doc_id") < 8),
          k = 3, nprobe = 2).count()
      }
      if (i == 2) {
        // volumes: candidate pairs, index chunks, pair rows
        import graft.operators.Similarity.{probeCells, norm}
        val idx = VectorOps.profileMaxSimIdx(spark, dir)
        val qChunks = ce.filter(col("doc_id") % 50 === 0)
        val cents = ce.filter(col("chunk_idx") === 0 && col("doc_id") < 8)
        val probes = probeCells(qChunks, cents, 2, idCol = "chunk_uid",
          vecCol = "embedding")
        val qMap = qChunks.select(col("chunk_uid").as("q_id"),
          col("doc_id").as("q_doc"))
        val cand = probes.select(col("q_id"), col("q_cell")).join(qMap, "q_id")
          .select(col("q_doc"), col("q_cell")).distinct()
          .join(idx.select(col("cell"), col("doc_id").as("n_doc")),
            col("q_cell") === col("cell"))
          .filter(col("q_doc") =!= col("n_doc"))
          .select(col("q_doc"), col("n_doc")).distinct()
        println(s"[prof] q_chunks = ${qChunks.count()}")
        println(s"[prof] idx chunks = ${idx.count()}")
        println(s"[prof] cand pairs = ${cand.count()}")
        println(s"[prof] cand distinct n_doc = ${cand.select("n_doc").distinct().count()}")
        val c = idx.select(col("doc_id").as("n_doc"),
          col("embedding").as("n_vec"), col("nrm").as("n_nrm"))
          .filter(col("n_nrm") > 0)
        println(s"[prof] pair rows (cand x n_chunks) = ${broadcast(cand).join(c, "n_doc").count()}")
      }
    }
    spark.stop()
  }
}

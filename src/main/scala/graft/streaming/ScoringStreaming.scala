package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.functions.TextFunctions.tokenize
import graft.operators.{Classify, Dsir}

/** Train-once / score-forever: the streaming serve side of the trained
  * selectors ([[graft.operators.Classify]] NB quality, t45;
  * [[graft.operators.Dsir]] importance weights, t47). The model is fit
  * ONCE over a batch corpus (and staged per (corpus, version) via
  * `core/Artifacts` in a real deployment); arriving documents are
  * scored against that FROZEN model inside `foreachBatch` — the same
  * batch operators, so there is no train/serve skew by construction
  * (spec-pinned: stream scores ≡ batch scores, bit-equal).
  *
  * Scale/exactly-once shape: scoring is STATELESS per document — a
  * token/gram explode, a broadcast model join, a per-doc sum, all
  * batch-local (each doc is one input row, so its whole feature bag
  * lives in the batch that carries it; no keyed state, no watermark,
  * nothing grows with stream history). That statelessness makes
  * per-doc scores a pure function of (doc, model): replayed batches
  * recompute identical rows, so any idempotent sink (the batch-id
  * ledger of `Warehouse`, a keyed upsert, dynamic partition
  * overwrite) gives exactly-once for free. Model drift is the
  * caller's lever: swap the staged artifact between restarts — scores
  * before/after are two model generations, exactly like a tokenizer
  * version bump in [[graft.functions.Bpe]]'s economics.
  *
  * Out-of-train drift: tokens (NB) or hashed buckets (DSIR) the model
  * never saw weigh `unseenW` — pass the training-total floor
  * ([[Classify.unseenBits]]; the DSIR analogue is documented on
  * [[Dsir.scores]]) so drifted content scores conservatively instead
  * of being dropped. With DSIR's B=256 buckets, an unseen bucket
  * means the TRAINING corpus never hashed a gram there — rare beyond
  * toy corpora; the NB vocabulary case is the one that matters.
  */
object ScoringStreaming {

  /** Score a document stream against a frozen NB model
    * ([[Classify.nbTrain]] output). `onBatch` receives
    * [[Classify.nbScore]] rows (id, n_tokens, score_bits, avg_bits,
    * pred) for each micro-batch.
    */
  def nbScoreStream(stream: DataFrame, model: DataFrame,
                    onBatch: (Long, DataFrame) => Unit,
                    idCol: String = "doc_id", textCol: String = "text",
                    unseenW: Column = lit(0L)): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      onBatch(batchId, Classify.nbScore(
        batch, idCol, tokenize(lower(col(textCol))), model, unseenW))
      ()
    }

  /** Score a document stream against a frozen DSIR bucket model
    * ([[Dsir.model]] output, same `buckets`). `onBatch` receives
    * [[Dsir.scores]] rows (id, n_grams, score_bits) per micro-batch —
    * the importance weights; selection over a stream is the caller's
    * policy (a fixed bits threshold replaces the batch resample,
    * since a stream has no final corpus to draw k from).
    */
  def dsirScoreStream(stream: DataFrame, model: DataFrame, buckets: Int,
                      onBatch: (Long, DataFrame) => Unit,
                      idCol: String = "doc_id", textCol: String = "text",
                      unseenW: Column = lit(0L)): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      onBatch(batchId, Dsir.scores(
        batch, idCol, tokenize(lower(col(textCol))), model, buckets,
        unseenW))
      ()
    }

  /** Serve ANN retrieval for an arriving QUERY-vector stream against
    * a frozen index — the vector-family leg of train-once/serve-
    * forever: `corpus` and `centroids` are the staged index tables
    * (cell assignment precomputed at ingest, the
    * [[graft.operators.Similarity.ivfMultiprobeKnn]] economics), and
    * each micro-batch of arriving queries probes its `nprobe` best
    * cells. Stateless per query row (the probe set is a pure function
    * of (query, centroids)), so stream results equal the batch search
    * under any slicing and replays are idempotent under any keyed
    * sink. Index drift = swap the staged corpus/centroid generation
    * between restarts, exactly like a tokenizer version bump.
    */
  def knnScoreStream(stream: DataFrame, corpus: DataFrame,
                     centroids: DataFrame, k: Int, nprobe: Int,
                     onBatch: (Long, DataFrame) => Unit,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      onBatch(batchId, graft.operators.Similarity.ivfMultiprobeKnn(
        corpus, batch, centroids, k, nprobe, idCol, vecCol))
      ()
    }

  /** [[knnScoreStream]] against a PRE-ASSIGNED index
    * ([[graft.operators.Similarity.indexCells]] rows — a staged
    * artifact or the dir [[cellIndexStream]] maintains,
    * read via [[servedCellIndex]]): per micro-batch the arriving
    * queries probe their `nprobe` best cells through
    * [[graft.operators.Similarity.ivfMultiprobeKnnIndexed]], so the
    * corpus-side cell assignment is NEVER recomputed per batch — the
    * plain [[knnScoreStream]] re-derives it from raw vectors every
    * micro-batch, which is correct but pays the corpus × centroids
    * cross per batch; against a 100 TB index only this indexed form
    * is deployable. Stateless per query row, so stream ≡ batch under
    * any slicing (spec-pinned) and replays are idempotent under any
    * keyed sink.
    */
  def knnScoreStreamIndexed(stream: DataFrame, index: DataFrame,
                            centroids: DataFrame, k: Int, nprobe: Int,
                            onBatch: (Long, DataFrame) => Unit,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding")
      : DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      onBatch(batchId, graft.operators.Similarity.ivfMultiprobeKnnIndexed(
        index, batch, centroids, k, nprobe, idCol, vecCol))
      ()
    }

  /** The IVF-PQ twin of [[knnScoreStreamIndexed]]: arriving queries
    * score the maintained/staged CODE-carrying index
    * ([[cellIndexStream]] with a codebook, or a staged
    * [[graft.operators.Similarity.indexCells]] artifact) through
    * [[graft.operators.Similarity.pqScoreCodesIndexed]] — coarse
    * cells prune via the probe equi-join, the per-query ADC tables
    * score the m codeword ids, and the index's raw vectors are never
    * touched at serve time (the v26 query's shape, streamed).
    * Stateless per query row, so stream ≡ batch under any slicing
    * (spec-pinned) and replays are idempotent under any keyed sink.
    */
  def pqScoreStreamIndexed(stream: DataFrame, index: DataFrame,
                           centroids: DataFrame,
                           cb: graft.operators.Similarity.PqCodebook,
                           k: Int, nprobe: Int,
                           onBatch: (Long, DataFrame) => Unit,
                           idCol: String = "vec_id",
                           vecCol: String = "embedding")
      : DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      onBatch(batchId, graft.operators.Similarity.pqScoreCodesIndexed(
        index, batch, centroids, cb, k, nprobe, idCol, vecCol))
      ()
    }

  /** Late-interaction twin of [[knnScoreStreamIndexed]]: a TEXT query
    * stream served against the staged CHUNK index
    * ([[graft.operators.Similarity.indexCells]] over hash-embedded
    * chunks). Per micro-batch the arriving query docs chunk + embed
    * in the batch plan (pure projections — no model call, no state),
    * probe chunk cells for candidate docs, and pay the exact MaxSim
    * re-rank on candidates only
    * ([[graft.operators.LateInteraction.maxSimTopKIndexed]]) — the
    * v32 serve, streamed. Stateless per query row, so stream ≡ batch
    * under any slicing and replays are idempotent under a keyed sink.
    *
    * @param window/stride the chunking config — must match the config
    * the INDEX was built with (a mismatch is a model-version skew,
    * the same contract as a PQ codebook or tokenizer version).
    */
  def maxSimScoreStream(stream: DataFrame, index: DataFrame,
                        centroids: DataFrame, k: Int, nprobe: Int,
                        onBatch: (Long, DataFrame) => Unit,
                        window: Int = 16, stride: Int = 16,
                        dims: Int = 64,
                        idCol: String = "doc_id",
                        textCol: String = "text")
      : DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      import org.apache.spark.sql.functions.col
      val ch = graft.operators.Chunking.slidingChunks(
          batch, idCol, textCol, window, stride)
        .withColumn("chunk_uid",
          col(idCol) * 1000000L + col("chunk_idx"))
      val qs = graft.operators.Similarity.hashEmbed(ch, dims,
          idCol = "chunk_uid", textCol = "chunk_text",
          carryCols = Seq(idCol, "chunk_idx"))
        .filter(graft.operators.Similarity.norm(col("embedding")) > 0)
      onBatch(batchId, graft.operators.LateInteraction.maxSimTopKIndexed(
        qs, index, centroids, k, nprobe, docCol = idCol))
      ()
    }

  /** Maintain the IVF cell-assignment INDEX from an arriving
    * vector INSERT stream — the corpus-side half of
    * [[knnScoreStream]]'s train-once/serve-forever economics, so the
    * "frozen" index becomes a MAINTAINED one: per micro-batch,
    * arriving vectors get their one cell + norm (and, with `codebook`
    * set, their PQ codes — the IVF-PQ ingest shape) against the frozen
    * centroids ([[graft.operators.Similarity.indexCells]] — the exact
    * batch builder, so there is no build/maintain skew by
    * construction) and land in a batch_id-partitioned parquet dir,
    * the same recipe as the LSH bucket index
    * ([[graft.operators.Dedup.streamingCandidatePairs]]).
    *
    * Exactly-once WITHOUT a ledger: each batch writes its OWN
    * partition dir (`batch_id=N`) with mode Overwrite, so an
    * at-least-once replay rewrites identical rows in place instead of
    * appending a duplicate copy — the partition id IS the batch id.
    * Assignment is stateless per vector (a pure function of
    * (vector, centroids)), so the served index equals the batch
    * [[graft.operators.Similarity.indexCells]] over the union of all
    * arrived vectors under any slicing and any kill/restart point
    * (spec-pinned). Long-running streams compact the partition dirs
    * with [[graft.operators.Dedup.compactIndex]] — it is
    * schema-agnostic over any batch_id-partitioned dir. A centroid
    * generation bump = a new indexDir (the staged-artifact
    * economics), exactly like a tokenizer version swap.
    */
  def cellIndexStream(stream: DataFrame, centroids: DataFrame,
                      indexDir: String, idCol: String = "vec_id",
                      vecCol: String = "embedding",
                      codebook: Option[graft.operators.Similarity.PqCodebook]
                        = None)
      : DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.operators.Similarity
        .indexCells(batch, centroids, idCol, vecCol, codebook)
        .write.mode("overwrite").parquet(s"$indexDir/batch_id=$batchId")
      ()
    }

  /** [[cellIndexStream]] for a corpus that doesn't only grow: the
    * arriving feed carries ops (insert/update/DELETE, sequenced per id
    * by `seqCol`) and the maintained dir is an INDEX CHANGELOG
    * ([[graft.operators.Similarity.indexChangelog]] rows — norms,
    * cells, and PQ codes paid at ingest for live ops, tombstone rows
    * for deletes). Same exactly-once recipe as [[cellIndexStream]]:
    * each batch owns its `batch_id=N` partition dir with mode
    * Overwrite, so an at-least-once replay rewrites identical rows in
    * place. Index columns are pure per-row functions of (vector,
    * centroids) and the serve-time read ([[servedUpsertCellIndex]])
    * resolves last-change-per-id, so the served index equals the batch
    * `indexCells(latestState(feed))` under any slicing and any
    * kill/restart point (spec-pinned — including delete-then-restart).
    * Compaction: [[graft.operators.Dedup.compactIndex]] folds batch
    * dirs WITHOUT resolving — tombstones stay in storage (a compacted
    * window must still tell a replayer "this key ended deleted");
    * only the serve-time read drops them.
    *
    * `maxDepth` closes the storage-maintenance loop in-stream: after
    * each committed batch the changelog's DEPTH (rows per distinct
    * id — the resolve amplification every serve pays) is checked and
    * [[graft.operators.Dedup.snapshotIfDeep]] folds the committed
    * region to max-seq change rows (tombstones kept) when it crosses.
    * The newest dir is never folded, so the one legal foreachBatch
    * replay still overwrites its own partition; a crash mid-fold
    * resumes or discards the stage on the next trigger (the
    * [[graft.operators.Dedup.compactIndex]] protocol). Serve results
    * are unchanged by construction — spec-pinned.
    */
  def upsertCellIndexStream(stream: DataFrame, centroids: DataFrame,
                            indexDir: String, idCol: String = "vec_id",
                            vecCol: String = "embedding",
                            opCol: String = "op", seqCol: String = "seq",
                            deleteOp: String = "delete",
                            codebook: Option[
                              graft.operators.Similarity.PqCodebook] = None,
                            maxDepth: Option[Double] = None)
      : DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.operators.Similarity
        .indexChangelog(batch, centroids, idCol, vecCol, opCol, seqCol,
          deleteOp, codebook)
        .write.mode("overwrite").parquet(s"$indexDir/batch_id=$batchId")
      maxDepth.foreach { d =>
        graft.operators.Dedup.snapshotIfDeep(batch.sparkSession, indexDir,
          d, idCol, seqCol)
      }
      ()
    }

  /** [[upsertCellIndexStream]] for the SET-VALUED chunk changelog —
    * the v32/v43 ColBERT index maintained under document edits: the
    * arriving feed is doc-keyed (an update carries the doc's whole
    * NEW chunk set at one seq; a delete is one doc-level tombstone),
    * chunk identity rides `carryCols`, and the serve
    * ([[servedChunkIndex]]) resolves with the set-valued
    * [[graft.operators.Similarity.latestChunkState]]. Same
    * exactly-once recipe (batch-owned partition dir, mode Overwrite);
    * `maxDepth` triggers [[graft.operators.Dedup.snapshotChunkIfDeep]]
    * — the set-preserving fold with the versions-per-doc depth
    * metric (rows-per-doc would confuse chunk count with history).
    */
  def upsertChunkIndexStream(stream: DataFrame, centroids: DataFrame,
                             indexDir: String,
                             docCol: String = "doc_id",
                             vecCol: String = "embedding",
                             opCol: String = "op",
                             seqCol: String = "seq",
                             deleteOp: String = "delete",
                             carryCols: Seq[String] =
                               Seq("chunk_uid", "chunk_idx"),
                             codebook: Option[
                               graft.operators.Similarity.PqCodebook] = None,
                             maxDepth: Option[Double] = None)
      : DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.operators.Similarity
        .indexChangelog(batch, centroids, docCol, vecCol, opCol, seqCol,
          deleteOp, codebook, carryCols = carryCols)
        .write.mode("overwrite").parquet(s"$indexDir/batch_id=$batchId")
      maxDepth.foreach { d =>
        graft.operators.Dedup.snapshotChunkIfDeep(batch.sparkSession,
          indexDir, d, docCol, seqCol)
      }
      ()
    }

  /** Serve the chunk changelog index [[upsertChunkIndexStream]]
    * maintains: all rows of each doc's max-seq version, doc
    * tombstones excluded — ready for
    * [[graft.operators.LateInteraction.maxSimTopKIndexed]].
    */
  def servedChunkIndex(spark: org.apache.spark.sql.SparkSession,
                       indexDir: String, docCol: String = "doc_id",
                       seqCol: String = "seq", opCol: String = "op",
                       deleteOp: String = "delete"): DataFrame =
    graft.operators.Similarity.latestChunkState(
      servedCellIndex(spark, indexDir), docCol, seqCol, opCol, deleteOp)

  /** Serve the changelog index [[upsertCellIndexStream]] maintains:
    * the LATEST index row per id with delete tombstones excluded
    * ([[graft.operators.Similarity.latestIndexState]] — one
    * partial-aggregatable max-struct over the dir, shuffle ≤ |keys|
    * rows), ready for
    * [[graft.operators.Similarity.ivfMultiprobeKnnIndexed]] /
    * [[graft.operators.Similarity.pqScoreCodesIndexed]]. Same
    * batch_id-partition read contract as [[servedCellIndex]].
    */
  def servedUpsertCellIndex(spark: org.apache.spark.sql.SparkSession,
                            indexDir: String, idCol: String = "vec_id",
                            seqCol: String = "seq", opCol: String = "op",
                            deleteOp: String = "delete"): DataFrame =
    graft.operators.Similarity.latestIndexState(
      servedCellIndex(spark, indexDir), idCol, seqCol, opCol, deleteOp)

  /** [[knnScoreStreamIndexed]] under a SWAPPABLE index generation —
    * the remaining lifecycle event of a maintained index: a centroid
    * RETRAIN publishes a new (centroids, index) generation (staged via
    * [[graft.core.Artifacts.table]], whose publish prunes the old
    * generation by the recorded-logical-id rule) while the query
    * stream keeps serving. `resolve` returns the CURRENT
    * (generationId, centroids, index) and is called exactly ONCE per
    * micro-batch, so every row of a batch is served from one
    * generation — a swap lands atomically at a micro-batch boundary,
    * never mid-batch (spec-pinned: each batch's results equal the
    * batch serve under the generation it reports, and post-swap
    * results equal the batch serve over the new generation). The
    * serve itself is stateless per query row, exactly like
    * [[knnScoreStreamIndexed]].
    */
  def knnScoreStreamGenerational(stream: DataFrame,
                                 resolve: () => (String, DataFrame,
                                   DataFrame),
                                 k: Int, nprobe: Int,
                                 onBatch: (Long, String, DataFrame) => Unit,
                                 idCol: String = "vec_id",
                                 vecCol: String = "embedding")
      : DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val (gen, cents, index) = resolve()
      onBatch(batchId, gen, graft.operators.Similarity
        .ivfMultiprobeKnnIndexed(index, batch, cents, k, nprobe, idCol,
          vecCol))
      ()
    }

  // ---- the closed retrain loop: stats → trigger → swap -------------

  /** [[cellIndexStream]] with the RETRAIN LOOP CLOSED — the wiring
    * between the health signal ([[graft.operators.Similarity
    * .indexStats]]'s imbalance, v35), the mechanism
    * ([[knnScoreStreamGenerational]]'s atomic per-batch generation
    * resolve), and the maintained index: a real serving deployment
    * retrains when the stats degrade, not on operator command (the
    * reference's own dim pipeline is config-DRIVEN maintenance —
    * `app/func/TableProcessFunction.java:49-68` reacts to arriving
    * config state the same way this reacts to arriving index state).
    *
    * Per micro-batch: (1) arriving vectors index against the CURRENT
    * generation's centroids into that generation's own
    * `indexRoot/<gen>/batch_id=N` dir (mode Overwrite — the
    * [[cellIndexStream]] idempotence recipe per generation); (2) the
    * generation's stats recompute over the maintained dir; (3) iff
    * `imbalance > maxImbalance` OR `occupancy > maxOccupancy` (and
    * the index has at least `minVectors` rows — tiny indexes have
    * degenerate ratios), the retrain fires ONCE: `retrain(current corpus)` produces the new
    * centroid set, the corpus re-assigns into the NEW generation's
    * seed partition (`batch_id=-1`, below any real batch id), the new
    * centroids persist beside it (`_centroids` — underscore-prefixed,
    * so index reads skip it), and the shared serving ref swaps.
    * Because the serving side resolves the ref once per ITS
    * micro-batch, the swap lands atomically at a query-batch boundary
    * — no batch serves a mixed index. Post-swap the stats recompute
    * under the new generation and sit below the threshold, so the
    * trigger does not re-fire while healthy — exactly-once per
    * degradation, by signal rather than by flag (spec-pinned).
    *
    * Crash-replay contract: a replayed trigger batch re-writes its
    * rows into the (now current) new generation — value-identical to
    * the seed's copy of the same ids (same centroids ⇒ same
    * assignment, exact float math), and [[servedGenIndex]] resolves
    * per-id by max batch_id, so the served index is unchanged. On
    * restart, [[resumeGeneration]] recovers (gen, centroids) from the
    * newest generation dir that has a committed seed or batch.
    *
    * @param current the SAME ref a [[knnScoreStreamGenerational]]
    *   `resolve` closure reads — holding (generationId, centroids);
    *   the serving index is re-read from `indexRoot/<gen>` per query
    *   batch so maintained appends become visible
    * @param retrain current corpus (idCol, vecCol) → new centroids
    *   frame; [[graft.operators.Similarity.growthRetrain]] (the
    *   default policy a growing corpus needs — k ∝ √N), a
    *   [[graft.operators.Similarity.trainKmeans]] recenter at fixed
    *   k, or any deterministic recenter
    * @param maxOccupancy the GROWTH trigger: fire when `n_total /
    *   n_cells` exceeds it — imbalance heals skew but is blind to a
    *   corpus uniformly outgrowing its cell count (every cell grows,
    *   the ratio stays 1). Pair it with a k-GROWING retrain
    *   ([[graft.operators.Similarity.growthRetrain]]): post-swap
    *   occupancy is then `≈ √N / coeff`, back under the bar, so the
    *   trigger stays exactly-once per outgrowth (a fixed-k recenter
    *   under this trigger would re-fire every batch — the occupancy
    *   doesn't change). Default ∞ keeps the r15 imbalance-only
    *   behavior.
    * @param onRetrain observability hook: (fromGen, toGen, imbalance)
    */
  def cellIndexStreamWithRetrain(
      stream: DataFrame, indexRoot: String,
      current: java.util.concurrent.atomic.AtomicReference[
        (String, DataFrame)],
      maxImbalance: Double,
      retrain: DataFrame => DataFrame,
      onRetrain: (String, String, Double) => Unit = (_, _, _) => (),
      minVectors: Long = 1L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxOccupancy: Double = Double.PositiveInfinity)
      : DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val (gen, cents) = current.get()
      graft.operators.Similarity
        .indexCells(batch, cents, idCol, vecCol)
        .write.mode("overwrite")
        .parquet(s"$indexRoot/$gen/batch_id=$batchId")
      val idxNow = servedGenIndex(spark, indexRoot, gen, idCol)
      val st = graft.operators.Similarity
        .indexStats(idxNow, cents, idCol)
        .select(col("imbalance"), col("n_total"), col("n_cells"))
        .limit(1).collect()(0)
      val (imb, nTotal, nCells) =
        (st.getDouble(0), st.getLong(1), st.getLong(2))
      val occupancy = nTotal.toDouble / nCells
      if ((imb > maxImbalance || occupancy > maxOccupancy) &&
          nTotal >= minVectors) {
        val corpus = idxNow.select(col(idCol), col(vecCol))
        val newGen = nextGen(gen)
        retrain(corpus).write.mode("overwrite")
          .parquet(s"$indexRoot/$newGen/_centroids")
        // evaluate-once discipline: retrain(corpus) is LAZY, so using
        // the same frame for the write above and the seed assignment
        // below would run it twice — a non-deterministic retrain
        // (sampled k-means init) would then persist centroids that
        // differ from the ones the seed was assigned against, silently
        // corrupting the generation. The persisted file is the single
        // source of truth; read it back for everything downstream.
        val newCents = spark.read.parquet(s"$indexRoot/$newGen/_centroids")
        graft.operators.Similarity
          .indexCells(corpus, newCents, idCol, vecCol)
          .write.mode("overwrite")
          .parquet(s"$indexRoot/$newGen/batch_id=-1")
        current.set((newGen, newCents))
        onRetrain(gen, newGen, imb)
      }
      ()
    }

  /** Monotonic generation ids: `g0001` → `g0002` → … (zero-padded so
    * lexicographic order IS generation order — what
    * [[resumeGeneration]] sorts by).
    */
  private[streaming] def nextGen(gen: String): String =
    f"g${gen.dropWhile(!_.isDigit).toInt + 1}%04d"

  /** Serve one generation of a [[cellIndexStreamWithRetrain]] index:
    * same batch_id-partition contract as [[servedCellIndex]], plus a
    * per-id max-batch_id resolve (one partial-aggregatable max-struct,
    * shuffle ≤ |keys|) that collapses the one legal duplicate — a
    * crash-replayed trigger batch overlapping the retrain seed, whose
    * rows are value-identical by construction.
    */
  def servedGenIndex(spark: org.apache.spark.sql.SparkSession,
                     indexRoot: String, gen: String,
                     idCol: String = "vec_id"): DataFrame = {
    val dir = s"$indexRoot/$gen"
    val df = spark.read.option("basePath", dir).parquet(dir)
    require(df.columns.contains("batch_id"),
      s"$dir is not a batch_id-partitioned cell index; " +
        "rebuild it (no in-place migration from other layouts)")
    val rest = df.columns.filter(c => c != "batch_id" && c != idCol)
    df.groupBy(col(idCol))
      .agg(max_by(struct(rest.map(col).toSeq: _*), col("batch_id"))
        .as("_r"))
      .select((col(idCol) +: rest.map(c =>
        col(s"_r.$c").as(c)).toSeq): _*)
  }

  /** Bootstrap (or manually publish) a generation: persist its
    * centroid frame where [[resumeGeneration]] looks. The retrain path
    * writes the same layout itself; callers use this once for g0001.
    */
  def publishGeneration(indexRoot: String, gen: String,
                        centroids: DataFrame): Unit =
    centroids.write.mode("overwrite")
      .parquet(s"$indexRoot/$gen/_centroids")

  /** Recover the newest generation after a restart: the
    * lexicographically last `indexRoot/<gen>` dir holding both a
    * committed `_centroids` and at least one committed batch dir —
    * a crash between the centroid write and the seed write leaves an
    * incomplete dir that is skipped (the trigger will simply re-fire
    * on the still-degraded previous generation). Returns
    * (generationId, centroids) ready to seed the shared ref.
    */
  def resumeGeneration(spark: org.apache.spark.sql.SparkSession,
                       indexRoot: String): (String, DataFrame) = {
    val dirs = Option(new java.io.File(indexRoot).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter { d =>
        d.isDirectory &&
          new java.io.File(d, "_centroids/_SUCCESS").exists() &&
          Option(d.listFiles()).getOrElse(Array.empty).exists(b =>
            b.getName.startsWith("batch_id=") &&
              new java.io.File(b, "_SUCCESS").exists())
      }
      .map(_.getName).sorted
    require(dirs.nonEmpty, s"no committed generation under $indexRoot")
    val gen = dirs.last
    (gen, spark.read.parquet(s"$indexRoot/$gen/_centroids"))
  }

  /** Generation retention — the GC half of the retrain loop: every
    * retrain leaves the previous generation's full index on disk
    * (correct for rollback, unbounded over a deployment's lifetime).
    * Deletes all but the newest `keep` COMMITTED generation dirs
    * (lexicographic = generation order), never touching incomplete
    * dirs newer than the kept set (a concurrent retrain mid-publish
    * must not lose its partial writes — [[resumeGeneration]] already
    * skips incomplete dirs on recovery, so they are crash debris only
    * when OLDER than a committed generation, and those are swept).
    * Run it after a swap (e.g. from `onRetrain`) or on a janitor
    * schedule. Returns the deleted generation ids.
    */
  def pruneGenerations(indexRoot: String, keep: Int = 2): Seq[String] = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    def committed(d: java.io.File): Boolean =
      new java.io.File(d, "_centroids/_SUCCESS").exists() &&
        Option(d.listFiles()).getOrElse(Array.empty).exists(b =>
          b.getName.startsWith("batch_id=") &&
            new java.io.File(b, "_SUCCESS").exists())
    val all = Option(new java.io.File(indexRoot).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.isDirectory).sortBy(_.getName)
    val committedNames = all.filter(committed).map(_.getName)
    if (committedNames.length <= keep) return Nil
    val keepFrom = committedNames(committedNames.length - keep)
    val doomed = all.filter(d => d.getName < keepFrom)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    doomed.foreach(rm)
    doomed.map(_.getName).toSeq
  }

  /** [[upsertCellIndexStream]] with the retrain loop closed — the
    * [[cellIndexStreamWithRetrain]] design carried to the CHANGELOG
    * index (insert/update/delete feeds): per micro-batch the arriving
    * changes index against the current generation's centroids into
    * `indexRoot/<gen>/batch_id=N`, the stats recompute over the
    * generation's RESOLVED live state ([[graft.operators.Similarity
    * .latestIndexState]] — tombstoned ids must not count toward
    * occupancy), and a threshold crossing (imbalance OR occupancy)
    * retrains once. The new generation's seed (`batch_id=-1`) is the
    * resolved feed re-indexed against the new centroids — the max-seq
    * CHANGE row per id with tombstones KEPT
    * ([[graft.operators.Similarity.latestIndexChange]]): without the
    * tombstone, a late update with a lower seq than a pre-retrain
    * delete would resurrect the id, diverging from the
    * single-generation resolve. Codebook (when PQ-encoding) is a
    * frozen model artifact shared across generations — only the
    * coarse centroids retrain (the FAISS deployment convention; a
    * codebook refresh is a full re-release, not a maintenance event).
    *
    * Crash-replay: a replayed trigger batch rewrites value-identical
    * (id, seq) rows into the (now current) new generation — the
    * serve's max-seq resolve collapses them, so the served state is
    * unchanged. [[resumeGeneration]] recovers (gen, centroids)
    * unchanged (`batch_id=-1` commits with the generation).
    */
  def upsertCellIndexStreamWithRetrain(
      stream: DataFrame, indexRoot: String,
      current: java.util.concurrent.atomic.AtomicReference[
        (String, DataFrame)],
      maxImbalance: Double,
      retrain: DataFrame => DataFrame,
      onRetrain: (String, String, Double) => Unit = (_, _, _) => (),
      minVectors: Long = 1L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      opCol: String = "op", seqCol: String = "seq",
      deleteOp: String = "delete",
      codebook: Option[graft.operators.Similarity.PqCodebook] = None,
      maxOccupancy: Double = Double.PositiveInfinity)
      : DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val (gen, cents) = current.get()
      graft.operators.Similarity
        .indexChangelog(batch, cents, idCol, vecCol, opCol, seqCol,
          deleteOp, codebook)
        .write.mode("overwrite")
        .parquet(s"$indexRoot/$gen/batch_id=$batchId")
      val all = servedGenChangelog(spark, indexRoot, gen)
      val live = graft.operators.Similarity
        .latestIndexState(all, idCol, seqCol, opCol, deleteOp)
      val st = graft.operators.Similarity
        .indexStats(live, cents, idCol)
        .select(col("imbalance"), col("n_total"), col("n_cells"))
        .limit(1).collect()(0)
      val (imb, nTotal, nCells) =
        (st.getDouble(0), st.getLong(1), st.getLong(2))
      val occupancy = nTotal.toDouble / nCells
      if ((imb > maxImbalance || occupancy > maxOccupancy) &&
          nTotal >= minVectors) {
        val newGen = nextGen(gen)
        retrain(live.select(col(idCol), col(vecCol)))
          .write.mode("overwrite")
          .parquet(s"$indexRoot/$newGen/_centroids")
        // evaluate-once: the persisted file is the single source of
        // truth (the cellIndexStreamWithRetrain discipline)
        val newCents = spark.read.parquet(s"$indexRoot/$newGen/_centroids")
        val seedFeed = graft.operators.Similarity
          .latestIndexChange(all, idCol, seqCol)
          .select(col(idCol), col(vecCol), col(opCol), col(seqCol))
        graft.operators.Similarity
          .indexChangelog(seedFeed, newCents, idCol, vecCol, opCol,
            seqCol, deleteOp, codebook)
          .write.mode("overwrite")
          .parquet(s"$indexRoot/$newGen/batch_id=-1")
        current.set((newGen, newCents))
        onRetrain(gen, newGen, imb)
      }
      ()
    }

  /** One generation of an upsert index as its RAW changelog rows
    * (batch_id dropped) — feed [[graft.operators.Similarity
    * .latestIndexState]] for the served live state, or
    * [[graft.operators.Similarity.latestIndexChange]] for the
    * tombstone-carrying resolve.
    */
  def servedGenChangelog(spark: org.apache.spark.sql.SparkSession,
                         indexRoot: String, gen: String): DataFrame = {
    val dir = s"$indexRoot/$gen"
    val df = spark.read.option("basePath", dir).parquet(dir)
    require(df.columns.contains("batch_id"),
      s"$dir is not a batch_id-partitioned changelog index")
    df.drop("batch_id")
  }

  /** Serve one generation of [[upsertCellIndexStreamWithRetrain]]'s
    * index: the resolved LIVE state (tombstones out), ready for the
    * indexed serves.
    */
  def servedGenUpsertIndex(spark: org.apache.spark.sql.SparkSession,
                           indexRoot: String, gen: String,
                           idCol: String = "vec_id",
                           seqCol: String = "seq",
                           opCol: String = "op",
                           deleteOp: String = "delete"): DataFrame =
    graft.operators.Similarity.latestIndexState(
      servedGenChangelog(spark, indexRoot, gen), idCol, seqCol, opCol,
      deleteOp)

  /** Serve the index [[cellIndexStream]] maintains: (id, vector, nrm,
    * cell) rows ready for
    * [[graft.operators.Similarity.ivfMultiprobeKnnIndexed]] — the
    * corpus-side assignment is never recomputed at serve time. Same
    * read contract as the LSH bucket index: batch_id=N partition dirs
    * ONLY (fail loudly otherwise); a concurrent in-flight batch could
    * be transiently half-visible mid-write — a Delta/Iceberg-backed
    * index makes that window atomic, the parquet-dir contract here
    * documents it instead.
    */
  def servedCellIndex(spark: org.apache.spark.sql.SparkSession,
                      indexDir: String): DataFrame = {
    val df = spark.read.option("basePath", indexDir).parquet(indexDir)
    require(df.columns.contains("batch_id"),
      s"$indexDir is not a batch_id-partitioned cell index; " +
        "rebuild it (no in-place migration from other layouts)")
    df.drop("batch_id")
  }

  /** Count BPE tokens of a document stream against a FROZEN trained
    * merges list ([[graft.functions.Bpe.train]] →
    * [[graft.functions.Bpe.mergesOf]], staged per tokenizer version
    * like the NB/DSIR models above). `onBatch` receives
    * `(id, n_words, bpe_tokens)` rows per micro-batch — stateless per
    * doc (the whole feature bag rides the row), so stream counts equal
    * the batch op under any slicing and any idempotent sink gives
    * exactly-once. A tokenizer version bump = swap the staged merges
    * between restarts.
    */
  def bpeCountStream(stream: DataFrame, merges: Seq[(String, String)],
                     onBatch: (Long, DataFrame) => Unit,
                     idCol: String = "doc_id", textCol: String = "text")
      : DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      onBatch(batchId,
        graft.functions.Bpe.docTokenCountsWith(batch, merges, idCol,
          textCol))
      ()
    }
}

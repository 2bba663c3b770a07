package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.operators.Similarity.{dot, norm, probeCells}

/** ColBERT-style late-interaction retrieval (Khattab & Zaharia,
  * SIGIR '20): documents and queries are bags of CHUNK vectors, and
  * relevance(q, d) = Σ over q's chunks of the max cosine against any
  * of d's chunks (MaxSim). Late interaction keeps per-chunk signal
  * that single-vector pooling destroys — the retrieval shape behind
  * passage-level RAG — while staying entirely in chunk-vector space:
  * no cross-attention, just max/sum over cosines, so it runs as two
  * partial-aggregatable groupBys over a chunk-pair join.
  *
  * Determinism discipline: the per-(query, query-chunk, doc) max is
  * order-free; the per-(query, doc) SUM of maxes is NOT (double
  * addition), so each max quantizes to `floor(mc·1e12)` and sums as
  * DECIMAL(38,0) — exact integers, any aggregation order, both
  * engines ([[Similarity.meanPool]]'s rule). Ranking compares the
  * exact decimal (ties → lowest doc id); `score` reports the double.
  * Zero-norm chunks (sign-cancelled hash embeds, padding) are
  * filtered on BOTH sides — a null cosine would otherwise poison the
  * max with engine-specific null ordering.
  *
  * Scale shape: [[maxSimTopK]] is the labeled brute baseline
  * (|Q-chunks| × |corpus chunks| — eval only); [[maxSimTopKIndexed]]
  * is the serving path: candidate docs come from a probe-cell
  * equi-join against the staged chunk index ([[Similarity.indexCells]]
  * over chunk embeds — chunk-level ANN), and only candidate (q, d)
  * pairs pay the exact MaxSim re-rank. That is ColBERT's own
  * two-stage serve (ANN candidate generation → exact late-interaction
  * re-rank), expressed as joins.
  */
object LateInteraction {

  /** Exact MaxSim top-k: every query chunk against every corpus
    * chunk. Brute baseline — quadratic in chunks; serving goes
    * through [[maxSimTopKIndexed]].
    *
    * @param qChunks (docCol, chunkCol, vecCol) rows — expected small
    *                (a query batch); broadcast.
    * @param dChunks (docCol, chunkCol, vecCol) rows.
    */
  def maxSimTopK(qChunks: DataFrame, dChunks: DataFrame, k: Int,
                 docCol: String = "doc_id",
                 chunkCol: String = "chunk_idx",
                 vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(querySide(qChunks, docCol, chunkCol, vecCol))
    val c = dChunks.select(col(docCol).as("n_doc"),
        col(vecCol).as("n_vec"), norm(col(vecCol)).as("n_nrm"))
      .filter(col("n_nrm") > 0)
    maxSimRank(q.join(c, col("q_doc") =!= col("n_doc")), k)
  }

  /** Candidate-bounded MaxSim top-k over a STAGED chunk index
    * ([[Similarity.indexCells]] rows: uidCol, docCol, vecCol, nrm,
    * cell). Stage 1: each query chunk probes its `nprobe` best cells
    * and any doc with a chunk in a probed cell becomes a candidate —
    * a broadcast equi-join on the cell, never a corpus scan per
    * query. Stage 2: candidate (q, d) pairs pay the exact MaxSim over
    * the index's own chunk vectors (raw vectors ride the index — no
    * second corpus fetch).
    */
  def maxSimTopKIndexed(qChunks: DataFrame, index: DataFrame,
                        centroids: DataFrame, k: Int, nprobe: Int,
                        docCol: String = "doc_id",
                        chunkCol: String = "chunk_idx",
                        uidCol: String = "chunk_uid",
                        vecCol: String = "embedding"): DataFrame = {
    // probe keyed by the chunk uid (probeCells keys centroids by the
    // same column — centroid rows are chunk rows, so it exists on
    // both sides), then map uid → query DOC through the query frame
    // (query-batch-sized, broadcast)
    val probes = probeCells(qChunks, centroids, nprobe, idCol = uidCol,
      vecCol = vecCol)
    val qMap = qChunks.select(col(uidCol).as("q_id"),
      col(docCol).as("q_doc"))
    // persisted (r18): cand feeds THREE consumers below — the semi-join
    // doc list, the broadcast build of the q×d join, and its own
    // distinct n_doc projection. Catalyst does not dedupe subtrees, so
    // without the pin the whole probe pipeline (query chunk embeds →
    // centroid cross join → rank windows) replays once per consumer —
    // the plan carried the probe lineage twice (v32 plan diff,
    // plans/r18). Query-batch × nprobe sized — KBs at any corpus scale;
    // same cache-lifecycle convention as Dedup.nearDupPairs (callers
    // sweeping queries clear between runs; Bench/Verify do).
    val cand = broadcast(
        probes.select(col("q_id"), col("q_cell")).join(qMap, "q_id")
          .select(col("q_doc"), col("q_cell")).distinct())
      .join(index.select(col("cell"), col(docCol).as("n_doc")),
        col("q_cell") === col("cell"))
      .filter(col("q_doc") =!= col("n_doc"))
      .select(col("q_doc"), col("n_doc")).distinct()
      .persist()
    val q = broadcast(querySide(qChunks, docCol, chunkCol, vecCol))
    // Stage-2 shape (guide §2.5/§6): the exact re-rank's cost is the
    // candidate×chunk² dot fan-out AFTER these joins, which is tens of
    // times the index bytes feeding it — but the stream side is a
    // compact staged-index scan (few input splits), so without help
    // the whole fan-out runs at file-split parallelism. Restrict the
    // index to candidate docs first (broadcast LEFT SEMI — at scale
    // this is also what keeps non-candidate chunks off the wire), then
    // spread THAT bounded frame across the session's cores with an
    // explicit-N repartition (explicit so AQE's size-based coalescing,
    // which only sees the exchange's small bytes and not the fan-out
    // behind it, cannot fold the stage back to one task). The exchange
    // moves candidate chunks exactly once; every downstream dot runs
    // at full parallelism. Row content is untouched, and both
    // aggregations in [[maxSimRank]] are order-free (quantized-decimal
    // sums), so the result is bit-identical.
    // Guarded (r17 verdict #3/#5): at production scale the staged index
    // scan already has ≥ cores splits and the repartition must be a
    // no-op — Graft.fanoutGauged skips it then, probing the raw index
    // scan (exchange-free) rather than this frame, whose broadcast
    // semi-join would otherwise be eagerly built during planning. The
    // key is n_doc: per-doc chunk counts are bounded by chunking
    // (window/stride), so no single doc can skew a partition.
    val c = graft.core.Graft.fanoutGauged(
      index.select(col(docCol).as("n_doc"),
          col(vecCol).as("n_vec"), col("nrm").as("n_nrm"))
        .filter(col("n_nrm") > 0)
        .join(broadcast(cand.select(col("n_doc")).distinct()),
          Seq("n_doc"), "left_semi"),
      index, col("n_doc"))
    maxSimRank(broadcast(cand).join(c, "n_doc").join(q, "q_doc"), k)
  }

  private def querySide(qChunks: DataFrame, docCol: String,
                        chunkCol: String, vecCol: String): DataFrame =
    qChunks.select(col(docCol).as("q_doc"), col(chunkCol).as("q_chunk"),
        col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_nrm"))
      .filter(col("q_nrm") > 0)

  /** Chunk pairs → ranked docs: max cosine per (q_doc, q_chunk,
    * n_doc), quantized-decimal sum per (q_doc, n_doc), top-k rank.
    * Both groupBys partial-aggregate; the window runs over the
    * candidate-sized frame only.
    */
  private def maxSimRank(pairs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cos: Column = dot(col("q_vec"), col("n_vec")) /
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
      .filter(col("rnk") <= k)
      .select(col("q_doc"), col("n_doc"), col("rnk"),
        (col("_sq").cast(DoubleType) / 1e12).as("score"))
  }
}

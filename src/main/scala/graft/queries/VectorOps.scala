package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Similarity

/** Similarity-search operators over `embeddings`: brute-force cosine
  * top-k (baseline), IVF-cell top-k (scale path), and embedding
  * near-dup pairs.
  */
object VectorOps {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** Deterministic small query set: every 50th vector. */
  private def querySet(e: DataFrame): DataFrame =
    e.filter(col("vec_id") % 50 === 0)

  /** The exact brute-force top-3 (q_id, n_id) truth over the standard
    * query set, STAGED (the d29/d30 eval-truth discipline,
    * `core/Artifacts`): v11/v14/v16/v21's recall denominators and all
    * four v25 sweep legs measure against this one table instead of
    * each cold run re-paying the |corpus| × |queries| scan — v25 alone
    * referenced it in four union legs, and Catalyst does not dedupe
    * common subplans across union branches, so the truth replayed per
    * leg. Integer columns only, so the parquet round-trip is exact.
    */
  private def knnTruthIdx(s: SparkSession, dir: String): DataFrame =
    graft.core.Artifacts.table(s,
      "knn-truth|k=3|q=50", graft.core.Artifacts.fingerprint(dir))({
      val e = emb(s, dir)
      Similarity.bruteForceKnn(e, querySet(e), k = 3)
        .select(col("q_id"), col("n_id"))
    })

  /** The corpus→cell assignment under the standard deterministic
    * centroids (first 8 vectors), staged for the same reason: the
    * assignment is the INDEX a deployment builds once at ingest
    * (`Similarity.assignCells`), and v25's four probe legs read it
    * rather than re-assigning the corpus per leg.
    */
  private def corpusCellsIdx(s: SparkSession, dir: String): DataFrame =
    graft.core.Artifacts.table(s,
      "ivf-cells|c=8", graft.core.Artifacts.fingerprint(dir))({
      val e = emb(s, dir)
      Similarity.assignCells(e, e.filter(col("vec_id") < 8))
        .select(col("vec_id").as("n_id"), col("cell").as("n_cell"))
    })

  /** The full code-carrying IVF-PQ index under the standard
    * deterministic centroids (first 8) and the v9 codebook (first 16,
    * 4×16), staged: this is the table `cellIndexStream` maintains and
    * a deployment serves — built once at ingest, read-only at query
    * time. Serving from parquet (not the build lineage) also keeps
    * the serve stage's codegen small: fusing the literal-centroid +
    * literal-codeword ingest projection into the probe join was
    * measured 2.7× slower than scanning the staged rows.
    */
  private def pqIndexIdx(s: SparkSession, dir: String): DataFrame =
    graft.core.Artifacts.table(s,
      "ivfpq-index|c=8|m=4|k=16", graft.core.Artifacts.fingerprint(dir))({
      val e = emb(s, dir)
      Similarity.indexCells(e, e.filter(col("vec_id") < 8),
        codebook = Some(Similarity.pqCodebook(e, m = 4, k = 16)))
    })

  /** The one-pass arrival-prefix per-cell occupancy grid behind v36
    * and v38: vectors "arrive" cell-clustered (the worst-case ingest
    * skew a drifted feed produces) and the grid holds the per-cell
    * population at each of 8 arrival prefixes — (p, cell, n_vec),
    * empty cells preserved. The global (cell, vec_id) arrival rank is
    * computed WITHOUT a global sort: per-cell windows (partitioned) +
    * a broadcast of cumulative cell-size offsets (a centroid-sized
    * frame) — identical rank values, but the corpus never funnels
    * through one partition. SINGLE corpus pass for all 8 prefixes:
    * each row's FIRST containing prefix is ceil(8·arr / n) (row ∈
    * prefix p iff arr ≤ (p·n) DIV 8 ⟺ p·n ≥ 8·arr), so one
    * (cell, bkt) count + a tiny cells×8 cumulative grid reproduce
    * every prefix's per-cell occupancy — the 8-leg union re-scanned
    * the index per prefix (measured 2.9 s vs 0.1 s DuckDB; this is
    * the honest one-aggregation shape).
    */
  private def prefixCellCounts(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = emb(s, dir)
    val cents = e.filter(col("vec_id") < 8)
    val idx = pqIndexIdx(s, dir).select(col("vec_id"), col("cell"))
    val offsets = idx.groupBy(col("cell"))
      .agg(count(lit(1)).as("csz"))
      .withColumn("off", coalesce(
        sum(col("csz")).over(Window.orderBy(col("cell"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("cell"), col("off"))
    val n = broadcast(idx.agg(count(lit(1)).as("n")))
    val bucketed = idx.join(broadcast(offsets), "cell")
      .withColumn("arr", col("off") + row_number().over(
        Window.partitionBy(col("cell")).orderBy(col("vec_id"))))
      .crossJoin(n)
      .groupBy(col("cell"),
        expr("(8 * arr + n - 1) DIV n").as("bkt"))
      .agg(count(lit(1)).as("c"))
    val ps = s.range(1, 9).select(col("id").as("p"))
    broadcast(cents.select(col("vec_id").as("cell")))
      .crossJoin(broadcast(ps))
      .join(bucketed.withColumnRenamed("cell", "bcell"),
        col("cell") === col("bcell") && col("bkt") <= col("p"),
        "left")
      .groupBy(col("p"), col("cell"))
      .agg(coalesce(sum(col("c")), lit(0L)).as("n_vec"))
  }

  /** The v25 sweep body, shared with v39's planner: for every nprobe
    * in the sweep, candidate volume (corpus rows a probe-config
    * actually scans) and recall of the probed cells against the exact
    * brute-force top-3 truth. ONE ranked probe set at the sweep's
    * max: probe_rank <= np IS the np-probe candidate set (a corpus
    * vector lives in exactly one cell and probe cells are distinct,
    * so a (q, n) candidate surfaces at exactly one rank). The whole
    * sweep is then one cell join + two conditional aggregates over it
    * — truth and cells served staged — instead of four
    * probe/join/count union legs each replaying the shared subplans
    * (Catalyst does not dedupe common subplans across union
    * branches).
    */
  private def nprobeSweep(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cents = e.filter(col("vec_id") < 8)
    val truth = knnTruthIdx(s, dir)
    val nTrue = broadcast(truth.agg(count(lit(1)).as("n_true")))
    val nps = Seq(1, 2, 4, 8)
    val cand = broadcast(
        Similarity.probeCellsRanked(querySet(e), cents, nprobe = nps.max)
          .select(col("q_id"), col("q_cell"), col("probe_rank")))
      .join(corpusCellsIdx(s, dir), col("q_cell") === col("n_cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), col("probe_rank"))
    def perNp(prefix: String) = nps.map(np =>
      coalesce(sum(when(col("probe_rank") <= np, 1L)), lit(0L))
        .as(s"$prefix$np"))
    val nCand = cand.agg(perNp("c").head, perNp("c").tail: _*)
    val nCaught = truth.join(cand, Seq("q_id", "n_id"))
      .agg(perNp("g").head, perNp("g").tail: _*)
    val stacked = nps.map(np => s"$np, c$np, g$np").mkString(", ")
    nCand.crossJoin(nCaught).crossJoin(nTrue)
      .select(expr(s"stack(${nps.size}, $stacked) AS " +
        "(nprobe, n_candidates, n_caught)"), col("n_true"))
      .select(col("nprobe"), col("n_candidates"), col("n_true"),
        col("n_caught"),
        when(col("n_true") > 0, col("n_caught").cast("double") /
          col("n_true").cast("double")).as("recall"))
  }

  /** The v30 index: pqIndexIdx + the `label` metadata column riding
    * each row — the filtered-ANN deployment shape. A serve-time
    * metadata predicate becomes `index.filter(...)`, which Parquet
    * pushes into the index scan (plan-pinned), instead of the
    * corpus-sized metadata join a label-blind index would force per
    * query batch.
    */
  private def pqMetaIndexIdx(s: SparkSession, dir: String): DataFrame =
    graft.core.Artifacts.table(s,
      "ivfpq-index-meta|c=8|m=4|k=16|label",
      graft.core.Artifacts.fingerprint(dir))({
      val e = emb(s, dir)
      Similarity.indexCells(e, e.filter(col("vec_id") < 8),
        codebook = Some(Similarity.pqCodebook(e, m = 4, k = 16)),
        carryCols = Seq("label"))
    })

  /** The deterministic mixed op feed behind v29 — the lifecycle a real
    * serving corpus sees (insert, then updates and deletes): every
    * vector INSERTs at seq 1; every 7th id UPDATEs at seq 2 to its
    * reversed vector (reversal moves floats without arithmetic, so the
    * oracle replays the exact bytes); every 11th id DELETEs at seq 3
    * (tombstone — vector null, the CDC delete shape). Latest state:
    * %11 ids absent, %7 ids reversed, the rest as inserted.
    */
  private def upsertFeed(e: DataFrame): DataFrame = {
    val vecType = e.schema("embedding").dataType
    e.select(col("vec_id"), col("embedding"),
        lit("insert").as("op"), lit(1L).as("seq"))
      .unionByName(e.filter(col("vec_id") % 7 === 0)
        .select(col("vec_id"), reverse(col("embedding")).as("embedding"),
          lit("update").as("op"), lit(2L).as("seq")))
      .unionByName(e.filter(col("vec_id") % 11 === 0)
        .select(col("vec_id"), lit(null).cast(vecType).as("embedding"),
          lit("delete").as("op"), lit(3L).as("seq")))
  }

  /** The v29 SERVE-READY index, staged (the pqIndexIdx discipline):
    * the mixed feed's changelog index resolved to its latest state —
    * updated ids carry the cell/codes of their seq-2 vector, deleted
    * ids are gone. These rows are exactly what
    * [[graft.streaming.ScoringStreaming.upsertCellIndexStream]]
    * maintains incrementally and
    * [[graft.streaming.ScoringStreaming.servedUpsertCellIndex]] reads,
    * so the v29 oracle row checks the upsert-serve path end to end.
    */
  private def upsertIndexIdx(s: SparkSession, dir: String): DataFrame =
    graft.core.Artifacts.table(s,
      "ivfpq-upsert-index|c=8|m=4|k=16|u7|d11",
      graft.core.Artifacts.fingerprint(dir))({
      val e = emb(s, dir)
      Similarity.latestIndexState(
        Similarity.indexChangelog(upsertFeed(e),
          e.filter(col("vec_id") < 8),
          codebook = Some(Similarity.pqCodebook(e, m = 4, k = 16))))
    })

  /** The post-fold TAIL behind v40 — the deliveries that arrive after
    * a [[graft.operators.Dedup.snapshotIndex]] fold of [[upsertFeed]]:
    * a LATE update for every deleted id (seq 2 < the fold's seq-3
    * tombstone — must stay dead, the row the fold keeps tombstones
    * FOR) and a genuine post-fold update for every 5th id at seq 4
    * (supersedes whatever the fold holds; for ids also deleted at
    * seq 3 this is a REVIVAL — max-struct resolve serves it live).
    * Reversal moves floats without arithmetic (the v29 discipline).
    */
  private def snapshotTail(e: DataFrame): DataFrame =
    e.filter(col("vec_id") % 11 === 0)
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"),
        lit("update").as("op"), lit(2L).as("seq"))
      .unionByName(e.filter(col("vec_id") % 5 === 0)
        .select(col("vec_id"), reverse(col("embedding")).as("embedding"),
          lit("update").as("op"), lit(4L).as("seq")))

  /** The v40 SERVE-READY index, staged: the [[upsertFeed]] changelog
    * FOLDED to its max-seq change rows (tombstones kept — the exact
    * algebra [[graft.operators.Dedup.snapshotIndex]] applies on disk,
    * whose crash-safe protocol `CellIndexStreamSpec` pins), unioned
    * with the post-fold tail, then resolved. Hash-equality against an
    * oracle that resolves the FULL unfolded log is the fold's
    * correctness claim: fold∘union∘resolve ≡ resolve — which breaks
    * if the fold drops tombstones (late sub-seq updates resurrect) or
    * resolves instead of folding (ditto).
    */
  private def snapshotIndexIdx(s: SparkSession, dir: String): DataFrame =
    graft.core.Artifacts.table(s,
      "ivfpq-snapshot-index|c=8|m=4|k=16|u7|d11|l11s2|u5s4",
      graft.core.Artifacts.fingerprint(dir))({
      val e = emb(s, dir)
      val cents = e.filter(col("vec_id") < 8)
      val cb = Some(Similarity.pqCodebook(e, m = 4, k = 16))
      Similarity.latestIndexState(
        Similarity.latestIndexChange(
            Similarity.indexChangelog(upsertFeed(e), cents, codebook = cb))
          .unionByName(
            Similarity.indexChangelog(snapshotTail(e), cents,
              codebook = cb)))
    })

  /** The v42 RELEASED index, staged: [[Similarity.releaseIndex]] over
    * the v29 changelog — the codebook retrained on the RESOLVED live
    * corpus (first-16 live ids: the %11 deletions shift the codeword
    * set, the %7 updates reverse two codewords) and every live row
    * re-encoded against it. The serve over this index against an
    * oracle whose cb CTE reads the resolved corpus is the release's
    * correctness claim end to end.
    */
  private def releasedIndexIdx(s: SparkSession, dir: String): DataFrame =
    graft.core.Artifacts.table(s,
      "ivfpq-released-index|c=8|m=4|k=16|u7|d11",
      graft.core.Artifacts.fingerprint(dir))({
      val e = emb(s, dir)
      val cents = e.filter(col("vec_id") < 8)
      Similarity.releaseIndex(
        Similarity.indexChangelog(upsertFeed(e), cents), cents,
        m = 4, k = 16)._1
    })

  /** The v29 changelog RESOLVED to its live rows (no codes), staged:
    * the training corpus of the v42 release. Before r18 the serve-side
    * codebook recollect ([[releasedCb]]) replayed the whole
    * changelog-resolve lineage (union feed → cell assign → max-struct)
    * on every run; the release's train-side resolve inside
    * [[releasedIndexIdx]]'s build is the same frame — stage it once
    * and both read a 16-row-scan-sized parquet (r17 verdict item 4).
    */
  private def upsertResolvedIdx(s: SparkSession, dir: String): DataFrame =
    graft.core.Artifacts.table(s,
      "ivfpq-upsert-resolved|c=8|u7|d11",
      graft.core.Artifacts.fingerprint(dir))({
      val e = emb(s, dir)
      Similarity.latestIndexState(
        Similarity.indexChangelog(upsertFeed(e),
          e.filter(col("vec_id") < 8)))
    })

  /** The released codebook, recollected from the STAGED resolved
    * corpus (a deterministic 16-row orderBy-limit collect —
    * [[Similarity.releaseIndex]]'s own training input, so it matches
    * the staged index's codes exactly).
    */
  private def releasedCb(s: SparkSession, dir: String)
      : Similarity.PqCodebook =
    Similarity.pqCodebook(upsertResolvedIdx(s, dir), m = 4, k = 16)

  /** recall@k counting: per query, how many of `truth`'s (q_id, n_id)
    * pairs `approx` reproduced. ONE implementation for every eval
    * (v11/v14/v16/v21 and v17's two-leg variant) — the denominator,
    * null handling, and tie semantics are contract, not per-eval
    * detail.
    */
  private def recallAgainst(truth: DataFrame, approx: DataFrame,
                            k: Int): DataFrame =
    truth.select(col("q_id"), col("n_id"))
      .join(approx.select(col("q_id"), col("n_id"), lit(1L).as("hit")),
        Seq("q_id", "n_id"), "left")
      .groupBy(col("q_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hit_ct"))
      .select(col("q_id"), col("hit_ct"),
        (col("hit_ct").cast("double") / lit(k.toDouble)).as("recall"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v1_knn_brute" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.bruteForceKnn(e, querySet(e), k = 3)
    },

    // MMR-diversified retrieval: exact top-8 candidates, then the
    // unrolled greedy λ·rel − (1−λ)·max-sim-to-selected pick of 3 —
    // near-duplicate hits can't crowd a result list (the RAG-context
    // diversifier; retrieval-side complement of v10's semantic dedup)
    "v23_mmr_diverse" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.mmrSelect(e, querySet(e), n = 8, k = 3, lambda = 0.7)
    },

    // centroid-similarity quality gate (the DataComp CLIP-score
    // filtering shape): label-0 rows play the trusted seed set, the
    // corpus is scored by cosine to their pooled centroid; tau = 0.1
    // keeps 139/500 at sf0.01, so both verdict branches carry signal
    "v24_embed_quality" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.centroidQuality(e, e.filter(col("label") === 0),
        dims = 64, tau = 0.1)
    },

    // metadata-constrained kNN: candidates restricted to even labels
    // BEFORE ranking, so each query gets exactly k admissible matches
    // (post-filtering a plain top-k returns < k — the filtered-ANN
    // pitfall the operator exists to prevent)
    "v22_filtered_knn" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.filteredKnn(e, querySet(e), col("label") % 2 === 0, k = 3)
    },

    "v2_knn_ivf" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.ivfKnn(e, querySet(e), k = 3)
    },

    "v4_knn_lsh" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.lshKnn(e, querySet(e), k = 3)
    },

    // deterministic seed centroids: the first 8 vectors (a production
    // run would seed via k-means||; the assignment pass is identical)
    "v5_cell_assign" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.assignCells(e, e.filter(col("vec_id") < 8))
    },

    // threshold 0.3: the synthetic embeddings have no true near-dups
    // (max within-label cosine ≈ 0.47), so a production-style 0.9 gate
    // would be vacuous; 0.3 keeps the verification pass non-empty.
    "v3_embedding_neardup" -> { (s, dir) =>
      Similarity.nearDupPairs(emb(s, dir), threshold = 0.3)
    },

    // semantic dedup GROUPS: connected components over the v3 cosine
    // near-dup graph — SemDeDup (v10) keeps one doc per PAIR decision;
    // this labels whole transitive families (the d6 shape on the
    // embedding side), the unit a curation pipeline samples from
    "v19_embed_clusters" -> { (s, dir) =>
      graft.operators.Dedup.clusterIds(
        Similarity.nearDupPairs(emb(s, dir), threshold = 0.3),
        aCol = "vec_a", bCol = "vec_b")
        .select(col("doc_id").as("vec_id"), col("cluster_id"))
    },

    // iters=1 keeps the DuckDB oracle small (one argmax + one mean
    // update, mirrored CTE by CTE — see sqlKmeans); v8 pins a second
    // iteration, and monotonicity / partition-independence are pinned
    // in KmeansSpec
    "v6_kmeans_train" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.assignModel(e, Similarity.trainKmeans(e, k = 8, iters = 1))
    },

    // two Lloyd's rounds: the oracle replays assignment → mean update
    // twice, catching update-step bugs a single-iteration oracle can't
    "v8_kmeans_iter2" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.assignModel(e, Similarity.trainKmeans(e, k = 8, iters = 2))
    },

    "v7_knn_sq8" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.sqKnn(e, querySet(e), k = 3)
    },

    // seed codebook = first 16 vectors (deterministic, like v5's
    // centroids); 4 subspaces × 16 codewords over 64 dims
    "v9_knn_pq" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.pqKnn(e, querySet(e),
        Similarity.pqCodebook(e, m = 4, k = 16), k = 3)
    },

    // SemDeDup over the v6 clustering; threshold 0.3 for the same
    // reason as v3 — the synthetic corpus has no 0.9-cosine twins
    "v10_semdedup" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.semDedup(e, Similarity.trainKmeans(e, k = 8, iters = 1),
        threshold = 0.3)
    },

    // IVF-PQ composition (FAISS IVFPQ shape): coarse cell prunes the
    // candidate set, PQ/ADC scores what's left — same codebook as v9,
    // same cell column as v2
    "v12_knn_ivfpq" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.pqKnn(e, querySet(e),
        Similarity.pqCodebook(e, m = 4, k = 16), k = 3,
        cellCol = Some("label"))
    },

    // multiprobe IVF (nprobe=2): boundary queries recover neighbors
    // from the runner-up cell; centroids = first 8 vectors (v5's
    // deterministic seed convention)
    "v15_knn_multiprobe" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.ivfMultiprobeKnn(e, querySet(e),
        e.filter(col("vec_id") < 8), k = 3, nprobe = 2)
    },

    // contrastive hard negatives: highest-cosine WRONG-label corpus
    // vectors per query — training-pair mining for embedding models
    "v13_hard_negatives" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.hardNegatives(e, querySet(e), k = 3)
    },

    // Matryoshka-style eval: recall@3 of first-16-dims search against
    // full-64-dim exact search — how much ranking the truncated
    // representation preserves
    "v14_mrl_recall" -> { (s, dir) =>
      val e = emb(s, dir)
      val lo = e.select(col("vec_id"), col("label"),
        slice(col("embedding"), 1, 16).as("embedding"))
      val trunc = Similarity.bruteForceKnn(lo, querySet(lo), k = 3)
      recallAgainst(knnTruthIdx(s, dir), trunc, k = 3)
    },

    // recall@3 of int8-quantized exhaustive search vs float exact —
    // the quantization-quality eval (completes the family: v11 IVF,
    // v14 truncation, v16 quantization)
    "v16_sq8_recall" -> { (s, dir) =>
      val e = emb(s, dir)
      val sq = Similarity.sqKnn(e, querySet(e), k = 3)
      recallAgainst(knnTruthIdx(s, dir), sq, k = 3)
    },

    // seed-vs-Lloyd's-refined PQ codebook recall, side by side against
    // exact brute force: the training-quality eval for the PQ index
    // (one refinement round keeps the oracle one CTE chain; PqSpec
    // pins MSE monotonicity and partition independence across rounds).
    // recall@10, not @3: on this corpus one round lifts mean recall@10
    // 0.12 → 0.21, while @3 is chance-limited and can't separate the
    // codebooks
    "v17_pq_refined_recall" -> { (s, dir) =>
      val e = emb(s, dir)
      val brute = Similarity.bruteForceKnn(e, querySet(e), k = 10)
      val seed = Similarity.pqKnn(e, querySet(e),
        Similarity.pqCodebook(e, m = 4, k = 16), k = 10)
      val refined = Similarity.pqKnn(e, querySet(e),
        Similarity.pqCodebookRefined(e, m = 4, k = 16, iters = 1), k = 10)
      brute.select(col("q_id"), col("n_id"))
        .join(seed.select(col("q_id"), col("n_id"), lit(1L).as("s_hit")),
          Seq("q_id", "n_id"), "left")
        .join(refined.select(col("q_id"), col("n_id"), lit(1L).as("r_hit")),
          Seq("q_id", "n_id"), "left")
        .groupBy(col("q_id"))
        .agg(sum(coalesce(col("s_hit"), lit(0L))).as("seed_hits"),
          sum(coalesce(col("r_hit"), lit(0L))).as("refined_hits"))
        .select(col("q_id"), col("seed_hits"), col("refined_hits"),
          (col("seed_hits").cast("double") / lit(10.0)).as("seed_recall"),
          (col("refined_hits").cast("double") / lit(10.0)).as("refined_recall"))
    },

    // chunk→doc mean pooling, surfaced as scalar (label, pos, m) rows
    // — the pre-array half of Similarity.meanPool, so every output
    // column is atomic and row-checkable; library callers wanting the
    // pooled vector use Similarity.meanPool, which rebuilds the array
    // from exactly these rows
    "v18_mean_pool" -> { (s, dir) =>
      Similarity.meanPoolRows(emb(s, dir), "label", dims = 64)
    },

    // binary quantization: 64 floats → one sign-bit long; Hamming
    // top-10 scan (bit_count(xor), 8-byte payload) reranked by exact
    // cosine to top-3 — the memory-bound ANN shape
    "v20_hamming_knn" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.hammingKnn(e, querySet(e), k = 3, rerank = 10)
    },

    // recall@3 of the binary-quantized path vs exact brute force —
    // completes the quantization-eval family (v11 IVF, v16 SQ8,
    // v17 PQ): how much the 32× compression costs at this rerank depth
    "v21_hamming_recall" -> { (s, dir) =>
      val e = emb(s, dir)
      val ham = Similarity.hammingKnn(e, querySet(e), k = 3, rerank = 10)
      recallAgainst(knnTruthIdx(s, dir), ham, k = 3)
    },

    // recall@3 of the IVF probe-1 path against exact brute force —
    // the eval harness any ANN deployment ships with
    "v11_ann_recall" -> { (s, dir) =>
      val e = emb(s, dir)
      val ivf = Similarity.ivfKnn(e, querySet(e), k = 3)
      recallAgainst(knnTruthIdx(s, dir), ivf, k = 3)
    },

    // the IVF family's measured sweep (the d29/d30 discipline on the
    // third candidate-generation family): for every nprobe, candidate
    // volume (corpus rows a probe-config actually scans) and recall of
    // the probed cells against the exact brute-force top-3 truth —
    // nprobe = |centroids| probes every cell, so its recall row must
    // read 1.0 and its candidate count prices exhaustive search;
    // the table a deployment reads to pick its probe count
    "v25_ivf_nprobe_sweep" -> { (s, dir) => nprobeSweep(s, dir) },

    // the sweep turned into a DECISION (closing the measured-planning
    // loop the d29/d30/v25/v28 tables open): per config the recall
    // verdict against a 0.9 target, the scan fraction relative to the
    // exhaustive probe (the price column), and the chosen plan — the
    // MINIMUM nprobe meeting the target, falling back to the
    // exhaustive probe when none does. What a deployment reads off
    // the v25 table by hand, as a query
    "v39_nprobe_plan" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy()
      val meets = col("recall") >= 0.9
      nprobeSweep(s, dir)
        .withColumn("meets", meets)
        .withColumn("chosen", col("nprobe") === coalesce(
          min(when(meets, col("nprobe"))).over(w),
          max(col("nprobe")).over(w)))
        .withColumn("scan_frac",
          when(max(col("n_candidates")).over(w) > 0,
            col("n_candidates").cast("double") /
              max(col("n_candidates")).over(w).cast("double")))
        .select(col("nprobe"), col("n_candidates"), col("n_true"),
          col("n_caught"), col("recall"), col("meets"), col("chosen"),
          col("scan_frac"))
    },

    // the full IVF-PQ SERVE (the FAISS IVFPQ deployment shape) as one
    // oracle-checked query: coarse cells from the v15 centroid
    // convention (first 8 vectors, nprobe = 2), PQ codes from the v9
    // codebook (first 16 vectors, 4×16). The index is SERVED STAGED
    // (the d30/v25 artifact discipline) — its rows are exactly what
    // cellIndexStream maintains incrementally, so this query
    // oracle-checks the serve path of the maintained index end to
    // end: coarse quantizer prunes via the probe-cell equi-join,
    // product quantizer scores via per-query ADC tables, raw corpus
    // vectors untouched at serve time
    "v26_ivfpq_serve" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.pqScoreCodesIndexed(
        pqIndexIdx(s, dir), querySet(e), e.filter(col("vec_id") < 8),
        Similarity.pqCodebook(e, m = 4, k = 16), k = 3, nprobe = 2)
    },

    // the PQ family's measured planning table (the d29/d30/v25
    // discipline on the fourth tunable family): for every (m, k)
    // codebook shape, recall@3 of the ADC search against the staged
    // brute truth next to its bytes/vector — the compression-vs-
    // recall table a deployment reads to size its product quantizer.
    // m sweeps the byte budget at fixed k; the (4, 8) leg prices a
    // halved codebook at the standard budget
    "v28_pq_sweep" -> { (s, dir) =>
      val e = emb(s, dir)
      val truth = knnTruthIdx(s, dir)
      val nTrue = broadcast(truth.agg(count(lit(1)).as("n_true")))
      Seq((2, 16), (4, 8), (4, 16), (8, 16)).map { case (m, kc) =>
        val approx = Similarity.pqKnn(e, querySet(e),
            Similarity.pqCodebook(e, m = m, k = kc), k = 3)
          .select(col("q_id"), col("n_id"))
        truth.join(approx, Seq("q_id", "n_id"))
          .agg(count(lit(1)).as("n_caught"))
          .crossJoin(nTrue)
          .select(lit(m).as("m"), lit(kc).as("k_codewords"),
            lit(m).as("bytes_per_vec"), col("n_true"), col("n_caught"),
            when(col("n_true") > 0, col("n_caught").cast("double") /
              col("n_true").cast("double")).as("recall"))
      }.reduce(_.unionByName(_))
    },

    // ranked-retrieval quality of the v26 IVF-PQ serve against the
    // staged brute-force truth: MRR@3 + binary-relevance NDCG@3 per
    // query — the per-release eval a serving deployment reads next
    // to the v25 candidate-volume sweep (recall says WHETHER the
    // truth surfaced; MRR/NDCG say WHERE it ranked)
    "v27_retrieval_eval" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.retrievalEval(knnTruthIdx(s, dir),
        Similarity.pqScoreCodesIndexed(pqIndexIdx(s, dir), querySet(e),
          e.filter(col("vec_id") < 8),
          Similarity.pqCodebook(e, m = 4, k = 16), k = 3, nprobe = 2),
        k = 3)
    },

    // the v26 serve AFTER index maintenance under update/delete: the
    // mixed feed (insert/update/delete per id) flows through the
    // changelog index builder, resolves to its latest state (updated
    // vectors re-indexed, tombstoned ids excluded), and serves the
    // same frozen centroid generation + codebook as v26 — the
    // full lifecycle of a maintained ANN index as one oracle row.
    // Centroids and codebook stay the ORIGINAL model artifacts (a
    // retrain is a separate generation-swap event); only the indexed
    // corpus moved.
    "v29_index_upsert_serve" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.pqScoreCodesIndexed(upsertIndexIdx(s, dir),
        querySet(e), e.filter(col("vec_id") < 8),
        Similarity.pqCodebook(e, m = 4, k = 16), k = 3, nprobe = 2)
    },

    // the v29 serve ACROSS a snapshot fold: the changelog is folded
    // to max-seq change rows (tombstones kept — Dedup.snapshotIndex's
    // algebra), the post-fold tail carries a late SUB-seq update per
    // deleted id (must stay dead: only the kept tombstone outranks
    // it) and a post-fold seq-4 update per 5th id (supersedes; for
    // %55 ids a genuine revival after delete). The oracle resolves
    // the FULL unfolded log — hash equality IS fold∘resolve ≡ resolve
    "v40_snapshot_fold" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.pqScoreCodesIndexed(snapshotIndexIdx(s, dir),
        querySet(e), e.filter(col("vec_id") < 8),
        Similarity.pqCodebook(e, m = 4, k = 16), k = 3, nprobe = 2)
    },

    // the codebook RELEASE (the lifecycle event the maintenance loops
    // defer — coarse centroids retrain in-stream, the PQ codebook
    // stays frozen so stored codes keep their meaning): resolve the
    // v29 changelog to its live state, retrain the codebook on THAT
    // corpus (deleted ids must not train codewords; updated ids train
    // with their current bytes), re-encode every live row, serve.
    // The oracle's cb CTE reads the resolved corpus too — codeword
    // set and bytes both moved vs v29's frozen codebook
    "v42_codebook_release" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.pqScoreCodesIndexed(releasedIndexIdx(s, dir),
        querySet(e), e.filter(col("vec_id") < 8),
        releasedCb(s, dir), k = 3, nprobe = 2)
    },

    // FILTERED serving over the staged index — "nearest neighbors
    // WHERE label is even" with the predicate applied BEFORE ranking
    // (v22's pre-filter contract) and, because the metadata rides the
    // index rows (carryCols at ingest), the filter lands IN the index
    // parquet scan (PushedFilters, plan-pinned) — no corpus-sized
    // metadata join at serve time. Every query still gets exactly k
    // admissible candidates from its probed cells.
    "v30_filtered_serve" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.pqScoreCodesIndexed(
        pqMetaIndexIdx(s, dir).filter(col("label") % 2 === 0),
        querySet(e), e.filter(col("vec_id") < 8),
        Similarity.pqCodebook(e, m = 4, k = 16), k = 3, nprobe = 2)
    },

    // text → vector → ANN with no external embedding model: documents
    // hash-embed map-side (the feature-hashing trick), the index is
    // STAGED cell-partitioned (serve-time probe joins prune whole cell
    // directories via dynamic partition pruning — the 100 TB index
    // layout, spec-pinned in HashEmbedSpec), queries and centroids
    // re-embed inline (map-side, query-batch-sized after pushdown)
    "v31_hashembed_knn" -> { (s, dir) =>
      val he = hashEmbeds(s, dir)
      Similarity.ivfMultiprobeKnnIndexed(hashEmbedIdx(s, dir),
        he.filter(col("doc_id") % 50 === 0),
        he.filter(col("doc_id") < 8), k = 3, nprobe = 2,
        idCol = "doc_id")
    },

    // residual IVF-PQ — FAISS's actual IVFPQ: codes quantize
    // (vector − coarse centroid); the serve builds one ADC table per
    // (query, probe cell) from the query's residual against THAT
    // cell. Index staged cell-partitioned like the raw-space v26
    "v33_residual_pq_serve" -> { (s, dir) =>
      val e = emb(s, dir)
      val cents = e.filter(col("vec_id") < 8)
      Similarity.pqScoreCodesIndexedResidual(
        residualPqIdx(s, dir), querySet(e), cents,
        Similarity.pqCodebookResidual(e, cents, m = 4, k = 16),
        k = 3, nprobe = 2)
    },

    // index health over the staged v26 serving index: per-centroid
    // population (empty cells included — the retrain signal) + the
    // index-wide imbalance factor on every row
    "v35_index_stats" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.indexStats(pqIndexIdx(s, dir),
        e.filter(col("vec_id") < 8))
    },

    // the retrain TRIGGER replayed as a batch audit: vectors "arrive"
    // cell-clustered (ORDER BY cell — the worst-case ingest skew a
    // drifted feed produces), and at each of 8 arrival prefixes the
    // v35 stats recompute plus the trigger decision
    // (imbalance > 2.0) and the first-crossing prefix — the exact
    // metric `ScoringStreaming.cellIndexStreamWithRetrain` evaluates
    // per micro-batch (spec-pinned behaviorally in
    // CellIndexStreamSpec; this row pins the numbers). The global
    // rank is the SIMULATION's device — the production loop never
    // sorts the corpus, it reads the maintained dir's stats
    "v36_retrain_trigger" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      prefixCellCounts(s, dir).groupBy(col("p"))
        .agg(sum(col("n_vec")).as("n_total"),
          count(lit(1)).as("n_cells"),
          sum(when(col("n_vec") > 0, 1L).otherwise(0L))
            .as("n_occupied"),
          max(col("n_vec")).as("max_cell"))
        .select(col("p").as("prefix_i"), col("n_total"),
          col("n_occupied"),
          (col("max_cell").cast("double") * col("n_cells").cast("double") /
            nullif(col("n_total").cast("double"), lit(0.0)))
            .as("imbalance"))
        .withColumn("fired", col("imbalance") > 2.0)
        .withColumn("fires_at",
          min(when(col("fired"), col("prefix_i")))
            .over(Window.partitionBy()))
    },

    // the GROWTH-POLICY table (the v36 discipline on the second
    // trigger): at each arrival prefix, occupancy NEXT TO imbalance,
    // both trigger verdicts (occupancy > 32 plays the maxOccupancy
    // bar — both branches carry signal at sf0.01), and the k ∝ √N
    // rule's answer with the occupancy it would restore — exactly
    // what `cellIndexStreamWithRetrain(maxOccupancy=…)` +
    // `Similarity.growthRetrain()` evaluate per micro-batch
    // (spec-pinned behaviorally in CellIndexStreamSpec; this row
    // pins the numbers)
    "v38_growth_policy" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      prefixCellCounts(s, dir).groupBy(col("p"))
        .agg(sum(col("n_vec")).as("n_total"),
          count(lit(1)).as("n_cells"),
          sum(when(col("n_vec") > 0, 1L).otherwise(0L))
            .as("n_occupied"),
          max(col("n_vec")).as("max_cell"))
        .select(col("p").as("prefix_i"), col("n_total"),
          col("n_cells"), col("n_occupied"),
          (col("n_total").cast("double") /
            nullif(col("n_cells").cast("double"), lit(0.0)))
            .as("occupancy"),
          (col("max_cell").cast("double") * col("n_cells").cast("double") /
            nullif(col("n_total").cast("double"), lit(0.0)))
            .as("imbalance"))
        .withColumn("fired_imb", col("imbalance") > 2.0)
        .withColumn("fired_occ", col("occupancy") > 32.0)
        .withColumn("fired", col("fired_imb") || col("fired_occ"))
        .withColumn("k_next",
          when(col("fired"), greatest(lit(2L),
            ceil(sqrt(col("n_total").cast("double")))))
            .otherwise(col("n_cells")))
        .withColumn("occ_after",
          col("n_total").cast("double") /
            nullif(col("k_next").cast("double"), lit(0.0)))
        .withColumn("fires_at",
          min(when(col("fired"), col("prefix_i")))
            .over(Window.partitionBy()))
    },

    // the SNAPSHOT-POLICY table (the v36/v38 trigger discipline
    // applied to storage maintenance): at each arrival prefix of the
    // v29/v40 changelog (inserts, %7 updates, %11 deletes, then the
    // post-fold tail), the DEPTH metric Dedup.snapshotIfDeep
    // evaluates — change rows per distinct id, the resolve
    // amplification every serve pays — the fired verdict against the
    // 1.2 bar (prefixes 1–2 under, 3–4 over: both branches carry
    // signal), and fold_saves, the rows a snapshot would delete
    "v41_snapshot_policy" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val e = emb(s, dir)
      val feed = upsertFeed(e)
        .withColumn("b", col("seq").cast("int"))
        .unionByName(snapshotTail(e).withColumn("b", lit(4)))
        .select(col("vec_id"), col("b"))
      val pfx = s.range(1, 5).select(col("id").as("prefix_i"))
      feed.join(pfx, col("b") <= col("prefix_i"))
        .groupBy(col("prefix_i"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("vec_id")).as("n_keys"))
        .withColumn("depth",
          col("n_rows").cast("double") /
            nullif(col("n_keys").cast("double"), lit(0.0)))
        .withColumn("fired", col("depth") > 1.2)
        .withColumn("fold_saves",
          when(col("fired"), col("n_rows") - col("n_keys"))
            .otherwise(lit(0L)))
        .withColumn("fires_at",
          min(when(col("fired"), col("prefix_i")))
            .over(Window.partitionBy()))
    },

    // margin-based bitext mining (Artetxe & Schwenk: the LASER/
    // CCMatrix criterion): even/odd vec_ids play the two language
    // sides; per sampled x its best y, the ratio margin over both
    // directions' quantized-decimal k-NN neighborhood sums, and the
    // mutual-best flag — the parallel-corpus miner's scoring row
    "v37_bitext_margin" -> { (s, dir) =>
      val e = emb(s, dir)
      val xs = e.filter(col("vec_id") % 2 === 0)
      val ys = e.filter(col("vec_id") % 2 === 1)
      graft.operators.Bitext.marginPairs(xs, ys,
        xs.filter(col("vec_id") % 50 === 0), k = 4)
    },

    // the planning row for the residual encoding: recall@3 of the
    // raw-space serve (v26's index) vs the residual serve (v33's)
    // against the ONE staged brute truth — same (m, k), same
    // centroids, same probe budget; the measured version of
    // ResidualPqSpec's distortion claim
    "v34_residual_recall" -> { (s, dir) =>
      val e = emb(s, dir)
      val cents = e.filter(col("vec_id") < 8)
      val truth = knnTruthIdx(s, dir)
      val nTrue = broadcast(truth.agg(count(lit(1)).as("n_true")))
      def recallOf(serve: DataFrame, name: String) =
        truth.join(serve.select(col("q_id"), col("n_id")),
            Seq("q_id", "n_id"))
          .agg(count(lit(1)).as("hits"))
          .crossJoin(nTrue)
          .select(lit(name).as("variant"), col("hits"), col("n_true"),
            (col("hits").cast("double") / col("n_true").cast("double"))
              .as("recall"))
      recallOf(Similarity.pqScoreCodesIndexed(pqIndexIdx(s, dir),
          querySet(e), cents, Similarity.pqCodebook(e, m = 4, k = 16),
          k = 3, nprobe = 2), "raw")
        .unionByName(recallOf(Similarity.pqScoreCodesIndexedResidual(
          residualPqIdx(s, dir), querySet(e), cents,
          Similarity.pqCodebookResidual(e, cents, m = 4, k = 16),
          k = 3, nprobe = 2), "residual"))
    },

    // ColBERT-style late interaction over hash-embedded CHUNKS: the
    // two-stage serve — chunk-level probe join against the staged
    // chunk index generates candidate docs, exact MaxSim (quantized-
    // decimal sums, ties → doc id) re-ranks only the candidates
    "v32_maxsim_rerank" -> { (s, dir) =>
      val ce = chunkEmbeds(s, dir)
      graft.operators.LateInteraction.maxSimTopKIndexed(
        ce.filter(col("doc_id") % 50 === 0), maxSimIdx(s, dir),
        ce.filter(col("chunk_idx") === 0 && col("doc_id") < 8),
        k = 3, nprobe = 2)
    },

    // the v32 serve under DOC-level index maintenance: the chunk
    // changelog's unit of change is the document (an edit replaces
    // the doc's WHOLE chunk set — here shrinking %7 docs to their
    // even-index chunks with reversed embeddings; %11 docs tombstone
    // at doc level), resolved by the set-valued latestChunkState
    // (max-seq per doc keeps ALL that version's rows). Queries stay
    // the raw corpus' chunks — they are external text, not index
    // rows. The oracle serves the identically-resolved live set
    "v43_chunk_upsert_serve" -> { (s, dir) =>
      val ce = chunkEmbeds(s, dir)
      graft.operators.LateInteraction.maxSimTopKIndexed(
        ce.filter(col("doc_id") % 50 === 0), maxSimUpsertIdx(s, dir),
        ce.filter(col("chunk_idx") === 0 && col("doc_id") < 8),
        k = 3, nprobe = 2)
    })

  /** Hash-embedded documents (dims = 64), zero-norm docs excluded —
    * the text→vector bridge behind v31 ([[Similarity.hashEmbed]]):
    * one map-side projection, no vocabulary, no model artifact. The
    * empty-doc filter alone would NOT keep every norm positive (a
    * non-empty doc can sign-cancel to the zero vector — the same case
    * [[chunkEmbeds]] guards), so the explicit norm > 0 filter is what
    * makes every cosine non-null and the ranking total on both
    * engines; the v31 oracle mirrors it with `WHERE nrm > 0`.
    */
  private def hashEmbeds(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    Similarity.hashEmbed(
      d.filter(size(graft.functions.TextFunctions
        .tokenize(lower(col("text")))) > 0),
      dims = 64)
      .filter(Similarity.norm(col("embedding")) > 0)
  }

  /** The staged hash-embed ANN index, directory-partitioned on `cell`
    * (`Artifacts.table(partitionCols)`): at serve time the broadcast
    * probe side doubles as a dynamic partition filter, so a query
    * batch reads its nprobe×|Q| cells of the index instead of
    * scanning it — the layout lever a 100 TB serving index ships
    * with. The layout rides the logicalId, so switching it rebuilds
    * rather than serving the flat artifact.
    */
  private def hashEmbedIdx(s: SparkSession, dir: String): DataFrame =
    graft.core.Artifacts.table(s,
      "hashembed-index|dims=64|c=8|nrm>0|layout=cell",
      graft.core.Artifacts.fingerprint(dir),
      partitionCols = Seq("cell"))({
      val he = hashEmbeds(s, dir)
      Similarity.indexCells(he, he.filter(col("doc_id") < 8),
        idCol = "doc_id")
    })

  /** Hash-embedded 16/16 sliding chunks (v32's unit of retrieval):
    * chunk_uid = doc_id·10⁶ + chunk_idx keys the chunk everywhere a
    * single id column is needed; zero-norm chunks (sign-cancelled
    * embeds) are filtered here so no cosine is ever null.
    */
  private def chunkEmbeds(s: SparkSession, dir: String): DataFrame = {
    val ch = graft.operators.Chunking.slidingChunks(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        window = 16, stride = 16)
      .withColumn("chunk_uid",
        col("doc_id") * 1000000L + col("chunk_idx"))
    Similarity.hashEmbed(ch, dims = 64, idCol = "chunk_uid",
        textCol = "chunk_text", carryCols = Seq("doc_id", "chunk_idx"))
      .filter(Similarity.norm(col("embedding")) > 0)
  }

  /** The staged residual-encoded IVF-PQ index behind v33 (same
    * centroid generation and (m, k) as the raw-space v26 index; the
    * encoding SPACE rides the logicalId — serving residual codes
    * through a raw-space ADC is a version skew, not a fallback).
    */
  private def residualPqIdx(s: SparkSession, dir: String): DataFrame =
    graft.core.Artifacts.table(s,
      "ivfpq-residual-index|c=8|m=4|k=16|layout=cell",
      graft.core.Artifacts.fingerprint(dir),
      partitionCols = Seq("cell"))({
      val e = emb(s, dir)
      val cents = e.filter(col("vec_id") < 8)
      Similarity.indexCellsResidual(e, cents,
        Similarity.pqCodebookResidual(e, cents, m = 4, k = 16))
    })

  /** The staged chunk-level ANN index behind v32, cell-partitioned
    * like [[hashEmbedIdx]]; centroids = the first chunk of the first
    * 8 docs (deterministic, oracle-replayable).
    */
  private def maxSimIdx(s: SparkSession, dir: String): DataFrame =
    graft.core.Artifacts.table(s,
      "maxsim-chunk-index|w=16|s=16|dims=64|c=8|layout=cell",
      graft.core.Artifacts.fingerprint(dir),
      partitionCols = Seq("cell"))({
      val ce = chunkEmbeds(s, dir)
      Similarity.indexCells(ce,
        ce.filter(col("chunk_idx") === 0 && col("doc_id") < 8),
        idCol = "chunk_uid", carryCols = Seq("doc_id"))
    })

  /** The v43 DOC-level chunk changelog — the unit of change is the
    * document, the unit of storage the chunk: every doc INSERTs its
    * full chunk set at seq 1; every 7th doc UPDATEs at seq 2 to a
    * SMALLER set (its even-index chunks, embeddings reversed — an
    * edit that shrinks the doc, so the resolve must drop odd chunks
    * it is never told about by name); every 11th doc DELETEs at
    * seq 3 with ONE doc-level tombstone row.
    */
  private def chunkFeed(ce: DataFrame): DataFrame =
    ce.select(col("doc_id"), col("embedding"),
        lit("insert").as("op"), lit(1L).as("seq"),
        col("chunk_uid"), col("chunk_idx"))
      .unionByName(ce
        .filter(col("doc_id") % 7 === 0 && col("chunk_idx") % 2 === 0)
        .select(col("doc_id"), reverse(col("embedding")).as("embedding"),
          lit("update").as("op"), lit(2L).as("seq"),
          col("chunk_uid"), col("chunk_idx")))
      .unionByName(ce.filter(col("doc_id") % 11 === 0)
        .select(col("doc_id")).distinct()
        .select(col("doc_id"),
          lit(null).cast(ce.schema("embedding").dataType)
            .as("embedding"),
          lit("delete").as("op"), lit(3L).as("seq"),
          lit(null).cast(ce.schema("chunk_uid").dataType)
            .as("chunk_uid"),
          lit(null).cast(ce.schema("chunk_idx").dataType)
            .as("chunk_idx")))

  /** The v43 SERVE-READY chunk index, staged: [[chunkFeed]] through
    * [[Similarity.indexChangelog]] (idCol = doc_id so the tombstone
    * is doc-level; chunk identity rides carryCols; centroids keyed by
    * chunk_uid so cells match the serve-time probe), resolved by the
    * SET-VALUED [[Similarity.latestChunkState]]. Exactly what a
    * stream-maintained ColBERT index resolves to under doc edits.
    */
  private def maxSimUpsertIdx(s: SparkSession, dir: String): DataFrame =
    // cell-partitioned like [[maxSimIdx]] (r18): the serve's probe-cell
    // equi-join prunes whole cell directories via dynamic partition
    // pruning — the flat layout scanned every cell per query batch.
    // Layout rides the logicalId, so this re-stages rather than
    // serving the old flat artifact.
    graft.core.Artifacts.table(s,
      "maxsim-chunk-upsert-index|w=16|s=16|dims=64|c=8|u7even|d11|layout=cell",
      graft.core.Artifacts.fingerprint(dir),
      partitionCols = Seq("cell"))({
      val ce = chunkEmbeds(s, dir)
      Similarity.latestChunkState(
        Similarity.indexChangelog(chunkFeed(ce),
          ce.filter(col("chunk_idx") === 0 && col("doc_id") < 8)
            .select(col("chunk_uid").as("doc_id"), col("embedding")),
          idCol = "doc_id",
          carryCols = Seq("chunk_uid", "chunk_idx")))
    })

  /** SQL mirror of Similarity.dot: strict left fold over the zipped
    * product list, double precision — bit-identical to Spark's
    * `aggregate(zip_with(...))`.
    */
  private[queries] def sqlDot(a: String, b: String): String =
    s"""list_reduce(
       |  list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(list_zip($a, $b),
       |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),
       |  (acc, v) -> acc + v)""".stripMargin

  private[queries] def sqlCos(qa: String, qb: String, na: String, nb: String): String =
    s"${sqlDot(qa, qb)} / nullif($na * $nb, 0.0)"

  /** (vec_id, label, embedding, nrm) base CTE over an arbitrary
    * embedding expression — `embedding[1:16]` gives the truncated-
    * dimension (MRL) variant, same folds, same bit-exactness.
    */
  private def sqlWithNormOn(vec: String): String =
    s"""SELECT vec_id, label, $vec AS embedding,
       | sqrt(${sqlDot(vec, vec)}) AS nrm
       |FROM embeddings""".stripMargin

  private val sqlWithNorm = sqlWithNormOn("embedding")

  /** The v25 sweep oracle, shared with v39's planner wrapper. */
  private lazy val sqlNprobeSweep: String = {
    val configs = Seq(1, 2, 4, 8)
    def cand(np: Int) =
      s"""cand$np AS (
         |  SELECT p.vec_id AS q_id, a.n_id
         |  FROM rk p JOIN asg a ON a.cell = p.cell
         |  WHERE p.rnk <= $np AND p.vec_id % 50 = 0
         |    AND a.n_id <> p.vec_id)""".stripMargin
    def summary(np: Int) =
      s"""ss$np AS (
         |  SELECT CAST($np AS INT) AS nprobe,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM cand$np)
         |      AS n_candidates,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_true,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM b t JOIN cand$np c
         |       ON c.q_id = t.q_id AND c.n_id = t.n_id) AS n_caught)"""
        .stripMargin
    s"""WITH e AS ($sqlWithNorm),
       |cent AS (SELECT * FROM e WHERE vec_id < 8),
       |rk AS (
       |  SELECT v.vec_id, c.vec_id AS cell,
       |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${sqlCos("v.embedding", "c.embedding", "v.nrm", "c.nrm")} DESC,
       |               c.vec_id) AS rnk
       |  FROM e v CROSS JOIN cent c),
       |asg AS (SELECT vec_id AS n_id, cell FROM rk WHERE rnk = 1),
       |b AS (
       |${sqlKnn("q.vec_id <> c.vec_id")}
       |),
       |${configs.map(cand).mkString(",\n")},
       |${configs.map(summary).mkString(",\n")}
       |${configs.map { np =>
            s"""SELECT nprobe, n_candidates, n_true, n_caught,
               |  CASE WHEN n_true > 0
               |    THEN CAST(n_caught AS DOUBLE) / n_true END AS recall
               |FROM ss$np""".stripMargin
          }.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** The shared arrival-prefix CTE chain behind the v36/v38 oracles:
    * the v35 assignment, a global (cell, vec_id) arrival rank, 8
    * integer-division prefixes, and the per-prefix stats with empty
    * cells preserved — exact ints through `tot`.
    */
  private val sqlPrefixTot: String =
    s"""WITH en AS ($sqlWithNorm),
       |cent AS (SELECT * FROM en WHERE vec_id < 8),
       |crk AS (
       |  SELECT v.vec_id, c.vec_id AS cell,
       |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${sqlCos("v.embedding", "c.embedding", "v.nrm", "c.nrm")} DESC,
       |               c.vec_id) AS rnk
       |  FROM en v CROSS JOIN cent c),
       |asg AS (SELECT vec_id, cell FROM crk WHERE rnk = 1),
       |arr AS (
       |  SELECT vec_id, cell,
       |    ROW_NUMBER() OVER (ORDER BY cell, vec_id) AS arr
       |  FROM asg),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM arr),
       |pres AS (
       |  SELECT p.p AS prefix_i, a.cell
       |  FROM arr a CROSS JOIN nn CROSS JOIN range(1, 9) p(p)
       |  WHERE a.arr <= (p.p * nn.n) // 8),
       |per AS (
       |  SELECT prefix_i, cell, CAST(COUNT(*) AS BIGINT) AS n_vec
       |  FROM pres GROUP BY 1, 2),
       |base AS (
       |  SELECT p.p AS prefix_i, c.vec_id AS cell,
       |    COALESCE(x.n_vec, 0) AS n_vec
       |  FROM cent c CROSS JOIN range(1, 9) p(p)
       |  LEFT JOIN per x ON x.cell = c.vec_id AND x.prefix_i = p.p),
       |tot AS (
       |  SELECT prefix_i,
       |    CAST(SUM(n_vec) AS BIGINT) AS n_total,
       |    CAST(COUNT(*) AS BIGINT) AS n_cells,
       |    CAST(SUM(CASE WHEN n_vec > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_occupied,
       |    CAST(MAX(n_vec) AS BIGINT) AS max_cell
       |  FROM base GROUP BY prefix_i)""".stripMargin

  private def sqlKnn(joinCond: String, vec: String = "embedding",
                     k: Int = 3): String =
    s"""WITH e AS (${sqlWithNormOn(vec)})
       |SELECT q_id, n_id, rnk, cos_sim FROM (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |    ${sqlCos("q.embedding", "c.embedding", "q.nrm", "c.nrm")} AS cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${sqlCos("q.embedding", "c.embedding", "q.nrm", "c.nrm")} DESC,
       |               c.vec_id) AS rnk
       |  FROM e q JOIN e c ON $joinCond
       |  WHERE q.vec_id % 50 = 0)
       |WHERE rnk <= $k""".stripMargin

  /** SQL mirror of Similarity.hyperplanes/lshSignature: ±1 from the
    * parity of md5("p:d")'s first hex digit (strpos is 1-based, so
    * even digit ⇔ odd strpos), signature = Σ 1<<p over planes whose
    * dot is > 0. Dots are the same strict left fold as sqlDot, so the
    * > 0 comparisons agree bit-for-bit with Spark.
    */
  private val sqlLshSig =
    s"""SELECT e.vec_id,
       |  CAST(SUM(CASE WHEN ${sqlDot("e.embedding", "pl.h")} > 0
       |           THEN 1 << pl.p ELSE 0 END) AS BIGINT) AS sig
       |FROM embeddings e CROSS JOIN (
       |  SELECT p, list_transform(range(0, 64),
       |    d -> CASE WHEN strpos('0123456789abcdef',
       |                          substr(md5(p || ':' || d), 1, 1)) % 2 = 1
       |         THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END) AS h
       |  FROM range(0, 8) t(p)) pl
       |GROUP BY e.vec_id""".stripMargin

  /** Self-norm of a `DOUBLE[]` list — mirrors the driver-side strict
    * left fold in Similarity.argmaxCell (`a + x*x` in array order).
    */
  private def sqlSelfNorm(c: String): String =
    s"""sqrt(list_reduce(
       |  list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform($c, x -> x * x)),
       |  (acc, v) -> acc + v))""".stripMargin

  /** One cosine between a corpus row `v` (float embedding + nrm) and a
    * centroid row `c` (double cv + cn) — the exact expression
    * Similarity.argmaxCell evaluates per (vector, centroid).
    */
  private val sqlCentCos =
    s"${sqlDot("v.embedding", "c.cv")} / nullif(v.nrm * c.cn, 0.0)"

  /** Full CTE mirror of `assignModel(e, trainKmeans(e, k=8, iters=n))`:
    * seeds = the k smallest-md5 non-zero vectors (cid in md5-hex
    * order), then per iteration one argmax assignment (ties → lowest
    * cid) and one mean update of the cell's unit vectors, components
    * summed as DECIMAL(28,12) exactly like the Spark aggregate; a cell
    * that loses all members keeps its previous centroid. Every float
    * op is the same strict fold as the Spark/codegen side, so the
    * argmax rows agree bit-for-bit.
    */
  private def sqlKmeans(iters: Int, k: Int = 8): String = {
    val nz =
      s"""SELECT vec_id, embedding, nrm FROM (
         |  SELECT vec_id, embedding,
         |    sqrt(${sqlDot("embedding", "embedding")}) AS nrm
         |  FROM embeddings)
         |WHERE nrm > 0""".stripMargin
    val seeds =
      s"""SELECT cid, cv, ${sqlSelfNorm("cv")} AS cn FROM (
         |  SELECT cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
         |  FROM (
         |    SELECT vec_id, embedding,
         |      row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid
         |    FROM nz QUALIFY cid < $k))""".stripMargin
    def assign(cents: String) =
      s"""SELECT vec_id, cell FROM (
         |  SELECT v.vec_id, c.cid AS cell,
         |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
         |      ORDER BY $sqlCentCos DESC, c.cid) AS rnk
         |  FROM nz v CROSS JOIN $cents c)
         |WHERE rnk = 1""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""a$i AS (${assign(s"c${i - 1}")}),
         |mu$i AS (
         |  SELECT cell, pos,
         |    CAST(SUM(CAST(u AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS m
         |  FROM (
         |    SELECT a.cell,
         |      unnest(range(len(v.embedding))) AS pos,
         |      unnest(list_transform(v.embedding, x -> CAST(x AS DOUBLE) / v.nrm)) AS u
         |    FROM a$i a JOIN nz v USING (vec_id))
         |  GROUP BY cell, pos),
         |c$i AS (
         |  SELECT cid, cv, ${sqlSelfNorm("cv")} AS cn FROM (
         |    SELECT s.cid, COALESCE(m.cv, s.cv) AS cv
         |    FROM c${i - 1} s LEFT JOIN (
         |      SELECT cell, list(m ORDER BY pos) AS cv
         |      FROM mu$i GROUP BY cell) m ON m.cell = s.cid))""".stripMargin
    }.mkString(",\n")
    s"""WITH nz AS ($nz),
       |c0 AS ($seeds),
       |$rounds
       |SELECT vec_id, CAST(cell AS BIGINT) AS cell
       |FROM (${assign(s"c$iters")}) t""".stripMargin
  }

  /** Squared L2 over two lists — mirrors Similarity.sqDist's strict
    * left fold ((a-b)·(a-b) per component, in array order).
    */
  private def sqlSqDist(a: String, b: String): String =
    s"""list_reduce(
       |  list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(list_zip($a, $b),
       |      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
       |         * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))),
       |  (acc, v) -> acc + v)""".stripMargin

  /** Full CTE mirror of `pqKnn(e, querySet, pqCodebook(e, 4, 16), 3)`:
    * codebook = first 16 vectors (cid = rank by vec_id), encode =
    * per-(vector, subspace) argmin codeword (ties → lowest cid), ADC
    * distance = the 4 subspace folds summed in fixed left-assoc order
    * — every float op identical to the Spark side.
    *
    * @param cellPred extra predicate for the IVF-PQ variant: restricts
    * candidate pairs to the query's coarse cell (`ex` is the corpus
    * row's raw embeddings record, carrying its label).
    */
  private def sqlPqKnn(cellPred: String = "TRUE", k: Int = 3): String = {
    val d = (0 until 4).map { m =>
      sqlSqDist(s"q.embedding[${m * 16 + 1}:${(m + 1) * 16}]",
        s"b$m.cv[${m * 16 + 1}:${(m + 1) * 16}]")
    }
    val dist = s"(((${d(0)} + ${d(1)}) + ${d(2)}) + ${d(3)})"
    val encD = sqlSqDist("e.embedding[ms.m*16+1 : ms.m*16+16]",
      "cb.cv[ms.m*16+1 : ms.m*16+16]")
    s"""WITH cb AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
       |  FROM embeddings ORDER BY vec_id LIMIT 16),
       |enc AS (
       |  SELECT vec_id, m, cid FROM (
       |    SELECT e.vec_id, ms.m, cb.cid,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id, ms.m
       |        ORDER BY $encD ASC, cb.cid) AS rnk
       |    FROM embeddings e CROSS JOIN range(0,4) ms(m) CROSS JOIN cb)
       |  WHERE rnk = 1),
       |encp AS (
       |  SELECT vec_id,
       |    MAX(CASE WHEN m=0 THEN cid END) AS c0,
       |    MAX(CASE WHEN m=1 THEN cid END) AS c1,
       |    MAX(CASE WHEN m=2 THEN cid END) AS c2,
       |    MAX(CASE WHEN m=3 THEN cid END) AS c3
       |  FROM enc GROUP BY vec_id),
       |sc AS (
       |  SELECT q.vec_id AS q_id, x.vec_id AS n_id, $dist AS dist
       |  FROM embeddings q JOIN encp x ON q.vec_id <> x.vec_id
       |  JOIN embeddings ex ON ex.vec_id = x.vec_id
       |  JOIN cb b0 ON b0.cid = x.c0
       |  JOIN cb b1 ON b1.cid = x.c1
       |  JOIN cb b2 ON b2.cid = x.c2
       |  JOIN cb b3 ON b3.cid = x.c3
       |  WHERE q.vec_id % 50 = 0 AND $cellPred)
       |SELECT q_id, n_id, rnk, dist FROM (
       |  SELECT q_id, n_id, dist,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist ASC, n_id) AS rnk
       |  FROM sc)
       |WHERE rnk <= $k""".stripMargin
  }

  /** Full CTE mirror of the refined-codebook leg of v17:
    * `pqKnn(e, querySet, pqCodebookRefined(e, 4, 16, iters = 1), 3)`.
    * Seed codebook and seed encode are the sqlPqKnn CTEs; the
    * refinement round re-centers each (subspace, codeword) on the
    * floor(x·1e12)-quantized DECIMAL(38,0)-summed mean of its assigned
    * sub-vectors (meanPool's tie-free quantization — a plain decimal
    * cast would tie at digit 12 where Spark rounds HALF_UP and DuckDB
    * HALF_EVEN), codewords with no members
    * keep their seed slice, then encode + ADC re-run against the
    * refined sub-sliced codewords. Every float op is the same strict
    * fold as the Spark side.
    */
  /** Full CTE mirror of `pqScoreCodesIndexed(indexCells(e, cents,
    * codebook = cb), querySet, cents, cb, 3, nprobe = 2)`: the coarse
    * half is v15's rk/asg/probe CTEs (cosine cell ranks over the
    * first-8 centroids, ties → lowest centroid id), the compressed
    * half is sqlPqKnn's cb/enc/encp CTEs (argmin codewords, ADC
    * subspace folds summed left-assoc). Candidates are the probe-cell
    * equi-join (a corpus vector lives in exactly one cell and probe
    * cells are distinct, so no pair surfaces twice); every float op
    * is the same strict fold as the Spark side, so the top-k agrees
    * bit-for-bit.
    */
  private def sqlIvfPqServe(k: Int = 3, nprobe: Int = 2): String =
    sqlIvfPqServeOver("SELECT vec_id, embedding FROM embeddings", k,
      nprobe)

  /** [[sqlIvfPqServe]] generalized over the INDEX-side corpus: the
    * queries (vec_id % 50 = 0, original vectors), the centroid
    * generation (first 8 original vectors) and the PQ codebook (first
    * 16 original vectors) are FROZEN model artifacts read from
    * `embeddings`, while `corpus` — any (vec_id, embedding) SELECT —
    * is what actually got indexed. v26 passes the raw table; v29
    * passes the mixed feed's latest state (updates applied, deletes
    * absent), which is exactly what the changelog index resolves to
    * at serve time.
    */
  private def sqlIvfPqServeOver(corpus: String, k: Int = 3,
                                nprobe: Int = 2,
                                cbFrom: String =
                                  "SELECT vec_id, embedding FROM embeddings")
      : String = {
    val d = (0 until 4).map { m =>
      sqlSqDist(s"q.embedding[${m * 16 + 1}:${(m + 1) * 16}]",
        s"b$m.cv[${m * 16 + 1}:${(m + 1) * 16}]")
    }
    val dist = s"(((${d(0)} + ${d(1)}) + ${d(2)}) + ${d(3)})"
    val encD = sqlSqDist("e.embedding[ms.m*16+1 : ms.m*16+16]",
      "cb.cv[ms.m*16+1 : ms.m*16+16]")
    s"""WITH en AS ($sqlWithNorm),
       |cent AS (SELECT * FROM en WHERE vec_id < 8),
       |lv AS (
       |  SELECT vec_id, embedding,
       |    sqrt(${sqlDot("embedding", "embedding")}) AS nrm
       |  FROM ($corpus)),
       |crk AS (
       |  SELECT v.vec_id, c.vec_id AS cell,
       |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${sqlCos("v.embedding", "c.embedding", "v.nrm", "c.nrm")} DESC,
       |               c.vec_id) AS rnk
       |  FROM lv v CROSS JOIN cent c),
       |asg AS (SELECT vec_id, cell FROM crk WHERE rnk = 1),
       |qrk AS (
       |  SELECT v.vec_id, c.vec_id AS cell,
       |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${sqlCos("v.embedding", "c.embedding", "v.nrm", "c.nrm")} DESC,
       |               c.vec_id) AS rnk
       |  FROM en v CROSS JOIN cent c
       |  WHERE v.vec_id % 50 = 0),
       |probe AS (SELECT vec_id, cell FROM qrk WHERE rnk <= $nprobe),
       |cb AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
       |  FROM ($cbFrom) ORDER BY vec_id LIMIT 16),
       |enc AS (
       |  SELECT vec_id, m, cid FROM (
       |    SELECT e.vec_id, ms.m, cb.cid,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id, ms.m
       |        ORDER BY $encD ASC, cb.cid) AS rnk
       |    FROM lv e CROSS JOIN range(0,4) ms(m) CROSS JOIN cb)
       |  WHERE rnk = 1),
       |encp AS (
       |  SELECT vec_id,
       |    MAX(CASE WHEN m=0 THEN cid END) AS c0,
       |    MAX(CASE WHEN m=1 THEN cid END) AS c1,
       |    MAX(CASE WHEN m=2 THEN cid END) AS c2,
       |    MAX(CASE WHEN m=3 THEN cid END) AS c3
       |  FROM enc GROUP BY vec_id),
       |sc AS (
       |  SELECT q.vec_id AS q_id, x.vec_id AS n_id, $dist AS dist
       |  FROM embeddings q
       |  JOIN probe p ON p.vec_id = q.vec_id
       |  JOIN asg a ON a.cell = p.cell AND a.vec_id <> q.vec_id
       |  JOIN encp x ON x.vec_id = a.vec_id
       |  JOIN cb b0 ON b0.cid = x.c0
       |  JOIN cb b1 ON b1.cid = x.c1
       |  JOIN cb b2 ON b2.cid = x.c2
       |  JOIN cb b3 ON b3.cid = x.c3)
       |SELECT q_id, n_id, rnk, dist FROM (
       |  SELECT q_id, n_id, dist,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist ASC, n_id) AS rnk
       |  FROM sc)
       |WHERE rnk <= $k""".stripMargin
  }

  /** The v32/v43 two-stage ColBERT serve in SQL, over a parametric
    * corpus: the chunking→hash-embed→norm prefix (`toks`…`e`) and the
    * frozen centroid generation (`cent`, raw first chunks of docs
    * < 8) are shared; `corpus` names the CTE the INDEX side reads —
    * `e` for the append-only v32, the resolved `live` set for v43
    * (supplied via `corpusCte`). Queries always probe from raw `e`
    * (they are external text, not index rows). Cell labels are the
    * centroid's chunk_uid (doc·10⁶), matching the Spark ingest keyed
    * by chunk_uid-as-id.
    */
  private def sqlMaxSimServeOver(corpus: String,
                                 corpusCte: Option[String] = None)
      : String = {
    val extra = corpusCte.map(c => s"$c,\n").getOrElse("")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS w
       |  FROM documents),
       |t AS (
       |  SELECT doc_id, w, len(w) AS n FROM toks WHERE len(w) >= 1),
       |ch AS (
       |  SELECT doc_id, chunk_idx,
       |    list_aggregate(w[chunk_idx*16 + 1 : chunk_idx*16 + 16],
       |      'string_agg', ' ') AS chunk_text
       |  FROM (
       |    SELECT doc_id, w, n,
       |      unnest(range(CASE WHEN n <= 16 THEN 1
       |                   ELSE 1 + (n - 16 + 15) // 16 END)) AS chunk_idx
       |    FROM t)),
       |tk AS (
       |  SELECT doc_id, chunk_idx,
       |    unnest(list_filter(string_split(lower(chunk_text), ' '),
       |      x -> len(x) > 0)) AS w
       |  FROM ch),
       |hv AS (
       |  SELECT doc_id, chunk_idx,
       |    CAST(('0x' || substr(md5(w), 1, 12)) AS BIGINT) AS h
       |  FROM tk),
       |sm AS (
       |  SELECT doc_id, chunk_idx, h % 64 AS b,
       |    SUM(((h >> 47) & 1) * 2 - 1) AS s
       |  FROM hv GROUP BY doc_id, chunk_idx, b),
       |grid AS (
       |  SELECT i.doc_id, i.chunk_idx, r.b
       |  FROM (SELECT DISTINCT doc_id, chunk_idx FROM tk) i
       |  CROSS JOIN range(0, 64) r(b)),
       |emb AS (
       |  SELECT g.doc_id, g.chunk_idx,
       |    list(CAST(COALESCE(s.s, 0) AS DOUBLE) ORDER BY g.b)
       |      AS embedding
       |  FROM grid g
       |  LEFT JOIN sm s ON s.doc_id = g.doc_id
       |    AND s.chunk_idx = g.chunk_idx AND s.b = g.b
       |  GROUP BY g.doc_id, g.chunk_idx),
       |e AS (
       |  SELECT * FROM (
       |    SELECT doc_id, chunk_idx, embedding,
       |      sqrt(${sqlDot("embedding", "embedding")}) AS nrm
       |    FROM emb) WHERE nrm > 0),
       |cent AS (SELECT * FROM e WHERE chunk_idx = 0 AND doc_id < 8),
       |${extra}crk AS (
       |  SELECT v.doc_id, v.chunk_idx, c.doc_id * 1000000 AS cell,
       |    ROW_NUMBER() OVER (PARTITION BY v.doc_id, v.chunk_idx
       |      ORDER BY ${sqlCos("v.embedding", "c.embedding", "v.nrm", "c.nrm")} DESC,
       |               c.doc_id) AS rnk
       |  FROM $corpus v CROSS JOIN cent c),
       |asg AS (SELECT doc_id, chunk_idx, cell FROM crk WHERE rnk = 1),
       |qrk AS (
       |  SELECT v.doc_id, v.chunk_idx, c.doc_id * 1000000 AS cell,
       |    ROW_NUMBER() OVER (PARTITION BY v.doc_id, v.chunk_idx
       |      ORDER BY ${sqlCos("v.embedding", "c.embedding", "v.nrm", "c.nrm")} DESC,
       |               c.doc_id) AS rnk
       |  FROM e v CROSS JOIN cent c
       |  WHERE v.doc_id % 50 = 0),
       |probe AS (
       |  SELECT doc_id, chunk_idx, cell FROM qrk WHERE rnk <= 2),
       |cand AS (
       |  SELECT DISTINCT p.doc_id AS q_doc, a.doc_id AS n_doc
       |  FROM probe p JOIN asg a ON a.cell = p.cell
       |  WHERE a.doc_id <> p.doc_id),
       |mx AS (
       |  SELECT c.q_doc, qc.chunk_idx AS q_chunk, c.n_doc,
       |    MAX(${sqlCos("qc.embedding", "nc.embedding", "qc.nrm", "nc.nrm")}) AS mc
       |  FROM cand c
       |  JOIN e qc ON qc.doc_id = c.q_doc
       |  JOIN $corpus nc ON nc.doc_id = c.n_doc
       |  GROUP BY c.q_doc, qc.chunk_idx, c.n_doc),
       |sq AS (
       |  SELECT q_doc, n_doc,
       |    SUM(CAST(floor(mc * 1e12) AS HUGEINT)) AS sq
       |  FROM mx GROUP BY q_doc, n_doc)
       |SELECT q_doc, n_doc, rnk, CAST(sq AS DOUBLE) / 1e12 AS score
       |FROM (
       |  SELECT q_doc, n_doc, sq,
       |    ROW_NUMBER() OVER (PARTITION BY q_doc
       |      ORDER BY sq DESC, n_doc) AS rnk
       |  FROM sq)
       |WHERE rnk <= 3""".stripMargin
  }

  /** The v29 latest-state corpus in SQL: the mixed feed's resolution —
    * updated ids (vec_id % 7 = 0) carry their seq-2 reversed vector,
    * deleted ids (vec_id % 11 = 0) are absent, everything else keeps
    * its insert. Reversal moves floats without arithmetic, so both
    * engines hold identical arrays (their norm/cell/code folds then
    * agree bit-for-bit).
    */
  private val sqlUpsertLatest =
    """SELECT vec_id,
      |  CASE WHEN vec_id % 7 = 0 THEN list_reverse(embedding)
      |       ELSE embedding END AS embedding
      |FROM embeddings WHERE vec_id % 11 <> 0""".stripMargin

  /** One config leg of the v28 (m, k) PQ sweep: sqlPqKnn's cb/enc/
    * encp/score CTEs generalized over subspace count `m` (sub =
    * 64/m) and codebook size `kc`, names prefixed `$t` so four legs
    * coexist in one WITH. Emits (CTE text, top-pairs CTE name).
    */
  private def sqlPqCfg(t: String, m: Int, kc: Int): (String, String) = {
    val sub = 64 / m
    val d = (0 until m).map { mi =>
      sqlSqDist(s"q.embedding[${mi * sub + 1}:${(mi + 1) * sub}]",
        s"$t$mi.cv[${mi * sub + 1}:${(mi + 1) * sub}]")
    }
    val dist = d.reduce((a, b) => s"($a + $b)")
    val encD = sqlSqDist(s"e.embedding[ms.m*$sub+1 : ms.m*$sub+$sub]",
      s"cb.cv[ms.m*$sub+1 : ms.m*$sub+$sub]")
    val pivot = (0 until m).map(mi =>
      s"MAX(CASE WHEN m=$mi THEN cid END) AS c$mi").mkString(",\n    ")
    val joins = (0 until m).map(mi =>
      s"JOIN ${t}cb $t$mi ON $t$mi.cid = x.c$mi").mkString("\n  ")
    val cte =
      s"""${t}cb AS (
         |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
         |  FROM embeddings ORDER BY vec_id LIMIT $kc),
         |${t}enc AS (
         |  SELECT vec_id, m, cid FROM (
         |    SELECT e.vec_id, ms.m, cb.cid,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id, ms.m
         |        ORDER BY $encD ASC, cb.cid) AS rnk
         |    FROM embeddings e CROSS JOIN range(0,$m) ms(m)
         |    CROSS JOIN ${t}cb cb)
         |  WHERE rnk = 1),
         |${t}encp AS (
         |  SELECT vec_id,
         |    $pivot
         |  FROM ${t}enc GROUP BY vec_id),
         |${t}top AS (
         |  SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id,
         |      ROW_NUMBER() OVER (PARTITION BY q_id
         |        ORDER BY dist ASC, n_id) AS rnk
         |    FROM (
         |      SELECT q.vec_id AS q_id, x.vec_id AS n_id, $dist AS dist
         |      FROM embeddings q JOIN ${t}encp x ON q.vec_id <> x.vec_id
         |      $joins
         |      WHERE q.vec_id % 50 = 0))
         |  WHERE rnk <= 3)""".stripMargin
    (cte, s"${t}top")
  }

  private def sqlPqRefinedKnn(k: Int = 3): String = {
    val encSeedD = sqlSqDist("e.embedding[ms.m*16+1 : ms.m*16+16]",
      "cb.cv[ms.m*16+1 : ms.m*16+16]")
    val encRefD = sqlSqDist("e.embedding[c.m*16+1 : c.m*16+16]", "c.scv")
    val d = (0 until 4).map { m =>
      sqlSqDist(s"q.embedding[${m * 16 + 1}:${(m + 1) * 16}]", s"b$m.scv")
    }
    val dist = s"(((${d(0)} + ${d(1)}) + ${d(2)}) + ${d(3)})"
    s"""WITH cb0 AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
       |  FROM embeddings ORDER BY vec_id LIMIT 16),
       |enc0 AS (
       |  SELECT vec_id, m, cid FROM (
       |    SELECT e.vec_id, ms.m, cb.cid,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id, ms.m
       |        ORDER BY $encSeedD ASC, cb.cid) AS rnk
       |    FROM embeddings e CROSS JOIN range(0,4) ms(m) CROSS JOIN cb0 cb)
       |  WHERE rnk = 1),
       |mu AS (
       |  SELECT m, cid, pos,
       |    (CAST(SUM(CAST(floor(x * 1e12) AS DECIMAL(38,0))) AS DOUBLE)
       |      / COUNT(*)) / 1e12 AS mu
       |  FROM (
       |    SELECT en.m, en.cid,
       |      unnest(range(16)) AS pos,
       |      unnest(list_transform(e.embedding[en.m*16+1 : en.m*16+16],
       |        v -> CAST(v AS DOUBLE))) AS x
       |    FROM enc0 en JOIN embeddings e USING (vec_id))
       |  GROUP BY m, cid, pos),
       |cbr AS (
       |  SELECT ms.m, s.cid, COALESCE(r.scv, s.cv[ms.m*16+1 : ms.m*16+16]) AS scv
       |  FROM cb0 s CROSS JOIN range(0,4) ms(m)
       |  LEFT JOIN (SELECT m, cid, list(mu ORDER BY pos) AS scv
       |             FROM mu GROUP BY m, cid) r
       |    ON r.m = ms.m AND r.cid = s.cid),
       |encr AS (
       |  SELECT vec_id, m, cid FROM (
       |    SELECT e.vec_id, c.m, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id, c.m
       |        ORDER BY $encRefD ASC, c.cid) AS rnk
       |    FROM embeddings e CROSS JOIN cbr c)
       |  WHERE rnk = 1),
       |encp AS (
       |  SELECT vec_id,
       |    MAX(CASE WHEN m=0 THEN cid END) AS c0,
       |    MAX(CASE WHEN m=1 THEN cid END) AS c1,
       |    MAX(CASE WHEN m=2 THEN cid END) AS c2,
       |    MAX(CASE WHEN m=3 THEN cid END) AS c3
       |  FROM encr GROUP BY vec_id),
       |sc AS (
       |  SELECT q.vec_id AS q_id, x.vec_id AS n_id, $dist AS dist
       |  FROM embeddings q JOIN encp x ON q.vec_id <> x.vec_id
       |  JOIN cbr b0 ON b0.m = 0 AND b0.cid = x.c0
       |  JOIN cbr b1 ON b1.m = 1 AND b1.cid = x.c1
       |  JOIN cbr b2 ON b2.m = 2 AND b2.cid = x.c2
       |  JOIN cbr b3 ON b3.m = 3 AND b3.cid = x.c3
       |  WHERE q.vec_id % 50 = 0)
       |SELECT q_id, n_id, rnk, dist FROM (
       |  SELECT q_id, n_id, dist,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist ASC, n_id) AS rnk
       |  FROM sc)
       |WHERE rnk <= $k""".stripMargin
  }

  /** Exact integer dot over two int8-quantized BIGINT lists — mirrors
    * VecDotI8 (integer sums are associative, so fold order is moot,
    * but the strict fold keeps the formulation uniform).
    */
  private def sqlDotI8(a: String, b: String): String =
    s"""list_reduce(
       |  list_prepend(CAST(0 AS BIGINT),
       |    list_transform(list_zip($a, $b), p -> p[1] * p[2])),
       |  (acc, v) -> acc + v)""".stripMargin

  /** SQL mirror of Similarity.signBits/hammingKnn: sign signature =
    * Σ 1<<d over dims with value > 0, Hamming = bit_count(xor), top-10
    * candidates reranked by the strict-fold cosine to top-3. Shared by
    * the v20 oracle and v21's recall CTE.
    */
  private lazy val sqlHammingKnn: String =
    s"""WITH e AS ($sqlWithNorm),
       |sigs AS (
       |  SELECT vec_id,
       |    CAST(list_sum(list_transform(range(0, len(embedding)),
       |      i -> CASE WHEN embedding[CAST(i AS INT) + 1] > 0
       |           -- bit 63 as two's-complement min: DuckDB's checked
       |           -- << rejects 1<<63; Spark's shiftleft wraps to
       |           -- exactly this value, so the packs agree
       |           THEN CASE WHEN i = 63
       |                THEN CAST(-9223372036854775807 - 1 AS BIGINT)
       |                ELSE CAST(1 AS BIGINT) << i END
       |           ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sig
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |cand AS (
       |  SELECT q_id, n_id, hamming FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |      CAST(bit_count(xor(q.sig, c.sig)) AS INT) AS hamming,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY bit_count(xor(q.sig, c.sig)), c.vec_id) AS h_rnk
       |    FROM sigs q JOIN sigs c ON q.vec_id <> c.vec_id
       |    -- null sigs (empty vectors: list_sum of [] is NULL) are
       |    -- excluded on both sides, mirroring Spark's isNotNull
       |    WHERE q.vec_id % 50 = 0
       |      AND q.sig IS NOT NULL AND c.sig IS NOT NULL)
       |  WHERE h_rnk <= 10)
       |SELECT q_id, n_id, rnk, hamming, cos_sim FROM (
       |  SELECT t.q_id, t.n_id, t.hamming,
       |    ${sqlCos("qe.embedding", "ce.embedding", "qe.nrm", "ce.nrm")}
       |      AS cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY t.q_id
       |      ORDER BY ${sqlCos("qe.embedding", "ce.embedding", "qe.nrm", "ce.nrm")} DESC,
       |               t.n_id) AS rnk
       |  FROM cand t
       |  JOIN e qe ON qe.vec_id = t.q_id
       |  JOIN e ce ON ce.vec_id = t.n_id)
       |WHERE rnk <= 3""".stripMargin

  /** v7's full mirror, reused verbatim as the quantized leg of v16. */
  private lazy val sqlSq8Knn: String =
    s"""WITH qz AS (
       |  SELECT vec_id,
       |    list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) / mx * 127) AS BIGINT)) AS q8
       |  FROM (SELECT vec_id, embedding,
       |          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
       |        FROM embeddings)
       |  WHERE mx > 0)
       |SELECT q_id, n_id, rnk, qdot FROM (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |    ${sqlDotI8("q.q8", "c.q8")} AS qdot,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${sqlDotI8("q.q8", "c.q8")} DESC, c.vec_id) AS rnk
       |  FROM qz q JOIN qz c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id % 50 = 0)
       |WHERE rnk <= 3""".stripMargin

  def oracle: Map[String, String] = Map(
    "v1_knn_brute" -> sqlKnn("q.vec_id <> c.vec_id"),

    // the greedy MMR loop unrolled to its 3 steps: argmax relevance,
    // then two argmaxes of λ·rel − (1−λ)·max-sim-to-selected; the
    // (1−λ) literal is interpolated from the SAME Scala double the
    // operator uses (1.0 − 0.7 is NOT 0.3 in binary), so scores are
    // bit-equal; ties break by candidate id on both sides
    "v23_mmr_diverse" -> {
      val l = 0.7
      val l1 = 1.0 - l
      def mmr(relExpr: String, msimExpr: String) =
        s"$l * $relExpr - $l1 * $msimExpr"
      s"""WITH e AS ($sqlWithNorm),
         |cand AS (
         |  SELECT q_id, n_id, n_vec, n_nrm, rel FROM (
         |    SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |      c.embedding AS n_vec, c.nrm AS n_nrm,
         |      ${sqlCos("q.embedding", "c.embedding", "q.nrm", "c.nrm")}
         |        AS rel,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${sqlCos("q.embedding", "c.embedding",
                   "q.nrm", "c.nrm")} DESC, c.vec_id) AS rnk
         |    FROM e q JOIN e c ON q.vec_id <> c.vec_id
         |    WHERE q.vec_id % 50 = 0)
         |  WHERE rnk <= 8),
         |s1 AS (
         |  SELECT q_id, n_id, n_vec, n_nrm, rel, rel AS score FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY rel DESC, n_id) AS r FROM cand)
         |  WHERE r = 1),
         |m2 AS (
         |  SELECT c.q_id, c.n_id, c.n_vec, c.n_nrm, c.rel,
         |    ${sqlCos("c.n_vec", "s.n_vec", "c.n_nrm", "s.n_nrm")} AS msim
         |  FROM cand c JOIN s1 s ON s.q_id = c.q_id AND c.n_id <> s.n_id),
         |s2 AS (
         |  SELECT q_id, n_id, n_vec, n_nrm, rel, score FROM (
         |    SELECT *, ${mmr("rel", "msim")} AS score,
         |      ROW_NUMBER() OVER (PARTITION BY q_id
         |        ORDER BY ${mmr("rel", "msim")} DESC, n_id) AS r
         |    FROM m2) WHERE r = 1),
         |sel12 AS (
         |  SELECT q_id, n_id, n_vec, n_nrm FROM s1
         |  UNION ALL SELECT q_id, n_id, n_vec, n_nrm FROM s2),
         |rem3 AS (
         |  SELECT c.* FROM cand c
         |  LEFT JOIN sel12 x ON x.q_id = c.q_id AND x.n_id = c.n_id
         |  WHERE x.n_id IS NULL),
         |m3 AS (
         |  SELECT r.q_id, r.n_id, r.rel,
         |    MAX(${sqlCos("r.n_vec", "s.n_vec", "r.n_nrm", "s.n_nrm")})
         |      AS msim
         |  FROM rem3 r JOIN sel12 s ON s.q_id = r.q_id
         |  GROUP BY 1, 2, 3),
         |s3 AS (
         |  SELECT q_id, n_id, score FROM (
         |    SELECT *, ${mmr("rel", "msim")} AS score,
         |      ROW_NUMBER() OVER (PARTITION BY q_id
         |        ORDER BY ${mmr("rel", "msim")} DESC, n_id) AS r
         |    FROM m3) WHERE r = 1)
         |SELECT q_id, CAST(1 AS INT) AS step, n_id, score FROM s1
         |UNION ALL SELECT q_id, CAST(2 AS INT), n_id, score FROM s2
         |UNION ALL SELECT q_id, CAST(3 AS INT), n_id, score FROM s3"""
        .stripMargin
    },

    // v1's mirror with the admissibility predicate on the candidate
    // side of the join — pre-filter, exactly like the operator
    "v22_filtered_knn" ->
      sqlKnn("q.vec_id <> c.vec_id AND c.label % 2 = 0"),

    // sign signature = Σ 1<<d over dims with value > 0 (exact float
    // comparison, engine-independent); Hamming = bit_count(xor); the
    // cosine rerank reuses the strict-fold sqlCos, inlined in the
    // window ORDER BY (aliases are not in scope there)
    "v20_hamming_knn" -> sqlHammingKnn,

    // brute vs binary-quantized, the v16 counting shape
    "v21_hamming_recall" ->
      s"""WITH b AS (
         |${sqlKnn("q.vec_id <> c.vec_id")}
         |),
         |h AS (
         |$sqlHammingKnn
         |)
         |SELECT b.q_id,
         |  CAST(COUNT(h.n_id) AS BIGINT) AS hit_ct,
         |  CAST(COUNT(h.n_id) AS DOUBLE) / 3.0 AS recall
         |FROM b LEFT JOIN h ON h.q_id = b.q_id AND h.n_id = b.n_id
         |GROUP BY b.q_id""".stripMargin,

    "v6_kmeans_train" -> sqlKmeans(iters = 1),

    "v8_kmeans_iter2" -> sqlKmeans(iters = 2),

    // per-vector scale = max |component|; q8 = floor(x/scale·127) —
    // double division and floor are IEEE-identical on both engines, so
    // codes and therefore integer scores match exactly
    "v7_knn_sq8" -> sqlSq8Knn,

    // quantization-quality recall: the exact and SQ8 mirrors nested as
    // CTEs, counted per query (the v11 shape)
    "v16_sq8_recall" ->
      s"""WITH b AS (
         |${sqlKnn("q.vec_id <> c.vec_id")}
         |),
         |i AS (
         |$sqlSq8Knn
         |)
         |SELECT b.q_id,
         |  CAST(COUNT(i.n_id) AS BIGINT) AS hit_ct,
         |  CAST(COUNT(i.n_id) AS DOUBLE) / 3.0 AS recall
         |FROM b LEFT JOIN i ON i.q_id = b.q_id AND i.n_id = b.n_id
         |GROUP BY b.q_id""".stripMargin,

    "v2_knn_ivf" -> sqlKnn("q.label = c.label AND q.vec_id <> c.vec_id"),

    // label mismatch subsumes self-exclusion
    "v13_hard_negatives" -> sqlKnn("q.label <> c.label"),

    // corpus assignment = the v5 argmax (rnk = 1); query probes = the
    // same ranking kept to rnk <= 2; candidates join on the cell id.
    // Every cosine is the same strict fold, so cell ranks, probe sets,
    // and the final top-3 agree bit-for-bit.
    "v15_knn_multiprobe" ->
      s"""WITH e AS ($sqlWithNorm),
         |cent AS (SELECT * FROM e WHERE vec_id < 8),
         |rk AS (
         |  SELECT v.vec_id, c.vec_id AS cell,
         |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
         |      ORDER BY ${sqlCos("v.embedding", "c.embedding", "v.nrm", "c.nrm")} DESC,
         |               c.vec_id) AS rnk
         |  FROM e v CROSS JOIN cent c),
         |asg AS (SELECT vec_id, cell FROM rk WHERE rnk = 1),
         |probe AS (
         |  SELECT vec_id, cell FROM rk
         |  WHERE rnk <= 2 AND vec_id % 50 = 0)
         |SELECT q_id, n_id, rnk, cos_sim FROM (
         |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
         |    ${sqlCos("q.embedding", "n.embedding", "q.nrm", "n.nrm")} AS cos_sim,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${sqlCos("q.embedding", "n.embedding", "q.nrm", "n.nrm")} DESC,
         |               n.vec_id) AS rnk
         |  FROM e q
         |  JOIN probe p ON p.vec_id = q.vec_id
         |  JOIN asg a ON a.cell = p.cell
         |  JOIN e n ON n.vec_id = a.vec_id AND n.vec_id <> q.vec_id
         |  WHERE q.vec_id % 50 = 0)
         |WHERE rnk <= 3""".stripMargin,

    // same recall shape as v11, low-dim leg sliced before the folds
    "v14_mrl_recall" ->
      s"""WITH b AS (
         |${sqlKnn("q.vec_id <> c.vec_id")}
         |),
         |i AS (
         |${sqlKnn("q.vec_id <> c.vec_id", vec = "embedding[1:16]")}
         |)
         |SELECT b.q_id,
         |  CAST(COUNT(i.n_id) AS BIGINT) AS hit_ct,
         |  CAST(COUNT(i.n_id) AS DOUBLE) / 3.0 AS recall
         |FROM b LEFT JOIN i ON i.q_id = b.q_id AND i.n_id = b.n_id
         |GROUP BY b.q_id""".stripMargin,

    "v9_knn_pq" -> sqlPqKnn(),

    // coarse cells (v15's rk/asg/probe) × PQ codes (v9's cb/enc) —
    // the composed IVF-PQ serve mirror
    "v26_ivfpq_serve" -> sqlIvfPqServe(),

    // the serve replayed over the feed's latest state: same frozen
    // centroids/codebook/queries, index-side corpus = updates applied,
    // deletes absent — DuckDB resolves the feed directly (the
    // synthesized ops are pure functions of vec_id), Spark resolves it
    // through indexChangelog -> latestIndexState
    "v29_index_upsert_serve" -> sqlIvfPqServeOver(sqlUpsertLatest),
    // the released serve: same resolved corpus as v29 but the cb CTE
    // now trains on it too (first-16 LIVE ids — %11 ids gone, %7
    // reversed), exactly Similarity.releaseIndex's contract
    "v42_codebook_release" -> sqlIvfPqServeOver(sqlUpsertLatest,
      cbFrom = sqlUpsertLatest),

    // the depth metric over the arrival prefixes of the v29/v40
    // changelog: b1 inserts, b2 %7 updates, b3 %11 deletes, b4 the
    // post-fold tail (late %11 updates + %5 seq-4 updates)
    "v41_snapshot_policy" ->
      """WITH feed AS (
        |  SELECT vec_id, 1 AS b FROM embeddings
        |  UNION ALL
        |  SELECT vec_id, 2 FROM embeddings WHERE vec_id % 7 = 0
        |  UNION ALL
        |  SELECT vec_id, 3 FROM embeddings WHERE vec_id % 11 = 0
        |  UNION ALL
        |  SELECT vec_id, 4 FROM embeddings WHERE vec_id % 11 = 0
        |  UNION ALL
        |  SELECT vec_id, 4 FROM embeddings WHERE vec_id % 5 = 0),
        |agg AS (
        |  SELECT CAST(p.p AS BIGINT) AS prefix_i,
        |    COUNT(*) AS n_rows, COUNT(DISTINCT vec_id) AS n_keys
        |  FROM feed JOIN range(1, 5) p(p) ON feed.b <= p.p
        |  GROUP BY 1),
        |st AS (
        |  SELECT *, CAST(n_rows AS DOUBLE)
        |      / NULLIF(CAST(n_keys AS DOUBLE), 0) AS depth
        |  FROM agg),
        |pol AS (SELECT *, depth > 1.2 AS fired FROM st)
        |SELECT prefix_i, n_rows, n_keys, depth, fired,
        |  CASE WHEN fired THEN n_rows - n_keys
        |       ELSE CAST(0 AS BIGINT) END AS fold_saves,
        |  MIN(CASE WHEN fired THEN prefix_i END) OVER () AS fires_at
        |FROM pol""".stripMargin,

    // the full-log resolution of upsertFeed + snapshotTail: alive
    // unless deleted-at-3 with no seq-4 revival (%11 ids that are not
    // %5 — the late seq-2 update must NOT save them); reversed if a
    // %5 (seq 4) or %7 (seq 2) update is the max-seq live row
    "v40_snapshot_fold" -> sqlIvfPqServeOver(
      """SELECT vec_id,
        |  CASE WHEN vec_id % 5 = 0 OR vec_id % 7 = 0
        |       THEN list_reverse(embedding) ELSE embedding END
        |    AS embedding
        |FROM embeddings
        |WHERE vec_id % 11 <> 0 OR vec_id % 5 = 0""".stripMargin),

    // filtered serve: the index-side corpus is the predicate's
    // survivors — excluded vectors' cells/codes are irrelevant (they
    // never become candidates), so restricting the corpus CTE mirrors
    // serve-time index filtering exactly
    "v30_filtered_serve" -> sqlIvfPqServeOver(
      "SELECT vec_id, embedding FROM embeddings WHERE label % 2 = 0"),

    // residual IVF-PQ replay: assignment (cosine ties → low centroid
    // id), residual = exact double subtraction, seed codebook = first
    // 16 RESIDUALS by vec_id, argmin encode, per-(query, probe cell)
    // residual ADC — every fold the same strict left-assoc double op
    "v33_residual_pq_serve" -> sqlResidualServe,

    // index-stats replay: re-derive the v26 assignment, count per
    // centroid with empties preserved (LEFT JOIN from cent), summary
    // cross-joined — exact ints, double ratios last
    "v35_index_stats" ->
      s"""WITH en AS ($sqlWithNorm),
         |cent AS (SELECT * FROM en WHERE vec_id < 8),
         |crk AS (
         |  SELECT v.vec_id, c.vec_id AS cell,
         |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
         |      ORDER BY ${sqlCos("v.embedding", "c.embedding", "v.nrm", "c.nrm")} DESC,
         |               c.vec_id) AS rnk
         |  FROM en v CROSS JOIN cent c),
         |asg AS (SELECT vec_id, cell FROM crk WHERE rnk = 1),
         |per AS (
         |  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vec
         |  FROM asg GROUP BY cell),
         |base AS (
         |  SELECT c.vec_id AS cell, COALESCE(p.n_vec, 0) AS n_vec
         |  FROM cent c LEFT JOIN per p ON p.cell = c.vec_id),
         |tot AS (
         |  SELECT CAST(SUM(n_vec) AS BIGINT) AS n_total,
         |    CAST(COUNT(*) AS BIGINT) AS n_cells,
         |    CAST(SUM(CASE WHEN n_vec > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_occupied,
         |    CAST(MAX(n_vec) AS BIGINT) AS max_cell
         |  FROM base)
         |SELECT b.cell, b.n_vec,
         |  CAST(b.n_vec AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS frac,
         |  t.n_total, t.n_cells, t.n_occupied,
         |  CAST(t.max_cell AS DOUBLE) * CAST(t.n_cells AS DOUBLE)
         |    / CAST(t.n_total AS DOUBLE) AS imbalance
         |FROM base b CROSS JOIN tot t""".stripMargin,

    // bitext-margin replay: both k-NN directions as rank CTEs over
    // the even/odd sides, neighborhood sums as
    // SUM(DECIMAL(38,0) floor(cos·1e12)) (order-free exact), margin =
    // qcos·2k over the summed denominators with ONE final double
    // division — the same fold discipline as every cosine row
    "v37_bitext_margin" ->
      s"""WITH en AS ($sqlWithNorm),
         |xs AS (SELECT * FROM en WHERE vec_id % 2 = 0),
         |ys AS (SELECT * FROM en WHERE vec_id % 2 = 1),
         |qs AS (SELECT * FROM xs WHERE vec_id % 50 = 0),
         |fwd AS (
         |  SELECT q.vec_id AS x_id, y.vec_id AS n_id,
         |    ${sqlCos("q.embedding", "y.embedding", "q.nrm", "y.nrm")} AS cs,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${sqlCos("q.embedding", "y.embedding", "q.nrm", "y.nrm")} DESC,
         |               y.vec_id) AS rnk
         |  FROM qs q CROSS JOIN ys y),
         |fk AS (SELECT * FROM fwd WHERE rnk <= 4),
         |sx AS (
         |  SELECT x_id, SUM(CAST(FLOOR(cs * 1e12) AS DECIMAL(38,0)))
         |    AS sum_x
         |  FROM fk GROUP BY x_id),
         |best AS (
         |  SELECT x_id, n_id AS y_id, cs AS cos_sim
         |  FROM fk WHERE rnk = 1),
         |bq AS (SELECT DISTINCT y_id FROM best),
         |bwd AS (
         |  SELECT y.vec_id AS y_id, x.vec_id AS n_id,
         |    ${sqlCos("y.embedding", "x.embedding", "y.nrm", "x.nrm")} AS cs,
         |    ROW_NUMBER() OVER (PARTITION BY y.vec_id
         |      ORDER BY ${sqlCos("y.embedding", "x.embedding", "y.nrm", "x.nrm")} DESC,
         |               x.vec_id) AS rnk
         |  FROM ys y JOIN bq ON bq.y_id = y.vec_id CROSS JOIN xs x),
         |bk AS (SELECT * FROM bwd WHERE rnk <= 4),
         |sy AS (
         |  SELECT y_id, SUM(CAST(FLOOR(cs * 1e12) AS DECIMAL(38,0)))
         |    AS sum_y
         |  FROM bk GROUP BY y_id),
         |bb AS (SELECT y_id, n_id AS y_best_x FROM bk WHERE rnk = 1)
         |SELECT b.x_id, b.y_id, b.cos_sim,
         |  (FLOOR(b.cos_sim * 1e12) * 8)
         |    / CAST(s1.sum_x + s2.sum_y AS DOUBLE) AS margin,
         |  bb.y_best_x = b.x_id AS mutual
         |FROM best b
         |JOIN sx s1 ON s1.x_id = b.x_id
         |JOIN sy s2 ON s2.y_id = b.y_id
         |JOIN bb ON bb.y_id = b.y_id""".stripMargin,

    // retrain-trigger replay: the v35 assignment CTEs, a global
    // (cell, vec_id) arrival rank, 8 integer-division prefixes, the
    // per-prefix stats with empty cells preserved, and the fired /
    // first-crossing columns — exact ints throughout, double ratios
    // and the threshold compare last
    "v36_retrain_trigger" ->
      s"""$sqlPrefixTot,
         |st AS (
         |  SELECT CAST(prefix_i AS BIGINT) AS prefix_i, n_total,
         |    n_occupied,
         |    CAST(max_cell AS DOUBLE) * CAST(n_cells AS DOUBLE)
         |      / NULLIF(CAST(n_total AS DOUBLE), 0) AS imbalance
         |  FROM tot)
         |SELECT prefix_i, n_total, n_occupied, imbalance,
         |  imbalance > 2.0 AS fired,
         |  MIN(CASE WHEN imbalance > 2.0 THEN prefix_i END) OVER ()
         |    AS fires_at
         |FROM st""".stripMargin,

    // the v36 prefix stats extended with the SECOND trigger: per
    // prefix the occupancy, both verdicts, and the k ∝ √N growth
    // rule's k with the occupancy it restores
    "v38_growth_policy" ->
      s"""$sqlPrefixTot,
         |st AS (
         |  SELECT CAST(prefix_i AS BIGINT) AS prefix_i, n_total,
         |    n_cells, n_occupied,
         |    CAST(n_total AS DOUBLE) / NULLIF(CAST(n_cells AS DOUBLE), 0)
         |      AS occupancy,
         |    CAST(max_cell AS DOUBLE) * CAST(n_cells AS DOUBLE)
         |      / NULLIF(CAST(n_total AS DOUBLE), 0) AS imbalance
         |  FROM tot),
         |pol AS (
         |  SELECT *, imbalance > 2.0 AS fired_imb,
         |    occupancy > 32.0 AS fired_occ,
         |    (imbalance > 2.0 OR occupancy > 32.0) AS fired
         |  FROM st),
         |pol2 AS (
         |  SELECT *, CASE WHEN fired THEN
         |      GREATEST(CAST(2 AS BIGINT),
         |        CAST(CEIL(SQRT(CAST(n_total AS DOUBLE))) AS BIGINT))
         |    ELSE n_cells END AS k_next
         |  FROM pol)
         |SELECT prefix_i, n_total, n_cells, n_occupied, occupancy,
         |  imbalance, fired_imb, fired_occ, fired, k_next,
         |  CAST(n_total AS DOUBLE) / NULLIF(CAST(k_next AS DOUBLE), 0)
         |    AS occ_after,
         |  MIN(CASE WHEN fired THEN prefix_i END) OVER () AS fires_at
         |FROM pol2""".stripMargin,

    // the planning row residual encoding earns its keep with: recall@3
    // of the raw-space serve (v26) vs the residual serve (v33) against
    // the SAME brute-force truth — exact-integer hit counts, double
    // ratio last
    "v34_residual_recall" -> {
      def leg(name: String, q: String) =
        s"""SELECT '$name' AS variant,
           |  CAST(COUNT(*) AS BIGINT) AS hits,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM tr) AS n_true,
           |  CAST(COUNT(*) AS DOUBLE) /
           |    (SELECT CAST(COUNT(*) AS DOUBLE) FROM tr) AS recall
           |FROM (
           |$q
           |) s JOIN tr ON tr.q_id = s.q_id AND tr.n_id = s.n_id""".stripMargin
      s"""WITH tr AS (
         |${sqlKnn("q.vec_id <> c.vec_id")}
         |)
         |${leg("raw", sqlIvfPqServe())}
         |UNION ALL
         |${leg("residual", sqlResidualServe)}""".stripMargin
    }) ++ oracleTail

  /** Full CTE mirror of the v33 residual IVF-PQ serve (also the
    * residual leg of v34).
    */
  private lazy val sqlResidualServe: String = {
      val d = (0 until 4).map { m =>
        sqlSqDist(s"qr.r[${m * 16 + 1}:${(m + 1) * 16}]",
          s"b$m.cv[${m * 16 + 1}:${(m + 1) * 16}]")
      }
      val dist = s"(((${d(0)} + ${d(1)}) + ${d(2)}) + ${d(3)})"
      val encD = sqlSqDist("e.r[ms.m*16+1 : ms.m*16+16]",
        "cb.cv[ms.m*16+1 : ms.m*16+16]")
      s"""WITH en AS ($sqlWithNorm),
         |cent AS (SELECT * FROM en WHERE vec_id < 8),
         |crk AS (
         |  SELECT v.vec_id, c.vec_id AS cell,
         |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
         |      ORDER BY ${sqlCos("v.embedding", "c.embedding", "v.nrm", "c.nrm")} DESC,
         |               c.vec_id) AS rnk
         |  FROM en v CROSS JOIN cent c),
         |asg AS (SELECT vec_id, cell FROM crk WHERE rnk = 1),
         |res AS (
         |  SELECT e.vec_id, a.cell,
         |    list_transform(list_zip(e.embedding, c.embedding),
         |      p -> CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) AS r
         |  FROM embeddings e
         |  JOIN asg a ON a.vec_id = e.vec_id
         |  JOIN embeddings c ON c.vec_id = a.cell),
         |rcb AS (
         |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, r AS cv
         |  FROM res ORDER BY vec_id LIMIT 16),
         |enc AS (
         |  SELECT vec_id, m, cid FROM (
         |    SELECT e.vec_id, ms.m, cb.cid,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id, ms.m
         |        ORDER BY $encD ASC, cb.cid) AS rnk
         |    FROM res e CROSS JOIN range(0,4) ms(m) CROSS JOIN rcb cb)
         |  WHERE rnk = 1),
         |encp AS (
         |  SELECT vec_id,
         |    MAX(CASE WHEN m=0 THEN cid END) AS c0,
         |    MAX(CASE WHEN m=1 THEN cid END) AS c1,
         |    MAX(CASE WHEN m=2 THEN cid END) AS c2,
         |    MAX(CASE WHEN m=3 THEN cid END) AS c3
         |  FROM enc GROUP BY vec_id),
         |probe AS (
         |  SELECT vec_id, cell FROM crk
         |  WHERE rnk <= 2 AND vec_id % 50 = 0),
         |qres AS (
         |  SELECT q.vec_id, p.cell,
         |    list_transform(list_zip(q.embedding, c.embedding),
         |      p2 -> CAST(p2[1] AS DOUBLE) - CAST(p2[2] AS DOUBLE)) AS r
         |  FROM en q
         |  JOIN probe p ON p.vec_id = q.vec_id
         |  JOIN embeddings c ON c.vec_id = p.cell),
         |sc AS (
         |  SELECT qr.vec_id AS q_id, a.vec_id AS n_id, $dist AS dist
         |  FROM qres qr
         |  JOIN asg a ON a.cell = qr.cell AND a.vec_id <> qr.vec_id
         |  JOIN encp x ON x.vec_id = a.vec_id
         |  JOIN rcb b0 ON b0.cid = x.c0
         |  JOIN rcb b1 ON b1.cid = x.c1
         |  JOIN rcb b2 ON b2.cid = x.c2
         |  JOIN rcb b3 ON b3.cid = x.c3)
         |SELECT q_id, n_id, rnk, dist FROM (
         |  SELECT q_id, n_id, dist,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY dist ASC, n_id) AS rnk
         |  FROM sc)
         |WHERE rnk <= 3""".stripMargin
  }

  /** Continuation of [[oracle]] (split around the shared
    * [[sqlResidualServe]] mirror).
    */
  private lazy val oracleTail: Map[String, String] = Map(

    // MaxSim replay: 16/16 chunking (the t20 CTE pattern), per-chunk
    // hash embed (exact-integer sums), chunk-level cell assign/probe
    // (ties → centroid chunk_uid = doc_id·10⁶), candidate pairs from
    // the cell join, then max-per-(q,q_chunk,d) → floor(mc·1e12)
    // HUGEINT sums (order-free exact, = Spark's DECIMAL(38,0)) → rank
    "v32_maxsim_rerank" -> sqlMaxSimServeOver("e"),

    // the v43 live chunk set: %11 docs tombstoned; %7 docs hold only
    // their max-seq (seq-2) version — the even-index chunks with
    // reversed embeddings (nrm RE-computed over the reversed list,
    // the same fold order Spark's ingest pays); everything else the
    // insert set. Queries and centroids stay raw `e` rows — external
    // text and the frozen generation
    "v43_chunk_upsert_serve" -> sqlMaxSimServeOver("live",
      corpusCte = Some(s"""live AS (
         |  SELECT doc_id, chunk_idx, embedding,
         |    sqrt(${sqlDot("embedding", "embedding")}) AS nrm
         |  FROM (
         |    SELECT doc_id, chunk_idx,
         |      CASE WHEN doc_id % 7 = 0 THEN list_reverse(embedding)
         |           ELSE embedding END AS embedding
         |    FROM e
         |    WHERE doc_id % 11 <> 0
         |      AND (doc_id % 7 <> 0 OR chunk_idx % 2 = 0)))""".stripMargin)),

    // hash-embed replay: md5 token hash → (bucket, ±1 sign) → signed
    // tf sums per bucket (exact integers, so the GROUP BY and Spark's
    // map-side fold agree bit-for-bit), then the v15 multiprobe rank
    // CTEs over doc ids — every cosine the same strict double fold
    "v31_hashembed_knn" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |    unnest(list_filter(string_split(lower(text), ' '),
         |      x -> len(x) > 0)) AS w
         |  FROM documents),
         |hv AS (
         |  SELECT doc_id,
         |    CAST(('0x' || substr(md5(w), 1, 12)) AS BIGINT) AS h
         |  FROM tk),
         |sm AS (
         |  SELECT doc_id, h % 64 AS b,
         |    SUM(((h >> 47) & 1) * 2 - 1) AS s
         |  FROM hv GROUP BY doc_id, b),
         |ids AS (SELECT DISTINCT doc_id FROM tk),
         |grid AS (
         |  SELECT i.doc_id, r.b FROM ids i CROSS JOIN range(0, 64) r(b)),
         |emb AS (
         |  SELECT g.doc_id AS vec_id,
         |    list(CAST(COALESCE(s.s, 0) AS DOUBLE) ORDER BY g.b)
         |      AS embedding
         |  FROM grid g
         |  LEFT JOIN sm s ON s.doc_id = g.doc_id AND s.b = g.b
         |  GROUP BY g.doc_id),
         |e AS (
         |  SELECT vec_id, embedding,
         |    sqrt(${sqlDot("embedding", "embedding")}) AS nrm
         |  FROM emb
         |  WHERE sqrt(${sqlDot("embedding", "embedding")}) > 0),
         |cent AS (SELECT * FROM e WHERE vec_id < 8),
         |rk AS (
         |  SELECT v.vec_id, c.vec_id AS cell,
         |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
         |      ORDER BY ${sqlCos("v.embedding", "c.embedding", "v.nrm", "c.nrm")} DESC,
         |               c.vec_id) AS rnk
         |  FROM e v CROSS JOIN cent c),
         |asg AS (SELECT vec_id, cell FROM rk WHERE rnk = 1),
         |probe AS (
         |  SELECT vec_id, cell FROM rk
         |  WHERE rnk <= 2 AND vec_id % 50 = 0)
         |SELECT q_id, n_id, rnk, cos_sim FROM (
         |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
         |    ${sqlCos("q.embedding", "n.embedding", "q.nrm", "n.nrm")} AS cos_sim,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${sqlCos("q.embedding", "n.embedding", "q.nrm", "n.nrm")} DESC,
         |               n.vec_id) AS rnk
         |  FROM e q
         |  JOIN probe p ON p.vec_id = q.vec_id
         |  JOIN asg a ON a.cell = p.cell
         |  JOIN e n ON n.vec_id = a.vec_id AND n.vec_id <> q.vec_id
         |  WHERE q.vec_id % 50 = 0)
         |WHERE rnk <= 3""".stripMargin,

    // (m, k) PQ sweep: per config the sqlPqKnn CTE set generalized
    // (distinct prefixes), hits counted against the shared brute
    // top-3 CTE; counts BIGINT (the HUGEINT discipline), recall the
    // same double division as the Spark side
    "v28_pq_sweep" -> {
      val configs = Seq((2, 16), (4, 8), (4, 16), (8, 16))
      val legs = configs.zipWithIndex.map { case ((m, kc), i) =>
        (m, kc, sqlPqCfg(s"g$i", m, kc))
      }
      val summaries = legs.map { case (m, kc, (_, top)) =>
        s"""SELECT CAST($m AS INT) AS m, CAST($kc AS INT) AS k_codewords,
           |  CAST($m AS INT) AS bytes_per_vec,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_true,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM b t JOIN $top c
           |     ON c.q_id = t.q_id AND c.n_id = t.n_id) AS n_caught,
           |  CASE WHEN (SELECT COUNT(*) FROM b) > 0
           |    THEN CAST((SELECT COUNT(*) FROM b t JOIN $top c
           |                 ON c.q_id = t.q_id AND c.n_id = t.n_id)
           |         AS DOUBLE) / (SELECT CAST(COUNT(*) AS BIGINT) FROM b)
           |  END AS recall""".stripMargin
      }
      s"""WITH b AS (
         |${sqlKnn("q.vec_id <> c.vec_id")}
         |),
         |${legs.map(_._3._1).mkString(",\n")}
         |${summaries.mkString("\nUNION ALL\n")}""".stripMargin
    },

    // MRR/NDCG of the v26 serve vs the brute top-3: hits pivot into
    // per-rank flags (order-free MAX), the DCG is one fixed
    // left-assoc fold over discounts interpolated from the SAME
    // driver-computed doubles as the Spark side (shortest-decimal
    // round-trip is exact), so every float agrees bit-for-bit
    "v27_retrieval_eval" -> {
      val d = Similarity.dcgDiscounts(3)
      val p = d.scanLeft(0.0)(_ + _).tail
      val dcg = s"(CAST(h1 AS DOUBLE) * ${d(0)} + " +
        s"CAST(h2 AS DOUBLE) * ${d(1)}) + CAST(h3 AS DOUBLE) * ${d(2)}"
      s"""WITH tr AS (
         |${sqlKnn("q.vec_id <> c.vec_id")}
         |),
         |ap AS (
         |${sqlIvfPqServe()}
         |),
         |apd AS (
         |  SELECT q_id, n_id, MIN(rnk) AS rnk
         |  FROM ap GROUP BY q_id, n_id),
         |rel AS (
         |  SELECT t.q_id, a.rnk
         |  FROM tr t LEFT JOIN apd a
         |    ON a.q_id = t.q_id AND a.n_id = t.n_id),
         |pq AS (
         |  SELECT q_id,
         |    CAST(COUNT(*) AS BIGINT) AS n_rel,
         |    MIN(rnk) AS first_hit,
         |    MAX(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) AS h1,
         |    MAX(CASE WHEN rnk = 2 THEN 1 ELSE 0 END) AS h2,
         |    MAX(CASE WHEN rnk = 3 THEN 1 ELSE 0 END) AS h3
         |  FROM rel GROUP BY q_id)
         |SELECT q_id, n_rel,
         |  CASE WHEN first_hit <= 3
         |    THEN CAST(1.0 AS DOUBLE) / first_hit
         |    ELSE CAST(0.0 AS DOUBLE) END AS mrr,
         |  $dcg AS dcg,
         |  ($dcg) / (CASE LEAST(n_rel, 3)
         |    WHEN 1 THEN ${p(0)} WHEN 2 THEN ${p(1)}
         |    WHEN 3 THEN ${p(2)} END) AS ndcg
         |FROM pq""".stripMargin
    },

    // per-(label, pos) mean over floor(x·1e12)-quantized components —
    // floor instead of a decimal cast because odd-multiple-of-2⁻¹³
    // floats tie exactly at digit 13, where the engines' rounding
    // modes (HALF_UP vs HALF_EVEN) disagree; floor has no tie
    // centroid = v18's floor-quantized mean restricted to the label-0
    // seed (bit-equal to the collected literal on the Spark side);
    // score = the standard dot/norm fold against it. kept is a pure
    // function of the bit-equal score, so the gate replays exactly
    "v24_embed_quality" ->
      s"""WITH x AS (
         |  SELECT unnest(range(len(embedding))) AS pos,
         |    unnest(list_transform(embedding,
         |      v -> CAST(floor(CAST(v AS DOUBLE) * 1e12) AS DECIMAL(38,0)))) AS q
         |  FROM embeddings
         |  WHERE label = 0 AND embedding IS NOT NULL AND len(embedding) = 64),
         |m AS (
         |  SELECT pos, (CAST(SUM(q) AS DOUBLE) / COUNT(*)) / 1e12 AS m
         |  FROM x GROUP BY pos),
         |c AS (
         |  SELECT list(m ORDER BY pos) AS cent,
         |    sqrt(${sqlDot("list(m ORDER BY pos)", "list(m ORDER BY pos)")}) AS cn
         |  FROM m),
         |s AS (
         |  SELECT vec_id,
         |    ${sqlDot("e.embedding", "c.cent")}
         |      / nullif(sqrt(${sqlDot("e.embedding", "e.embedding")}) * c.cn, 0.0)
         |      AS cos
         |  FROM embeddings e CROSS JOIN c
         |  WHERE e.embedding IS NOT NULL AND len(e.embedding) = 64)
         |SELECT vec_id, cos, COALESCE(cos >= 0.1, FALSE) AS kept
         |FROM s""".stripMargin,

    "v18_mean_pool" ->
      """WITH x AS (
        |  SELECT label,
        |    unnest(range(len(embedding))) AS pos,
        |    unnest(list_transform(embedding,
        |      v -> CAST(floor(CAST(v AS DOUBLE) * 1e12) AS DECIMAL(38,0)))) AS q
        |  FROM embeddings
        |  WHERE embedding IS NOT NULL AND len(embedding) = 64),
        |m AS (
        |  SELECT label, CAST(pos AS INTEGER) AS pos,
        |    (CAST(SUM(q) AS DOUBLE) / COUNT(*)) / 1e12 AS m
        |  FROM x GROUP BY label, pos)
        |SELECT label, pos, m FROM m""".stripMargin,

    // seed leg = v9's mirror at k=10, refined leg = the one-round
    // Lloyd's mirror; both counted against the exact brute-force CTE
    "v17_pq_refined_recall" ->
      s"""WITH b AS (
         |${sqlKnn("q.vec_id <> c.vec_id", k = 10)}
         |),
         |s AS (
         |${sqlPqKnn(k = 10)}
         |),
         |r AS (
         |${sqlPqRefinedKnn(k = 10)}
         |)
         |SELECT b.q_id,
         |  CAST(COUNT(s.n_id) AS BIGINT) AS seed_hits,
         |  CAST(COUNT(r.n_id) AS BIGINT) AS refined_hits,
         |  CAST(COUNT(s.n_id) AS DOUBLE) / 10.0 AS seed_recall,
         |  CAST(COUNT(r.n_id) AS DOUBLE) / 10.0 AS refined_recall
         |FROM b
         |LEFT JOIN s ON s.q_id = b.q_id AND s.n_id = b.n_id
         |LEFT JOIN r ON r.q_id = b.q_id AND r.n_id = b.n_id
         |GROUP BY b.q_id""".stripMargin,

    "v12_knn_ivfpq" -> sqlPqKnn(cellPred = "q.label = ex.label"),

    // assignment = the v6 kmeans mirror verbatim (nested CTE); the
    // drop rule is a per-vector MIN over same-cell lower-id partners
    // within 0.3 cosine — the cosine fold is sqlCos, bit-identical
    "v10_semdedup" ->
      s"""WITH asg AS (
         |${sqlKmeans(iters = 1)}
         |),
         |e AS (
         |  SELECT vec_id, embedding, nrm FROM (
         |    SELECT vec_id, embedding,
         |      sqrt(${sqlDot("embedding", "embedding")}) AS nrm
         |    FROM embeddings)
         |  WHERE nrm > 0),
         |dup AS (
         |  SELECT x.vec_id AS x_id, MIN(y.vec_id) AS dup_of
         |  FROM asg ax JOIN asg ay ON ax.cell = ay.cell
         |  JOIN e x ON x.vec_id = ax.vec_id
         |  JOIN e y ON y.vec_id = ay.vec_id
         |  WHERE y.vec_id < x.vec_id
         |    AND ${sqlCos("x.embedding", "y.embedding", "x.nrm", "y.nrm")} >= 0.3
         |  GROUP BY x.vec_id)
         |SELECT a.vec_id, a.cell,
         |  CAST(COALESCE(d.dup_of, -1) AS BIGINT) AS dup_of
         |FROM asg a LEFT JOIN dup d ON d.x_id = a.vec_id""".stripMargin,

    // nprobe sweep: corpus assignment + probe ranking share one rk
    // CTE (the v15 mirror); per config, candidates = probe cells
    // joined to cell assignment, recall counted against the brute
    // top-3 CTE. Counts cast to BIGINT (the HUGEINT discipline).
    "v25_ivf_nprobe_sweep" -> sqlNprobeSweep,

    // the sweep wrapped in the planner's decision columns: target
    // verdict, min-meeting (or exhaustive-fallback) choice, scan
    // fraction against the full probe
    "v39_nprobe_plan" ->
      s"""WITH sw AS (
         |$sqlNprobeSweep
         |)
         |SELECT nprobe, n_candidates, n_true, n_caught, recall,
         |  recall >= 0.9 AS meets,
         |  nprobe = COALESCE(
         |    MIN(CASE WHEN recall >= 0.9 THEN nprobe END) OVER (),
         |    MAX(nprobe) OVER ()) AS chosen,
         |  CASE WHEN MAX(n_candidates) OVER () > 0
         |    THEN CAST(n_candidates AS DOUBLE) /
         |      CAST(MAX(n_candidates) OVER () AS DOUBLE) END
         |    AS scan_frac
         |FROM sw""".stripMargin,

    // recall@3: both knn mirrors nested as CTEs, counted per query
    "v11_ann_recall" ->
      s"""WITH b AS (
         |${sqlKnn("q.vec_id <> c.vec_id")}
         |),
         |i AS (
         |${sqlKnn("q.label = c.label AND q.vec_id <> c.vec_id")}
         |)
         |SELECT b.q_id,
         |  CAST(COUNT(i.n_id) AS BIGINT) AS hit_ct,
         |  CAST(COUNT(i.n_id) AS DOUBLE) / 3.0 AS recall
         |FROM b LEFT JOIN i ON i.q_id = b.q_id AND i.n_id = b.n_id
         |GROUP BY b.q_id""".stripMargin,

    // max(struct(cos, -cid)) ≡ QUALIFY ROW_NUMBER() ORDER BY cos DESC,
    // c_id — cosines are bit-identical (strict fold), so the argmax row
    // is the same on both engines
    "v5_cell_assign" ->
      s"""WITH e AS ($sqlWithNorm)
         |SELECT vec_id, cell, cell_cos FROM (
         |  SELECT v.vec_id, c.vec_id AS cell,
         |    ${sqlCos("v.embedding", "c.embedding", "v.nrm", "c.nrm")} AS cell_cos,
         |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
         |      ORDER BY ${sqlCos("v.embedding", "c.embedding", "v.nrm", "c.nrm")} DESC,
         |               c.vec_id) AS rnk
         |  FROM e v CROSS JOIN (SELECT * FROM e WHERE vec_id < 8) c)
         |WHERE rnk = 1""".stripMargin,

    "v4_knn_lsh" ->
      s"""WITH e0 AS ($sqlWithNorm),
         |sg AS ($sqlLshSig),
         |e AS (SELECT e0.*, sg.sig FROM e0 JOIN sg USING (vec_id))
         |SELECT q_id, n_id, rnk, cos_sim FROM (
         |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |    ${sqlCos("q.embedding", "c.embedding", "q.nrm", "c.nrm")} AS cos_sim,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${sqlCos("q.embedding", "c.embedding", "q.nrm", "c.nrm")} DESC,
         |               c.vec_id) AS rnk
         |  FROM e q JOIN e c ON q.sig = c.sig AND q.vec_id <> c.vec_id
         |  WHERE q.vec_id % 50 = 0)
         |WHERE rnk <= 3""".stripMargin,

    "v3_embedding_neardup" ->
      s"""WITH e AS ($sqlWithNorm)
         |SELECT vec_a, vec_b, cos_sim FROM (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    ${sqlCos("a.embedding", "b.embedding", "a.nrm", "b.nrm")} AS cos_sim
         |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
         |WHERE cos_sim >= 0.3""".stripMargin,

    // transitive closure of the v3 pair graph: min reachable id per
    // node via a recursive CTE (the d6 oracle pattern on the embedding
    // side; Spark uses log-round pointer jumping — same fixpoint)
    "v19_embed_clusters" ->
      s"""WITH RECURSIVE e AS ($sqlWithNorm),
         |pairs AS (
         |  SELECT vec_a, vec_b FROM (
         |    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |      ${sqlCos("a.embedding", "b.embedding", "a.nrm", "b.nrm")} AS cos_sim
         |    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
         |  WHERE cos_sim >= 0.3),
         |edges AS (
         |  SELECT vec_a AS src, vec_b AS dst FROM pairs
         |  UNION
         |  SELECT vec_b, vec_a FROM pairs),
         |reach(id, comp) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT ed.dst, r.comp FROM reach r JOIN edges ed ON ed.src = r.id)
         |SELECT id AS vec_id, MIN(comp) AS cluster_id
         |FROM reach GROUP BY id""".stripMargin
  )

  // dev-profiling accessors (tools/ProfileMaxSim) — not query surface
  private[graft] def profileChunkEmbeds(s: SparkSession, dir: String) =
    chunkEmbeds(s, dir)
  private[graft] def profileMaxSimIdx(s: SparkSession, dir: String) =
    maxSimIdx(s, dir)
  private[graft] def profileMaxSimUpsertIdx(s: SparkSession, dir: String) =
    maxSimUpsertIdx(s, dir)
}

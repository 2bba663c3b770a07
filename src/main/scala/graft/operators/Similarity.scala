package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, mirroring a production ANN stack:
  *  - [[bruteForceKnn]]: exact cosine top-k of a (small) query set
  *    against the full corpus — the correctness baseline. Cost is
  *    |Q|×|corpus|; the query side is broadcast so the corpus is
  *    streamed once with no shuffle.
  *  - [[ivfKnn]]: IVF-style search that probes only the query's
  *    coarse cell (here the `label` column stands in for a k-means
  *    centroid assignment, which at 100 TB would be precomputed the
  *    same way). Turns the cross product into an equi-join on the
  *    cell id — the scale path.
  *
  * Cosine is computed with sequential-fold `aggregate` over
  * `zip_with` products in double precision: float×float is exact in
  * double and the fold order is the array order, so values are
  * bit-reproducible across engines (the DuckDB oracle mirrors it with
  * `list_reduce`).
  */
object Similarity {

  /** Σ aᵢ·bᵢ as a strict left fold in double — a codegen'd native
    * expression (see [[graft.functions.VecDot]]); bit-identical to the
    * HOF formulation `aggregate(zip_with(a,b,_*_), 0.0, _+_)` it
    * replaces, at a fraction of the per-pair cost.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine with a zero-norm guard: a zero vector (failed encode,
    * padding row) yields null instead of a fatal ANSI DIVIDE_BY_ZERO.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** Feature-hashing text embedder — the "hashing trick" (Weinberger
    * et al., ICML '09; Vowpal Wabbit's input layer): each token hashes
    * to one of `dims` buckets with a ±1 sign drawn from an independent
    * hash bit, and the document's vector is the per-bucket signed
    * term-frequency sum. No vocabulary, no model, no shuffle: the
    * whole embedding is ONE map-side projection over the text column
    * (token hash = the repo's md5 discipline, so the oracle replays
    * every component bit-for-bit), which makes it the text→vector
    * bridge for the ANN family — a corpus with no external embedding
    * model can still flow through [[indexCells]]/[[ivfMultiprobeKnn]],
    * and at 100 TB the embed rides the ingest scan for free.
    *
    * Components are exact small integers (±1 sums) carried as doubles,
    * so dot/norm folds agree bit-for-bit across engines. A document
    * with no tokens embeds to the zero vector (cosine against it is
    * null by the [[cosine]] guard) — ANN callers filter empty docs.
    * Cost is O(dims × tokens) adds per row after one md5 per token;
    * `dims` beyond ~256 wants the (bucket, sign) pairs routed through
    * a groupBy instead — at that width the per-row fold's constant
    * beats the exchange it avoids.
    */
  def hashEmbed(docs: DataFrame, dims: Int = 64,
                idCol: String = "doc_id",
                textCol: String = "text",
                carryCols: Seq[String] = Nil): DataFrame = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    val toks = graft.functions.TextFunctions.tokenize(lower(col(textCol)))
    // one md5 per token: hash once in the transform, fold the compact
    // (bucket, sign) pairs after
    val hs = transform(toks, t => {
      val h = conv(substring(md5(t), 1, 12), 16, 10).cast(LongType)
      struct((h % dims).cast(IntegerType).as("b"),
        ((shiftright(h, 47).bitwiseAND(lit(1L))) * 2 - 1)
          .cast(DoubleType).as("s"))
    })
    val zeros = array_repeat(lit(0.0), lit(dims))
    val emb = aggregate(hs, zeros, (acc, p) =>
      transform(acc, (v, i) =>
        v + when(p.getField("b") === i, p.getField("s")).otherwise(lit(0.0))))
    docs.select(col(idCol) +: carryCols.map(col) :+ emb.as("embedding"): _*)
  }

  /** Exact top-k neighbors for each query vector.
    *
    * @param corpus  (id, vec) rows
    * @param queries (id, vec) rows — expected small; broadcast.
    */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    // norms materialize once per side — cosine per pair is then a single
    // dot fold plus one divide, not three folds
    val q = broadcast(queries.select(col(idCol).as("q_id"),
      col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_nrm")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      norm(col(vecCol)).as("n_nrm"))
    rank(q.crossJoin(c).filter(col("q_id") =!= col("n_id")), k)
  }

  /** Deterministic ±1 random hyperplanes for cosine LSH: the sign of
    * plane p, dim d is the parity of the first hex digit of
    * md5("p:d") — reproducible by any engine with md5 (the DuckDB
    * oracle derives the identical planes in SQL).
    */
  def hyperplanes(numPlanes: Int, dims: Int): Seq[Seq[Double]] =
    (0 until numPlanes).map { p =>
      (0 until dims).map { d =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$p:$d".getBytes("UTF-8"))
        if (((h(0) >> 4) & 0xf) % 2 == 0) 1.0 else -1.0
      }
    }

  /** Random-hyperplane signature: bit p set iff dot(vec, plane_p) > 0.
    * Map-side only — numPlanes codegen'd dot folds per row, no joins,
    * no shuffle; vectors in the same bucket are cosine-close with
    * probability rising in shared bits.
    */
  def lshSignature(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (h, p) =>
      when(dot(vec, typedLit(h)) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed ANN: candidates share the query's full signature
    * (probe-1). The scale shape matches [[ivfKnn]] — an equi-join on
    * the bucket key instead of a cross product — but needs no
    * precomputed cell assignment: the signature is derived from the
    * vector itself at scan time.
    */
  def lshKnn(corpus: DataFrame, queries: DataFrame, k: Int,
             numPlanes: Int = 8, dims: Int = 64,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    val planes = hyperplanes(numPlanes, dims)
    val q = broadcast(queries.select(col(idCol).as("q_id"),
      col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_nrm"),
      lshSignature(col(vecCol), planes).as("q_sig")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      norm(col(vecCol)).as("n_nrm"),
      lshSignature(col(vecCol), planes).as("n_sig"))
    rank(q.join(c, col("q_sig") === col("n_sig") &&
      col("q_id") =!= col("n_id")), k)
  }

  /** Sign-bit binary signature: bit d is set iff vec[d] > 0, packed
    * into one BIGINT (dims ≤ 64 — the harness embeddings are 64-d; a
    * wider model packs into an array of longs the same way). The
    * classic 32× storage cut of binary quantization: a 64-float vector
    * becomes 8 bytes, and Hamming distance over the packs is a single
    * `bit_count(xor)` — one codegen'd ALU op per comparison instead of
    * a 64-element float fold. Comparisons (`> 0`) are exact, so any
    * engine derives the identical signature (the DuckDB oracle mirrors
    * this with `list_sum`/`<<`).
    */
  def signBits(vec: Column): Column = {
    val packed = aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (v, i) => when(v > lit(0), call_function("shiftleft", lit(1L), i))
          .otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
    // fail fast on wide vectors: shiftleft wraps its shift amount mod
    // 64, so dims > 64 would alias onto low bits and the additive fold
    // would carry — silently corrupt signatures, wrong kNN results.
    // A null OR EMPTY vector yields null (filtered by every consumer) —
    // null must not trip the guard, and empty must not pack to 0L:
    // sequence(0, -1) counts DOWN (the resample:94 hazard), zip_with
    // null-pads, and the fold would emit a fake all-zero signature
    // where the DuckDB mirror's list_sum over an empty list is NULL
    when(vec.isNull || size(vec) === 0, lit(null).cast(LongType))
      .when(size(vec) <= 64, packed)
      .otherwise(raise_error(concat(
        lit("signBits packs at most 64 dims into one long, got "),
        size(vec).cast(StringType))).cast(LongType))
  }

  /** Binary-quantized kNN: scan sign signatures (8 bytes/vector) for
    * the Hamming top-`rerank` candidates per query, then rerank just
    * those with exact cosine and keep top-`k`.
    *
    * The scale story is the two-phase read: the Hamming scan touches a
    * 16-byte (id, sig) projection of the corpus — column pruning keeps
    * the 100 TB of float vectors out of the scan entirely — and only
    * |Q|×rerank candidate rows join back (broadcast, corpus-side scan
    * prunes to (id, vec)) to fetch full vectors for the rerank. Both
    * windows partition by q_id, so no global sort anywhere.
    */
  def hammingKnn(corpus: DataFrame, queries: DataFrame, k: Int,
                 rerank: Int = 10,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qSig = broadcast(queries
      .select(col(idCol).as("q_id"), signBits(col(vecCol)).as("q_sig"))
      .filter(col("q_sig").isNotNull))
    val cSig = corpus
      .select(col(idCol).as("n_id"), signBits(col(vecCol)).as("n_sig"))
      .filter(col("n_sig").isNotNull)
    val wHam = Window.partitionBy(col("q_id"))
      .orderBy(col("hamming"), col("n_id"))
    val cand = qSig.crossJoin(cSig)
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("hamming",
        call_function("bit_count",
          col("q_sig").bitwiseXOR(col("n_sig"))).cast(IntegerType))
      .withColumn("h_rnk", row_number().over(wHam))
      .filter(col("h_rnk") <= rerank)
      .select("q_id", "n_id", "hamming")
    val qFull = broadcast(queries.select(col(idCol).as("q_id"),
      col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_nrm")))
    val cFull = corpus.select(col(idCol).as("n_id"),
      col(vecCol).as("n_vec"), norm(col(vecCol)).as("n_nrm"))
    val wCos = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("n_id"))
    broadcast(cand).join(cFull, "n_id").join(qFull, "q_id")
      .withColumn("cos_sim",
        dot(col("q_vec"), col("n_vec")) /
          nullif(col("q_nrm") * col("n_nrm"), lit(0.0)))
      .withColumn("rnk", row_number().over(wCos))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("rnk"), col("hamming"),
        col("cos_sim"))
  }

  /** Distributed coarse-cell assignment — the k-means "assign" step
    * that produces an IVF cell column: each vector goes to the
    * highest-cosine centroid (ties → lowest centroid id). Centroids
    * broadcast; the corpus streams through one codegen'd projection +
    * a partial-aggregatable max(struct(cos, -cid)) — no shuffle of
    * vectors, no window sort. Iterating Lloyd's = re-aggregating
    * means over this assignment; one assignment pass is what IVF
    * search needs at ingest time.
    */
  def assignCells(corpus: DataFrame, centroids: DataFrame,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    val c = broadcast(centroids.select(col(idCol).as("c_id"),
      col(vecCol).as("c_vec"), norm(col(vecCol)).as("c_nrm")))
    corpus.select(col(idCol), col(vecCol), norm(col(vecCol)).as("nrm"))
      .crossJoin(c)
      .select(col(idCol),
        (dot(col(vecCol), col("c_vec")) /
          nullif(col("nrm") * col("c_nrm"), lit(0.0))).as("cos"),
        col("c_id"))
      .groupBy(col(idCol))
      .agg(max(struct(col("cos"), (-col("c_id")).as("neg_id"))).as("best"))
      .select(col(idCol), (-col("best.neg_id")).as("cell"),
        col("best.cos").as("cell_cos"))
  }

  /** Contrastive hard-negative mining: for each query vector, the
    * top-k highest-cosine corpus vectors with a DIFFERENT label — the
    * "confusable but wrong" examples an embedding model trains
    * against (triplet/InfoNCE negatives). Exhaustive scan with the
    * query set broadcast — the offline mining shape; at 100 TB the
    * corpus scan swaps for an ANN candidate set ([[ivfKnn]] over
    * neighboring cells / [[lshKnn]]) with the same label-mismatch
    * filter and rank, unchanged output contract.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
                    labelCol: String = "label",
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"),
      col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_nrm"),
      col(labelCol).as("q_lbl")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      norm(col(vecCol)).as("n_nrm"), col(labelCol).as("n_lbl"))
    // label mismatch subsumes self-exclusion
    rank(q.crossJoin(c).filter(col("q_lbl") =!= col("n_lbl")), k)
  }

  /** IVF probe-1 search: only candidates in the query's coarse cell. */
  /** Filtered (metadata-constrained) kNN — the vector-serving staple
    * "nearest neighbors WHERE <predicate>": the predicate restricts
    * the candidate corpus BEFORE ranking, so every query still gets
    * exactly k admissible matches. (Post-filtering a plain top-k — the
    * tempting composition — silently returns < k whenever the
    * predicate is selective, the classic filtered-ANN pitfall; that's
    * why this is an operator and not a caller-side `.filter` on the
    * result.) Exact pre-filter baseline; the serving-path composition
    * is identical on the bucketed legs — filter the corpus side
    * before [[ivfKnn]]/[[pqKnn]] cell assignment and the candidate
    * join shrinks with the predicate instead of reranking inadmissible
    * rows.
    */
  def filteredKnn(corpus: DataFrame, queries: DataFrame,
                  predicate: Column, k: Int,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame =
    bruteForceKnn(corpus.filter(predicate), queries, k, idCol, vecCol)

  def ivfKnn(corpus: DataFrame, queries: DataFrame, k: Int,
             cellCol: String = "label", idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"),
      col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_nrm"),
      col(cellCol).as("q_cell")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      norm(col(vecCol)).as("n_nrm"), col(cellCol).as("n_cell"))
    rank(q.join(c, col("q_cell") === col("n_cell") &&
      col("q_id") =!= col("n_id")), k)
  }

  /** Multiprobe IVF search: each query probes its `nprobe` highest-
    * cosine cells instead of only the nearest — the standard recall
    * lever for IVF (cells are Voronoi regions; a query near a boundary
    * has true neighbors in the runner-up cell, which probe-1 misses
    * by construction). Corpus cells come from [[assignCells]] over the
    * same centroids, so candidate generation stays an equi-join on the
    * cell id — the probe multiplier applies to the broadcast query
    * side only, never the corpus. At 100 TB the corpus assignment is
    * precomputed at ingest (one scan, materialized like v2's `label`);
    * the per-query probe ranking costs |Q|×k centroid folds.
    */
  def ivfMultiprobeKnn(corpus: DataFrame, queries: DataFrame,
                       centroids: DataFrame, k: Int, nprobe: Int,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame =
    // maxInlineCentroids = 0: this convenience FUSES build and serve
    // into one plan, and the literal-centroid ingest projection fused
    // into the probe join measured 2× slower than the assignCells
    // equi-join (the giant literal expression lands in the join
    // stage's codegen). A deployment stages indexCells and serves via
    // [[ivfMultiprobeKnnIndexed]], where the inline build never
    // shares a stage with the serve.
    ivfMultiprobeKnnIndexed(indexCells(corpus, centroids, idCol, vecCol,
        maxInlineCentroids = 0),
      queries, centroids, k, nprobe, idCol, vecCol)

  /** The (id, vector, nrm, cell) INDEX rows an IVF deployment stages
    * at ingest: one row per corpus vector with its precomputed norm
    * and its one cell under `centroids`. This is what
    * [[ivfMultiprobeKnn]] builds inline, what
    * [[graft.streaming.ScoringStreaming.cellIndexStream]] maintains
    * incrementally per micro-batch, and what
    * [[ivfMultiprobeKnnIndexed]] serves — one schema across the
    * batch-build, stream-maintain, and serve paths.
    *
    * With `codebook` set, each row also carries its PQ `codes`
    * ([[pqEncode]], m codeword ids) — the IVF-PQ ingest shape: the
    * compressed representation is computed once at index time and
    * [[pqScoreCodes]] serves it without ever touching raw vectors.
    *
    * Ingest is ONE corpus projection when the centroid set is small
    * (the common IVF case, and the only case where literal-centroid
    * codegen stays compact): norms, codes, and the cell all compute
    * map-side against literal centroids — no corpus shuffle, no
    * self-join. `take(maxInlineCentroids + 1)` proves the set fits
    * (one extra row back means it doesn't), and a larger codebook
    * falls back to the [[assignCells]] equi-join, which carries
    * centroids as data. Both paths produce bit-identical cells:
    * [[graft.functions.VecDot]] promotes every element to double
    * before multiplying, so a float centroid column and its exact
    * double literal score identically, and ties break to the lowest
    * centroid id either way.
    */
  /** @param carryCols metadata columns that ride the index row —
    * the filtered-ANN deployment shape: a serve-time predicate
    * (`index.filter(meta)`) then PUSHES DOWN to the staged index's
    * parquet scan instead of joining a corpus-sized metadata table
    * per query batch. Carried columns must be row-local metadata of
    * the corpus frame. (A CHANGELOG with repeated ids uses
    * [[indexChangelog]], which keys its fallback join on (id, seq) —
    * this builder's fallback joins on `idCol` alone.)
    */
  def indexCells(corpus: DataFrame, centroids: DataFrame,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding",
                 codebook: Option[PqCodebook] = None,
                 maxInlineCentroids: Int = 64,
                 carryCols: Seq[String] = Nil): DataFrame = {
    val base0 = corpus
      .select(Seq(col(idCol), col(vecCol)) ++ carryCols.map(col) :+
        norm(col(vecCol)).as("nrm"): _*)
    val base = codebook.fold(base0)(cb =>
      base0.withColumn("codes", pqEncode(col(vecCol), cb)))
    inlineCellColumn(base, centroids, idCol, vecCol, maxInlineCentroids)
      .getOrElse(
        base.join(assignCells(corpus, centroids, idCol, vecCol)
          .select(col(idCol), col("cell")), Seq(idCol)))
  }

  /** The inline-centroid half of [[indexCells]], factored out so
    * [[indexChangelog]] shares it: Some(df + `cell`) — a pure map-side
    * projection against literal centroids — when the centroid set fits
    * `maxInlineCentroids`, None when it doesn't (callers fall back to
    * the [[assignCells]] equi-join). `df` must already carry the
    * vector's `nrm` column (the cosine denominator). Works row-wise,
    * so duplicate ids (a changelog with updates) are fine here — only
    * the join fallback needs a unique key.
    *
    * `maxInlineCentroids <= 0` short-circuits to None WITHOUT running
    * the `take` probe: the forced-join path stays fully lazy (a
    * DataFrame-construction-time Spark job inside a per-micro-batch
    * body would fire once per batch for nothing).
    */
  private def inlineCellColumn(df: DataFrame, centroids: DataFrame,
                               idCol: String, vecCol: String,
                               maxInlineCentroids: Int)
      : Option[DataFrame] = {
    if (maxInlineCentroids <= 0) return None
    val probe = centroids
      .select(col(idCol).cast("long"), col(vecCol))
      .take(maxInlineCentroids + 1)
    if (probe.nonEmpty && probe.length <= maxInlineCentroids) {
      val scored = probe.toSeq.map { r =>
        val cid = r.getLong(0)
        val cv: Seq[Double] = r.getSeq[Any](1).map {
          case f: Float => f.toDouble
          case d: Double => d
        }
        // driver-side strict left fold: same op order as norm()'s
        // codegen fold (the argmaxCell discipline)
        val cn = math.sqrt(cv.foldLeft(0.0)((a, x) => a + x * x))
        struct(
          (dot(col(vecCol), typedLit(cv)) /
            nullif(col("nrm") * lit(cn), lit(0.0))).as("cos"),
          lit(-cid).as("neg_id"))
      }
      val best = if (scored.size == 1) scored.head else greatest(scored: _*)
      Some(df.withColumn("cell", -best.getField("neg_id")))
    } else None
  }

  /** The CHANGELOG form of [[indexCells]] — the missing half of a
    * maintained ANN index: a real serving corpus doesn't only grow, it
    * takes vector UPDATES and DELETES (the reference's own dim
    * pipeline propagates updates — `utils/DimUtil.java:52-60`). Input
    * is an op-carrying vector feed (`idCol`, `vecCol`, `opCol`,
    * `seqCol`) where `seqCol` sequences changes per id (unique per
    * (id, seq) — a CDC change position). Output is one INDEX row per
    * change row:
    *  - non-delete ops get the full [[indexCells]] treatment — norm,
    *    cell, and (with `codebook`) PQ codes, all paid at INGEST so a
    *    serve never touches raw math;
    *  - deletes become TOMBSTONE rows (null vector/nrm/codes/cell,
    *    op preserved) — storage keeps them so any replay or
    *    compaction window still knows the key ended deleted
    *    ([[graft.sources.CdcRouter.compactChangelog]] keeps them for
    *    exactly this reason; the serve-time read drops them).
    *
    * Serving reads [[latestIndexState]] over these rows: last change
    * per id wins, tombstones excluded. Because every index column is
    * a pure per-row function of the vector, indexing-then-resolving
    * equals resolving-then-indexing: `latestIndexState(
    * indexChangelog(feed))` ≡ `indexCells(latestState(feed))`
    * bit-for-bit (spec-pinned under stream slicing + kill/restart).
    *
    * Scale shape: the live half is the same map-side literal-centroid
    * projection as [[indexCells]] (no shuffle); above
    * `maxInlineCentroids` the fallback equi-join keys on a synthetic
    * (id, seq) composite — a changelog repeats ids, so the plain
    * id-keyed [[assignCells]] join would fan out update×insert rows.
    */
  def indexChangelog(feed: DataFrame, centroids: DataFrame,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding",
                     opCol: String = "op", seqCol: String = "seq",
                     deleteOp: String = "delete",
                     codebook: Option[PqCodebook] = None,
                     maxInlineCentroids: Int = 64,
                     carryCols: Seq[String] = Nil): DataFrame = {
    val keep = Seq(col(idCol), col(vecCol), col(opCol), col(seqCol)) ++
      carryCols.map(col)
    val live0 = feed.filter(!(col(opCol) <=> deleteOp))
      .select(keep :+ norm(col(vecCol)).as("nrm"): _*)
    val live1 = codebook.fold(live0)(cb =>
      live0.withColumn("codes", pqEncode(col(vecCol), cb)))
    val live = inlineCellColumn(live1, centroids, idCol, vecCol,
        maxInlineCentroids)
      .getOrElse {
        // composite-keyed assignment: ids repeat across a key's change
        // history, (id, seq) is unique by contract
        val ck = concat_ws(":", col(idCol).cast("string"),
          col(seqCol).cast("string"))
        val asg = assignCells(
          feed.filter(!(col(opCol) <=> deleteOp))
            .select(ck.as(idCol), col(vecCol)),
          centroids, idCol, vecCol)
          .select(col(idCol).as("_ck"), col("cell"))
        live1.withColumn("_ck", ck).join(asg, "_ck").drop("_ck")
      }
    val codesType = codebook.map(_ =>
      live.schema("codes").dataType).getOrElse(NullType)
    val deadCols = Seq(col(idCol),
        lit(null).cast(feed.schema(vecCol).dataType).as(vecCol),
        col(opCol), col(seqCol)) ++ carryCols.map(col) ++
      Seq(lit(null).cast(DoubleType).as("nrm")) ++
      codebook.map(_ => lit(null).cast(codesType).as("codes")).toSeq :+
      lit(null).cast(LongType).as("cell")
    val dead = feed.filter(col(opCol) <=> deleteOp).select(deadCols: _*)
    live.unionByName(dead)
  }

  /** Serve-time resolution of an [[indexChangelog]] frame: the LATEST
    * index row per id with delete tombstones excluded — exactly
    * [[graft.sources.CdcRouter.latestState]] on (`idCol`) ordered by
    * `seqCol` (one partial-aggregatable max-struct — the shuffle
    * carries ≤ |keys| rows, never the changelog). The result is
    * serve-ready [[indexCells]] rows (plus the op/seq audit columns,
    * which every serve path ignores by selecting its columns by name):
    * feed it straight to [[ivfMultiprobeKnnIndexed]] /
    * [[pqScoreCodesIndexed]].
    */
  def latestIndexState(changelog: DataFrame,
                       idCol: String = "vec_id", seqCol: String = "seq",
                       opCol: String = "op",
                       deleteOp: String = "delete"): DataFrame =
    graft.sources.CdcRouter.latestState(changelog, Seq(idCol),
      Seq(seqCol), opCol, deleteOp)

  /** The max-seq CHANGE row per id with tombstones KEPT — the
    * generation seed of an upsert-index retrain
    * ([[graft.streaming.ScoringStreaming
    * .upsertCellIndexStreamWithRetrain]]): [[latestIndexState]] drops
    * delete rows (right for serving), but a seed without the
    * tombstone would let a late-arriving update with a LOWER seq than
    * the delete resurrect the id in the new generation — the single-
    * generation resolve would have kept it dead. Same max-struct
    * shape as the resolve: partial-aggregatable, shuffle ≤ |keys|.
    */
  def latestIndexChange(changelog: DataFrame,
                        idCol: String = "vec_id",
                        seqCol: String = "seq"): DataFrame = {
    val payload = changelog.columns.toSeq
      .filterNot(c => c == idCol || c == seqCol)
    changelog.filter(col(seqCol).isNotNull)
      .groupBy(col(idCol))
      .agg(max(struct((seqCol +: payload).map(col): _*)).as("_l"))
      .select(col(idCol) +:
        (seqCol +: payload).map(c => col(s"_l.$c").as(c)): _*)
  }

  /** Serve-time resolution of a SET-VALUED changelog — the chunk
    * index's upsert semantics (a ColBERT-style index keys chunks, but
    * the unit of CHANGE is the document): an update delivers the
    * doc's entire NEW chunk set (n rows, one seq), a delete delivers
    * one doc-level tombstone, and the live state is ALL rows of each
    * doc's max-seq version — so an edit that shrinks a doc from 9
    * chunks to 4 drops the other 5 without ever naming them. This is
    * why [[latestIndexState]]'s max-struct cannot serve here: a
    * version is a row SET, not a row, so the resolve is a per-doc
    * max-seq window + an (doc, seq) equality filter — ONE shuffle on
    * `docCol` carrying the changelog (irreducible: every surviving
    * row must learn its doc's max seq; the snapshot fold
    * ([[graft.operators.Dedup.snapshotIndex]]'s algebra, with this
    * resolve) keeps that history short). Tombstones excluded like
    * every serve read; a late lower-seq set stays dead because the
    * doc's max seq is the tombstone's.
    */
  def latestChunkState(changelog: DataFrame, docCol: String = "doc_id",
                       seqCol: String = "seq", opCol: String = "op",
                       deleteOp: String = "delete"): DataFrame =
    latestChunkChange(changelog, docCol, seqCol)
      .filter(!(col(opCol) <=> deleteOp))

  /** The max-seq VERSION (row set) per doc with tombstones KEPT —
    * [[latestIndexChange]]'s set-valued twin, and for the same
    * reason: a snapshot fold of a chunk changelog must keep the
    * doc-level tombstone, or a late lower-seq chunk set arriving
    * after the fold would resurrect the doc. Same single shuffle on
    * `docCol` as [[latestChunkState]].
    */
  def latestChunkChange(changelog: DataFrame,
                        docCol: String = "doc_id",
                        seqCol: String = "seq"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(docCol))
    changelog
      .withColumn("_max_seq", max(col(seqCol)).over(w))
      .filter(col(seqCol) === col("_max_seq"))
      .drop("_max_seq")
  }

  /** A codebook RELEASE — the index-lifecycle event the maintenance
    * loops deliberately defer: [[graft.streaming.ScoringStreaming
    * .upsertCellIndexStreamWithRetrain]] retrains coarse CENTROIDS
    * but freezes the PQ codebook across generations (the FAISS
    * convention: incremental maintenance must not silently change
    * what stored codes MEAN), so after enough update churn the
    * codebook was trained on a corpus that no longer exists. A
    * release is the batch event that fixes it: resolve the changelog
    * to its live state ([[latestIndexState]] — tombstoned ids must
    * not train codewords), train a NEW codebook on that corpus
    * ([[pqCodebook]]'s deterministic seed so the oracle can replay
    * it; swap in [[pqCodebookRefined]] for Lloyd's refinement), and
    * RE-ENCODE every live row against it. Returns the serve-ready
    * index and the new codebook — publish both as one generation
    * (the `_centroids`-beside-index discipline of the retrain loop);
    * coarse centroids stay the caller's, isolating the release from
    * the recenter event. Full re-encode is the honest cost: one
    * map-side pass over |live| rows, a corpus-release artifact, not
    * a per-batch job.
    */
  def releaseIndex(changelog: DataFrame, centroids: DataFrame,
                   m: Int, k: Int, idCol: String = "vec_id",
                   vecCol: String = "embedding",
                   opCol: String = "op", seqCol: String = "seq",
                   deleteOp: String = "delete",
                   train: (DataFrame, Int, Int) => PqCodebook = null)
      : (DataFrame, PqCodebook) = {
    val live = latestIndexState(changelog, idCol, seqCol, opCol,
      deleteOp).select(col(idCol), col(vecCol))
    val cb = Option(train).getOrElse(
      (c: DataFrame, mm: Int, kk: Int) =>
        pqCodebook(c, mm, kk, idCol, vecCol)).apply(live, m, k)
    (indexCells(live, centroids, idCol, vecCol, Some(cb)), cb)
  }

  /** [[ivfMultiprobeKnn]] over a PRE-ASSIGNED corpus index
    * ([[indexCells]] rows, however they were materialized — a staged
    * artifact or the stream-maintained parquet dir served by
    * [[graft.streaming.ScoringStreaming.servedCellIndex]]): the
    * corpus-side cell assignment and norms were paid at INGEST, so a
    * serve touches the index only through the probe-cell equi-join —
    * the corpus never shuffles and is never re-assigned per query
    * batch.
    */
  def ivfMultiprobeKnnIndexed(index: DataFrame, queries: DataFrame,
                              centroids: DataFrame, k: Int, nprobe: Int,
                              idCol: String = "vec_id",
                              vecCol: String = "embedding"): DataFrame = {
    val c = index.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      col("nrm").as("n_nrm"), col("cell").as("n_cell"))
    val q = broadcast(probeCells(queries, centroids, nprobe, idCol,
      vecCol))
    // a corpus vector lives in exactly one cell and probe cells are
    // distinct, so no candidate surfaces twice
    rank(q.join(c, col("q_cell") === col("n_cell") &&
      col("q_id") =!= col("n_id")), k)
  }

  /** The per-query probe set behind [[ivfMultiprobeKnn]], exposed so
    * an nprobe SWEEP (v25) can price each config's candidate volume
    * from the same ranking the search runs: one row per (query,
    * probe cell) — (q_id, q_vec, q_nrm, q_cell), the query's `nprobe`
    * highest-cosine centroids, ties to the lowest centroid id
    * (matching [[assignCells]]). Query-side only and broadcast-sized:
    * |Q|×|centroids| cosines, never a corpus touch.
    */
  def probeCells(queries: DataFrame, centroids: DataFrame, nprobe: Int,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame =
    probeCellsRanked(queries, centroids, nprobe, idCol, vecCol)
      .drop("probe_rank")

  /** [[probeCells]] with the probe RANK retained (`probe_rank`,
    * 1-based, 1 = the query's best cell): a sweep prices EVERY
    * nprobe ≤ the max in one pass — rank ≤ np reproduces the np-probe
    * set exactly, so one ranked frame + one conditional aggregate
    * replaces per-config probe/join/count replays (v25's four union
    * legs each re-ran the probe window and the cell join before this).
    */
  def probeCellsRanked(queries: DataFrame, centroids: DataFrame,
                       nprobe: Int, idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    import org.apache.spark.sql.expressions.Window
    val cc = broadcast(centroids.select(col(idCol).as("c_id"),
      col(vecCol).as("c_vec"), norm(col(vecCol)).as("c_nrm")))
    val scoredQ = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        norm(col(vecCol)).as("q_nrm"))
      .crossJoin(cc)
      .select(col("q_id"), col("q_vec"), col("q_nrm"),
        (dot(col("q_vec"), col("c_vec")) /
          nullif(col("q_nrm") * col("c_nrm"), lit(0.0))).as("ccos"),
        col("c_id"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("ccos").desc, col("c_id"))
    scoredQ.withColumn("_r", row_number().over(w))
      .filter(col("_r") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("q_nrm"),
        col("c_id").as("q_cell"), col("_r").as("probe_rank"))
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    * 1998) — diversified top-k: greedily pick, per query, the
    * candidate maximizing λ·rel(q, c) − (1−λ)·max_{s∈selected}
    * sim(c, s), so near-duplicate hits don't crowd the result list
    * (the retrieval-side complement of v10's semantic dedup; the
    * standard RAG-context diversifier). Candidates are the exact
    * top-`n` by cosine (`n` smalls the quadratic term: the pairwise
    * sims computed are n·k per query, never corpus-sized).
    *
    * The greedy loop UNROLLS into the plan (k is small by meaning):
    * step 1 is an argmax over relevance; step i joins the remaining
    * candidates against the i−1 selected rows, takes the per-
    * candidate max similarity (exact doubles — the same codegen'd
    * fold both engines replay), scores, and rank-picks one row per
    * query. Ties break by candidate id, so the whole selection is
    * deterministic. Output: (q_id, step, n_id, score) with step 1's
    * score = relevance and later steps the MMR objective.
    *
    * Scale shape: one broadcast-query corpus scan for candidates
    * (the [[bruteForceKnn]] shape — swap in an IVF/LSH candidate
    * source at 100 TB, the re-rank is source-agnostic), then k−1
    * joins over queries×n rows — retrieval-sized, never corpus-sized.
    */
  def mmrSelect(corpus: DataFrame, queries: DataFrame, n: Int, k: Int,
                lambda: Double, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= k && k >= 1, s"need n >= k >= 1, got n=$n k=$k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1], got $lambda")
    val q = broadcast(queries.select(col(idCol).as("q_id"),
      col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_nrm")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      norm(col(vecCol)).as("n_nrm"))
    val w = Window.partitionBy(col("q_id"))
    val cand = q.crossJoin(c).filter(col("q_id") =!= col("n_id"))
      .withColumn("rel", dot(col("q_vec"), col("n_vec")) /
        nullif(col("q_nrm") * col("n_nrm"), lit(0.0)))
      .withColumn("rnk", row_number().over(
        w.orderBy(col("rel").desc, col("n_id"))))
      .filter(col("rnk") <= n)
      .select(col("q_id"), col("n_id"), col("n_vec"), col("n_nrm"),
        col("rel"))
      .persist() // k small joins reuse this tiny frame
    def top1(scored: DataFrame, scoreCol: Column, step: Int): DataFrame =
      scored
        .withColumn("_s", scoreCol)
        .withColumn("_r", row_number().over(
          w.orderBy(col("_s").desc, col("n_id"))))
        .filter(col("_r") === 1)
        .select(col("q_id"), lit(step).as("step"), col("n_id"),
          col("n_vec"), col("n_nrm"), col("rel"), col("_s").as("score"))
    // Pin each step's selection: step i's plan references step i−1's
    // TWICE (the anti-join and the max-sim join), so an unpinned chain
    // re-evaluates earlier steps 2^(k−step) times and Catalyst
    // re-analyzes a plan that doubles per step. A lazy localCheckpoint
    // truncates the lineage to the materialized step — each greedy
    // step then runs exactly once (the Bpe.trainDistributed
    // discipline). Frames are retrieval-sized (queries × step rows).
    def pin(df: DataFrame): DataFrame = df.localCheckpoint(false)
    var selected = pin(top1(cand, col("rel"), 1))
    for (step <- 2 to k) {
      val remaining = cand.join(
        selected.select(col("q_id"), col("n_id")), Seq("q_id", "n_id"),
        "left_anti")
      val maxSim = remaining.join(
          selected.select(col("q_id"), col("n_vec").as("s_vec"),
            col("n_nrm").as("s_nrm")), Seq("q_id"))
        .withColumn("_sim", dot(col("n_vec"), col("s_vec")) /
          nullif(col("n_nrm") * col("s_nrm"), lit(0.0)))
        .groupBy(col("q_id"), col("n_id"))
        .agg(first(col("n_vec")).as("n_vec"), first(col("n_nrm")).as("n_nrm"),
          first(col("rel")).as("rel"), max(col("_sim")).as("_msim"))
      selected = pin(selected.unionByName(
        top1(maxSim,
          lit(lambda) * col("rel") - lit(1.0 - lambda) * col("_msim"),
          step).select(selected.columns.toIndexedSeq.map(col): _*)))
    }
    selected.select(col("q_id"), col("step"), col("n_id"), col("score"))
  }

  private def rank(pairs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = pairs.withColumn("cos_sim",
      dot(col("q_vec"), col("n_vec")) /
        nullif(col("q_nrm") * col("n_nrm"), lit(0.0)))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("rnk"), col("cos_sim"))
  }

  // -----------------------------------------------------------------
  // k-means coarse-quantizer training (spherical Lloyd's)
  // -----------------------------------------------------------------

  /** A trained coarse quantizer: (centroid id, direction). Centroids
    * are metadata-scale (k × dims doubles — a few KB), so the model
    * lives on the driver and enters plans as literals; only the corpus
    * is distributed.
    */
  type KmeansModel = Seq[(Int, Seq[Double])]

  /** Per-row argmax over literal centroids: one projection computing k
    * codegen'd dot folds per row and a `greatest` over (cos, -cid)
    * structs — zero shuffle, zero join. Right for training-loop k
    * (≲ 64); for a large IVF codebook (k in the thousands) use
    * [[assignCells]], which carries centroids as data instead of
    * expression nodes. Ties break to the lowest centroid id, matching
    * [[assignCells]].
    */
  private def argmaxCell(vec: Column, nrm: Column, model: KmeansModel): Column = {
    val scored = model.map { case (cid, cv) =>
      // driver-side strict left fold: same op order as norm()'s codegen
      // fold, so an engine replaying this in SQL agrees bit-for-bit
      val cn = math.sqrt(cv.foldLeft(0.0)((a, x) => a + x * x))
      struct(
        (dot(vec, typedLit(cv)) / nullif(nrm * lit(cn), lit(0.0))).as("cos"),
        lit(-cid).as("neg_id"))
    }
    val best = if (scored.size == 1) scored.head else greatest(scored: _*)
    -best.getField("neg_id")
  }

  /** Trains IVF coarse centroids with spherical k-means (cosine
    * assignment, centroid = mean of the cell's unit vectors — the
    * update that makes the summed-cosine objective non-decreasing).
    *
    * Deterministic end to end, independent of partitioning:
    *  - seeds are the k vectors with the smallest `md5(id)` (a
    *    reproducible pseudo-random spread; production-scale init would
    *    be k-means&#124;&#124;, which only changes the seed step);
    *  - mean components are summed as DECIMAL(28,12) (associative ⇒
    *    partition-order independent) and divided in double, so two
    *    runs over different partitionings give bit-identical models.
    *
    * Per iteration: one corpus scan (map-side argmax, no shuffle of
    * vectors), one partial-aggregated shuffle of k×dims×partitions
    * mean fragments, one k×dims collect — the classic Lloyd's cost
    * shape, dominated by the scans. Zero-norm vectors are excluded;
    * a cell that loses all members keeps its previous centroid.
    */
  def trainKmeans(corpus: DataFrame, k: Int, iters: Int,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): KmeansModel = {
    require(k >= 2, s"k-means needs k >= 2 centroids, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val nz = corpus
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        norm(col(vecCol)).as("nrm"))
      .filter(col("nrm") > 0)

    var model: KmeansModel = nz
      .withColumn("h", md5(col("id").cast("string").cast("binary")))
      .orderBy(col("h")).limit(k)
      .select(col("h"), transform(col("v"), x => x.cast("double")).as("cv"))
      .collect().toSeq
      .sortBy(_.getString(0))
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }

    if (model.nonEmpty) {
      for (_ <- 0 until iters) {
        val m = model
        val means = nz
          .select(argmaxCell(col("v"), col("nrm"), m).as("cell"),
            transform(col("v"), x => x.cast("double") / col("nrm")).as("unit"))
          .select(col("cell"), posexplode(col("unit")).as(Seq("pos", "u")))
          .groupBy(col("cell"), col("pos"))
          .agg((sum(col("u").cast(DecimalType(28, 12))).cast("double") /
            count(lit(1))).as("m"))
          .collect()
        val byCell = means.groupBy(_.getInt(0)).map { case (c, rows) =>
          c -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
        model = model.map { case (cid, old) =>
          (cid, byCell.getOrElse(cid, old))
        }
      }
    }
    model
  }

  /** Assigns every non-zero vector to its trained centroid — the
    * model enters as literals, so this is a single map-side projection
    * (no join, no shuffle): the shape of IVF ingest at any scale.
    */
  def assignModel(corpus: DataFrame, model: KmeansModel,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    val nz = corpus
      .select(col(idCol), col(vecCol).as("v"), norm(col(vecCol)).as("nrm"))
      .filter(col("nrm") > 0)
    if (model.isEmpty)
      nz.select(col(idCol), lit(null).cast("long").as("cell")).filter(lit(false))
    else
      nz.select(col(idCol),
        argmaxCell(col("v"), col("nrm"), model).cast("long").as("cell"))
  }

  /** Mean best-cosine of [[assignModel]]'s assignment — the spherical
    * k-means objective (up to the 1/n factor); monotone non-decreasing
    * across [[trainKmeans]] iterations.
    */
  def kmeansObjective(corpus: DataFrame, model: KmeansModel,
                      vecCol: String = "embedding"): Double = {
    val nz = corpus.select(col(vecCol).as("v"), norm(col(vecCol)).as("nrm"))
      .filter(col("nrm") > 0)
    val bestCos = model.map { case (_, cv) =>
      val cn = math.sqrt(cv.foldLeft(0.0)((a, x) => a + x * x))
      dot(col("v"), typedLit(cv)) / nullif(col("nrm") * lit(cn), lit(0.0))
    }.reduceLeft((a, b) => greatest(a, b))
    nz.select(avg(bestCos)).collect().head.getDouble(0)
  }

  /** The corpus-growth sizing rule for an IVF cell count: k ∝ √N
    * (`max(kMin, ceil(coeff · √n))`) — the standard IVF guideline
    * (FAISS documents k ≈ √N to a small multiple of it). Under this
    * rule a fixed-nprobe serve scans `nprobe · N / k ≈ nprobe · √N /
    * coeff` candidates per query — SUBLINEAR in corpus size, where a
    * fixed k goes linear (the round-16 maxsimserve 1000× finding:
    * probed-cell populations grow with the corpus when the cell count
    * doesn't).
    */
  def growthK(n: Long, kMin: Int = 2, coeff: Double = 1.0): Int = {
    require(kMin >= 2, s"kMin must be >= 2 (k-means needs 2), got $kMin")
    require(coeff > 0, s"coeff must be > 0, got $coeff")
    math.max(kMin, math.ceil(coeff * math.sqrt(n.toDouble)).toInt)
  }

  /** The default RETRAIN POLICY for
    * [[graft.streaming.ScoringStreaming.cellIndexStreamWithRetrain]]:
    * a recenter that GROWS the index with the corpus. Counts the
    * corpus (one scalar job), sizes the new codebook by [[growthK]]'s
    * k ∝ √N rule, and trains spherical k-means at that k — so a
    * trigger fired by occupancy (corpus outgrew the cell count)
    * produces a generation whose occupancy `N / k ≈ √N / coeff` is
    * back in band, not just recentered at the same saturated k.
    * Deterministic end to end ([[trainKmeans]]'s md5-seeded init and
    * decimal-summed means), so the persisted `_centroids` equal the
    * frame the seed assignment used even though the loop evaluates
    * the returned frame once per use.
    */
  def growthRetrain(kMin: Int = 2, coeff: Double = 1.0, iters: Int = 2,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding")
      : DataFrame => DataFrame = { corpus =>
    val spark = corpus.sparkSession
    import spark.implicits._
    val n = corpus.count()
    val k = growthK(n, kMin, coeff)
    trainKmeans(corpus, k, iters, idCol, vecCol)
      .map { case (cid, cv) => (cid.toLong, cv) }
      .toDF(idCol, vecCol)
  }

  /** Mean-pool embeddings per group: the chunk→document aggregation of
    * a RAG/embedding pipeline (embed chunks, pool to one vector per
    * doc). Components quantize to 1e-12 via `floor(x · 1e12)` — floor,
    * not a decimal cast, because floor has NO tie: floats that are odd
    * multiples of 2⁻¹³ decimal-expand to an exact …5 at digit 13,
    * where HALF_UP (Spark's double→decimal) and HALF_EVEN (DuckDB's)
    * disagree. The quantized longs sum exactly as DECIMAL(38,0)
    * (associative ⇒ partitioning-independent, overflow-proof), so the
    * pooled vector is bit-identical on any engine at any parallelism;
    * the 1e-12 quantization is far below any embedding's float
    * precision. Wrong-width and null vectors are excluded.
    *
    * Scale shape: posexplode is map-side (dims rows per vector), the
    * (group, pos) aggregate partial-aggregates before its exchange,
    * and the final per-group array rebuild is an order-free
    * `array_sort(collect_list(struct(pos, m)))` over exactly `dims`
    * rows per group — never a collect of raw vectors.
    */
  def meanPool(corpus: DataFrame, groupCol: String, dims: Int,
               vecCol: String = "embedding"): DataFrame =
    meanPoolRows(corpus, groupCol, dims, vecCol)
      .groupBy(col(groupCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("pooled"))

  /** The scalar half of [[meanPool]]: one `(group, pos, m)` row per
    * group×dimension, before the per-group array rebuild. This is the
    * shape flat consumers (and row-oriented checkers) want — every
    * column atomic, exactly `dims` rows per group.
    */
  def meanPoolRows(corpus: DataFrame, groupCol: String, dims: Int,
                   vecCol: String = "embedding"): DataFrame = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    corpus
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dims)
      .select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col(groupCol), col("pos"),
        floor(col("x").cast(DoubleType) * 1e12).cast(DecimalType(38, 0))
          .as("q"))
      .groupBy(col(groupCol), col("pos"))
      .agg(((sum(col("q")).cast(DoubleType) / count(lit(1))) / 1e12)
        .as("m"))
  }

  /** The DCG rank discounts 1/log₂(r+1) for r = 1..k, computed ONCE
    * driver-side — exposed so the SQL oracle interpolates the SAME
    * doubles (a double's shortest decimal round-trips exactly, so
    * both engines sum identical constants).
    */
  def dcgDiscounts(k: Int): Seq[Double] =
    (1 to k).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))

  /** Ranked-retrieval quality eval — MRR@k and binary-relevance
    * NDCG@k (Järvelin & Kekäläinen 2002) of a ranked result list
    * against an exact truth set: the eval a serving deployment runs
    * per index/config release, completing the family recall@k
    * (v11/v14/v16/v21) starts. `truth` carries the relevant
    * (q_id, n_id) pairs (e.g. brute-force top-k), `ranked` the
    * (q_id, n_id, rnk) list under eval.
    *
    * Float determinism: the DCG is NOT a fp sum over rows in
    * partition order (addition isn't associative) — hits pivot into
    * per-rank 0/1 flags (max-aggregated, order-free) and the DCG is
    * one FIXED left-assoc expression h₁·d₁ + … + h_k·d_k, so two
    * runs (and two engines) agree bit-for-bit. IDCG = prefix sum of
    * the first min(n_rel, k) discounts, same fixed fold.
    *
    * Scale shape: one equi-join truth⋈ranked on (q_id, n_id) + one
    * partial-aggregatable groupBy(q_id) — eval-set sized, never
    * corpus-sized. Output: (q_id, n_rel, mrr, dcg, ndcg).
    *
    * Robustness contracts (both matter when `ranked` is deeper or
    * dirtier than the top-k the caller means to eval):
    *  - MRR@k is GATED on k: a relevant doc whose first appearance is
    *    past rank k contributes 0, exactly like the DCG's per-rank
    *    flags (an uncapped 1/min(rnk) would let a rank-50 hit leak
    *    into an @3 metric).
    *  - `ranked` is deduplicated to its BEST rank per (q_id, n_id)
    *    before the join: a doc listed at two ranks must not fan out
    *    truth rows (inflating n_rel and deflating NDCG through the
    *    IDCG index) nor double-count gain at two DCG positions.
    */
  def retrievalEval(truth: DataFrame, ranked: DataFrame,
                    k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val disc = dcgDiscounts(k)
    val prefix = disc.scanLeft(0.0)(_ + _).tail
    val bestRank = ranked.select(col("q_id"), col("n_id"), col("rnk"))
      .groupBy(col("q_id"), col("n_id")).agg(min(col("rnk")).as("rnk"))
    val rel = truth.select(col("q_id"), col("n_id"))
      .join(bestRank, Seq("q_id", "n_id"), "left")
    val hits = (1 to k).map(r =>
      max(when(col("rnk") === r, 1).otherwise(0)).as(s"h$r"))
    val aggs = Seq(count(lit(1)).as("n_rel"),
      min(col("rnk")).as("first_hit")) ++ hits
    val dcg = (1 to k).map(r =>
      col(s"h$r").cast("double") * lit(disc(r - 1))).reduce(_ + _)
    rel.groupBy(col("q_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("q_id"), col("n_rel"),
        // null first_hit (no hit at all) falls to the otherwise-0 leg
        when(col("first_hit") <= k, lit(1.0) / col("first_hit"))
          .otherwise(lit(0.0)).as("mrr"),
        dcg.as("dcg"))
      .withColumn("ndcg", col("dcg") /
        element_at(typedLit(prefix),
          least(col("n_rel"), lit(k.toLong)).cast("int")))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023): keep
    * one representative per group of embedding-near-duplicates, where
    * candidate pairs are bounded to a k-means cell instead of the full
    * corpus. The decision rule is greedy-by-id: a vector is dropped
    * iff some lower-id vector in the same cell is within `threshold`
    * cosine — deterministic, order-free, and exactly mirrorable in
    * SQL with a per-vector MIN over qualifying partners.
    *
    * Scale shape: the cell assignment is the same map-side literal-
    * centroid projection as [[assignModel]] (no join, no shuffle of
    * vectors), and the pair join is an equi-join on the cell id — at
    * 100 TB each cell is a tiny fraction of the corpus, so the
    * quadratic blow-up is per-cell, never global (v3's cell-bounded
    * near-dup shape, but with a keep/drop verdict instead of a pair
    * list). Output: one row per non-zero vector — (id, cell,
    * dup_of) with dup_of = −1 for kept representatives.
    */
  def semDedup(corpus: DataFrame, model: KmeansModel, threshold: Double,
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    val withCell = corpus
      .select(col(idCol), col(vecCol).as("v"), norm(col(vecCol)).as("nrm"))
      .filter(col("nrm") > 0)
      // empty model → empty output, matching assignModel
      .filter(lit(model.nonEmpty))
      .select(col(idCol), col("v"), col("nrm"),
        (if (model.isEmpty) lit(null).cast("long")
         else argmaxCell(col("v"), col("nrm"), model).cast("long")).as("cell"))
    val x = withCell.select(col(idCol).as("x_id"), col("v").as("x_v"),
      col("nrm").as("x_nrm"), col("cell"))
    val y = withCell.select(col(idCol).as("y_id"), col("v").as("y_v"),
      col("nrm").as("y_nrm"), col("cell"))
    val dup = x.join(y, "cell")
      .filter(col("y_id") < col("x_id"))
      .filter(dot(col("x_v"), col("y_v")) /
        nullif(col("x_nrm") * col("y_nrm"), lit(0.0)) >= threshold)
      .groupBy(col("x_id")).agg(min(col("y_id")).as("dup_of"))
    withCell.select(col(idCol), col("cell"))
      .join(dup, col(idCol) === col("x_id"), "left")
      .select(col(idCol), col("cell"),
        coalesce(col("dup_of"), lit(-1L)).as("dup_of"))
  }

  /** DataComp/LAION-style centroid-similarity quality gate (Gadre et
    * al. 2023's CLIP-score filtering shape): pool a trusted SEED set
    * to one centroid, score every corpus vector by cosine to it, keep
    * rows at or above `tau`. The embedding-space analog of the t45
    * trained-classifier gate — no labels needed beyond "these seed
    * rows look like what we want more of".
    *
    * Determinism: the centroid comes from [[meanPool]]'s floor-
    * quantized exact-decimal sums (bit-identical on any engine at any
    * parallelism), and the per-row score is the same literal-centroid
    * dot/norm fold every serving leg uses — so scores, and therefore
    * the keep verdict at any threshold, replay bit-exactly.
    *
    * Scale shape: one seed-sized aggregate, a dims-sized collect (the
    * model), then a map-side corpus scan against the literal centroid
    * — no join, no shuffle of vectors, the [[assignModel]] plan with
    * one cell. Wrong-width and null vectors are excluded (they have
    * no score under this gate); zero vectors score null and drop.
    */
  def centroidQuality(corpus: DataFrame, seed: DataFrame, dims: Int,
                      tau: Double, idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    val pooled = meanPool(seed.select(lit(0).as("_g"), col(vecCol)),
      "_g", dims, vecCol).collect()
    require(pooled.nonEmpty,
      "centroidQuality: seed set has no valid vectors of the given dims")
    val cent = pooled.head.getSeq[Double](1).toVector
    val cn = math.sqrt(cent.foldLeft(0.0)((a, x) => a + x * x))
    corpus
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dims)
      .select(col(idCol),
        (dot(col(vecCol), typedLit(cent)) /
          nullif(norm(col(vecCol)) * lit(cn), lit(0.0))).as("cos"))
      .withColumn("kept", coalesce(col("cos") >= tau, lit(false)))
  }

  // -----------------------------------------------------------------
  // Scalar-quantized (int8) search
  // -----------------------------------------------------------------

  /** Largest |component| of a vector in double — the per-vector
    * quantization scale. Null/empty vectors yield null (callers filter
    * `maxAbs > 0`).
    */
  def maxAbs(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** Int8 scalar quantization: qᵢ = floor(xᵢ / scale · 127), values in
    * [-127, 127] for scale = [[maxAbs]]. `floor` (not `round`) so the
    * quantizer is unambiguous across engines — round-half ties differ
    * between IEEE implementations, floor never does.
    */
  def sq8(vec: Column, scale: Column): Column =
    transform(vec, x => floor(x.cast("double") / scale * 127).cast("long"))

  /** Reference integer dot via built-in HOFs — semantically identical
    * to the packed [[graft.functions.VecI8.dot]] kernel (spec-pinned);
    * integer sums are associative, so both are order-independent.
    */
  def dotIntHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Quantized exhaustive top-k: every corpus vector is scanned, but
    * as a 1-byte-per-dim packed code scored with an integer dot — the
    * memory-bandwidth-bound scan that makes "brute force" viable at
    * 100× the float32 footprint (64 B/vec vs 256 B + array headers).
    * Queries broadcast; the corpus quantizes in the same projection
    * that scans it, so nothing is shuffled. Scores are exact integers:
    * rankings are reproducible bit-for-bit on any engine, unlike
    * float-sum scores. Zero vectors (no scale) are excluded.
    */
  /** @param cacheCodes materialize the packed corpus codes before the
    * scan (default). The quantized corpus IS the index — 1 byte/dim —
    * and materializing it serves every query batch from one encode
    * pass. It also sidesteps a codegen hazard: a lazy projection under
    * a nested-loop join gets its expressions DEFERRED into the pair
    * loop, re-quantizing every corpus row once per query (measured 4×
    * on this operator, 8× on [[pqKnn]]). Pass false only for one-shot
    * queries on corpora too large to cache even quantized.
    */
  def sqKnn(corpus: DataFrame, queries: DataFrame, k: Int,
            idCol: String = "vec_id",
            vecCol: String = "embedding",
            cacheCodes: Boolean = true): DataFrame = {
    import graft.functions.VecI8
    def quantized(df: DataFrame, p: String) = df
      .select(col(idCol).as(s"${p}_id"), col(vecCol).as("v"),
        maxAbs(col(vecCol)).as("mx"))
      .filter(col("mx") > 0)
      .select(col(s"${p}_id"),
        VecI8.pack(sq8(col("v"), col("mx"))).as(s"${p}_q"))
    val q = broadcast(quantized(queries, "q"))
    val c0 = quantized(corpus, "n")
    val c = if (cacheCodes) c0.persist() else c0

    import org.apache.spark.sql.expressions.Window
    val scored = q.crossJoin(c).filter(col("q_id") =!= col("n_id"))
      .withColumn("qdot", VecI8.dot(col("q_q"), col("n_q")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("qdot").desc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("rnk"), col("qdot"))
  }

  // -----------------------------------------------------------------
  // Product-quantized (PQ) search with asymmetric distance (ADC)
  // -----------------------------------------------------------------

  /** PQ codebook: m subspaces × k codewords × (dims/m) components. */
  type PqCodebook = Seq[Seq[Seq[Double]]]

  /** Squared L2 distance as a strict left fold in double — the PQ
    * metric. float−double is exact in double, and the fold order is
    * the array order, so values reproduce bit-for-bit on any engine.
    * A codegen'd native kernel ([[graft.functions.VecSqDist]]) —
    * bit-identical to [[sqDistHof]], which PQ encoding evaluates m×k
    * times per corpus row (interpreted HOFs were 6× of v9's runtime).
    */
  def sqDist(a: Column, b: Column): Column = graft.functions.VecSqDist(a, b)

  /** Reference HOF formulation of [[sqDist]] — spec-pinned bit-equal
    * to the native kernel (same strict fold, same double ops).
    */
  def sqDistHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** Builds the codebook from the first k corpus vectors (by id) — a
    * deterministic seed codebook, exactly the role the first-8-vectors
    * seed plays for [[assignCells]]. Production PQ refines each
    * subspace's codewords with [[trainKmeans]]-style Lloyd's rounds;
    * encode/ADC below are identical either way, and the seed variant
    * keeps the whole operator oracle-checkable. Model-sized
    * (m × k × dims/m doubles): lives on the driver, enters plans as
    * literals.
    */
  def pqCodebook(corpus: DataFrame, m: Int, k: Int,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): PqCodebook = {
    // null/empty vectors can't seed a codeword (poison rows must not
    // kill the job); real corpora are unaffected by the filter
    val raw = corpus
      .filter(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .orderBy(col(idCol)).limit(k)
      .select(transform(col(vecCol), x => x.cast("double")))
      .collect().map(_.getSeq[Double](0))
    require(raw.nonEmpty, "corpus has no non-empty vectors")
    val dims = raw.head.size
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    val rows = raw.filter(_.size == dims)
    val sub = dims / m
    (0 until m).map(mi => rows.map(_.slice(mi * sub, (mi + 1) * sub)).toSeq)
  }

  /** Lloyd's-refined PQ codebook: starts from [[pqCodebook]]'s
    * deterministic seed and runs `iters` per-subspace k-means rounds —
    * assign every corpus sub-vector to its argmin-sq-distance codeword
    * (the exact [[pqEncode]] rule, so train and serve agree), then
    * re-center each codeword on the mean of its assigned sub-vectors.
    * This is the standard PQ training loop (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search" §III): each round's
    * update is non-increasing in per-subspace quantization MSE, which
    * is what ADC recall rides on at real scale.
    *
    * Deterministic and partition-independent like [[trainKmeans]]:
    * assignment ties break to the lowest codeword id, mean components
    * floor-quantize to 1e-12 and sum as DECIMAL(38,0) (associative,
    * and — unlike a decimal cast — tie-free: see [[meanPool]]'s
    * HALF_UP/HALF_EVEN analysis) before the double divide, and
    * a codeword that loses all members keeps its previous value. Per
    * round: one corpus scan (map-side argmin per subspace — the m×k
    * codegen'd folds of [[pqEncode]]), one partial-aggregated shuffle
    * of m×k×dims/m mean fragments, one model-sized collect. Nothing
    * data-sized ever reaches the driver.
    */
  def pqCodebookRefined(corpus: DataFrame, m: Int, k: Int, iters: Int,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): PqCodebook = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    var cb = pqCodebook(corpus, m, k, idCol, vecCol)
    val sub = cb.head.head.size
    val dims = sub * m
    // wrong-width rows can't vote on a codeword (same poison-row
    // guard as the seed step)
    val base = corpus
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dims)
      .select(col(vecCol).as("v"))
    for (_ <- 0 until iters) {
      val cur = cb
      val means = base
        .select(col("v"),
          posexplode(pqEncode(col("v"), cur)).as(Seq("mi", "cid")))
        .select(col("mi"), col("cid"),
          posexplode(transform(
            slice(col("v"), col("mi") * sub + 1, lit(sub)),
            x => x.cast("double"))).as(Seq("pos", "x")))
        .groupBy(col("mi"), col("cid"), col("pos"))
        .agg(((sum(floor(col("x") * 1e12).cast(DecimalType(38, 0)))
          .cast("double") / count(lit(1))) / 1e12).as("mu"))
        .collect()
      val byKey = means.groupBy(r => (r.getInt(0), r.getInt(1)))
        .map { case (key, rows) =>
          key -> rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
        }
      cb = cur.zipWithIndex.map { case (codewords, mi) =>
        codewords.zipWithIndex.map { case (cw, ci) =>
          byKey.getOrElse((mi, ci), cw)
        }
      }
    }
    cb
  }

  /** Per-row PQ encoding: for each subspace, the argmin-distance
    * codeword id (ties → lowest id). Map-side only — one native
    * kernel per row with the codebook as a REFERENCE OBJECT
    * ([[graft.functions.PqCodes]]), no join, no shuffle: the 100 TB
    * corpus compresses to m bytes/vector in one scan. The composed
    * form ([[pqEncodeComposed]]) unrolled m×k literal kernel calls
    * into one 12–26 KB generated method — past HotSpot's 8,000-byte
    * JIT ceiling, so THE INGEST SCAN RAN INTERPRETED; the kernel is
    * bit-identical (spec-pinned, including null/short-vector edges)
    * and compiles.
    */
  def pqEncode(vec: Column, cb: PqCodebook): Column =
    graft.functions.PqCodes(vec, cb)

  /** The macro-expanded reference form of [[pqEncode]] — what the
    * kernel must reproduce bit-for-bit (and what the SQL oracle
    * mirrors term-by-term). Kept for the equivalence spec only.
    */
  private[graft] def pqEncodeComposed(vec: Column, cb: PqCodebook): Column = {
    val sub = cb.head.head.size
    array(cb.zipWithIndex.map { case (codewords, mi) =>
      val s = slice(vec, mi * sub + 1, sub)
      val scored = codewords.zipWithIndex.map { case (cw, ci) =>
        struct(sqDist(s, typedLit(cw)).as("d"), lit(ci).as("cid"))
      }
      least(scored: _*).getField("cid")
    }: _*)
  }

  /** The per-query ADC distance table tbl[mi][ci] = ‖q⁽ᵐⁱ⁾ − cb[mi][ci]‖²
    * as one native expression ([[graft.functions.AdcTable]]) — same
    * JIT-ceiling story as [[pqEncode]] (the composed array-of-arrays
    * form generated an 11,937-byte method). Query-side only; rides the
    * broadcast row.
    */
  private def adcTable(vec: Column, cb: PqCodebook): Column =
    graft.functions.AdcTable(vec, cb)

  /** Composed reference form of [[adcTable]], for the equivalence
    * spec only.
    */
  private[graft] def adcTableComposed(vec: Column, cb: PqCodebook): Column = {
    val sub = cb.head.head.size
    array(cb.zipWithIndex.map { case (codewords, mi) =>
      array(codewords.map(cw =>
        sqDist(slice(vec, mi * sub + 1, sub), typedLit(cw))): _*)
    }: _*)
  }

  /** PQ top-k with asymmetric distance: the query keeps its exact
    * float vector; each corpus vector is approximated by its per-
    * subspace codeword, so the pair distance is Σₘ ‖q⁽ᵐ⁾ − cb[m][code]‖²
    * — m small folds against literal codewords instead of a full
    * dims-length scan of raw floats. Queries broadcast, the corpus is
    * encoded in the same projection that scans it (nothing shuffled),
    * and the per-query top-k prunes through the rank window exactly
    * like [[sqKnn]]. The m distances sum in fixed subspace order, so
    * scores are engine-reproducible.
    */
  /** @param cacheCodes materialize the m-byte/vector encoded corpus
    * before the ADC scan (default) — the PQ index, built once and
    * served to every query batch. Without it, codegen DEFERS the
    * encode projection into the nested-loop pair loop and re-encodes
    * every corpus row once per query — measured 8× the whole-query
    * runtime at |Q| = 100.
    * @param cellCol when set, an IVF-PQ composition: both sides carry
    * this precomputed coarse-cell column (the same role `label` plays
    * for [[ivfKnn]]) and the ADC scan runs only inside the query's
    * cell — the nested-loop broadcast product becomes an equi-join on
    * the cell id, so cost drops from |Q|×|corpus| to |Q|×|cell|. This
    * is the standard large-scale ANN deployment shape (FAISS IVFPQ):
    * coarse quantizer prunes, product quantizer compresses what's left.
    */
  /** Builds the PQ index frame: (id, codes) — m bytes-worth of
    * codeword ids per vector. This IS the serveable index: write it
    * once (parquet/Delta), read it back for every query batch via
    * [[pqScoreCodes]]. Spec-pinned: encode → persist → score equals
    * the fused [[pqKnn]] row-for-row.
    */
  def pqEncodeCorpus(corpus: DataFrame, cb: PqCodebook,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("n_id"),
      pqEncode(col(vecCol), cb).as("codes"))

  /** ADC top-k scan over a prebuilt (n_id, codes) index frame — the
    * serving half of [[pqKnn]]. The codebook must be the one that
    * encoded the index.
    */
  def pqScoreCodes(codes: DataFrame, queries: DataFrame, cb: PqCodebook,
                   k: Int, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"),
      col(vecCol).as("q_vec"))
      .select(col("q_id"), adcTable(col("q_vec"), cb).as("tbl")))
    val dist = cb.indices.map { mi =>
      element_at(element_at(col("tbl"), mi + 1),
        element_at(col("codes"), mi + 1) + 1)
    }.reduce(_ + _)
    import org.apache.spark.sql.expressions.Window
    val scored = q.crossJoin(codes).filter(col("q_id") =!= col("n_id"))
      .withColumn("dist", dist)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("dist").asc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("rnk"), col("dist"))
  }

  /** The full IVF-PQ SERVE over a maintained/staged index: ADC top-k
    * restricted to each query's `nprobe` best cells. `index` carries
    * (id, cell, codes) — [[indexCells]] rows built with a codebook,
    * however materialized (a staged artifact or
    * [[graft.streaming.ScoringStreaming.servedCellIndex]]). The
    * coarse quantizer prunes (probe-cell equi-join — the corpus never
    * shuffles, |Q|×nprobe×cell rows scanned instead of |Q|×|corpus|),
    * the product quantizer compresses what's left (m table lookups
    * per pair — raw vectors never touched at serve time): the FAISS
    * IVFPQ deployment shape, now servable end-to-end from the
    * stream-maintained index. With nprobe = |centroids| every cell is
    * probed and the result equals the exhaustive [[pqScoreCodes]]
    * scan (spec-pinned).
    */
  def pqScoreCodesIndexed(index: DataFrame, queries: DataFrame,
                          centroids: DataFrame, cb: PqCodebook, k: Int,
                          nprobe: Int, idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    val probes = probeCells(queries, centroids, nprobe, idCol, vecCol)
    // per-query ADC table computed once on the broadcast side (the
    // pqScoreCodes economics), riding with the query's probe rows
    val q = broadcast(probes
      .select(col("q_id"), col("q_cell"),
        adcTable(col("q_vec"), cb).as("tbl")))
    val c = index.select(col(idCol).as("n_id"),
      col("cell").as("n_cell"), col("codes"))
    val dist = cb.indices.map { mi =>
      element_at(element_at(col("tbl"), mi + 1),
        element_at(col("codes"), mi + 1) + 1)
    }.reduce(_ + _)
    import org.apache.spark.sql.expressions.Window
    val scored = q.join(c, col("q_cell") === col("n_cell") &&
        col("q_id") =!= col("n_id"))
      .withColumn("dist", dist)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("dist").asc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("rnk"), col("dist"))
  }

  // -----------------------------------------------------------------
  // Residual IVF-PQ — FAISS's actual IVFPQ encoding (Jégou et al.
  // §IV.B): codes quantize (vector − its coarse centroid), not the
  // raw vector. When cluster means dominate (the common embedding
  // geometry), raw-space codewords waste their budget re-describing
  // the mean every cell already knows; residual codewords spend it
  // on the within-cell detail ADC recall actually rides on.
  // -----------------------------------------------------------------

  /** Each vector's coarse cell and its residual against that cell's
    * centroid: (id, vec, nrm, cell, residual), subtraction promoted
    * to double (exact — no arithmetic beyond the difference). One
    * [[assignCells]] pass, one id-keyed join back, one broadcast
    * centroid-vector join — the residual column itself is map-side.
    */
  def residuals(corpus: DataFrame, centroids: DataFrame,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val asg = assignCells(corpus, centroids, idCol, vecCol)
      .select(col(idCol), col("cell"))
    val cvec = broadcast(centroids.select(col(idCol).as("cell"),
      col(vecCol).as("_cv")))
    corpus.select(col(idCol), col(vecCol), norm(col(vecCol)).as("nrm"))
      .join(asg, Seq(idCol))
      .join(cvec, Seq("cell"))
      .select(col(idCol), col(vecCol), col("nrm"), col("cell"),
        zip_with(col(vecCol), col("_cv"), (a, b) =>
          a.cast(DoubleType) - b.cast(DoubleType)).as("residual"))
  }

  /** Residual-space PQ codebook: [[pqCodebook]]'s deterministic seed
    * rule (first k rows by id) applied to the residual frame — train
    * and serve quantize the same space.
    */
  def pqCodebookResidual(corpus: DataFrame, centroids: DataFrame,
                         m: Int, k: Int, idCol: String = "vec_id",
                         vecCol: String = "embedding"): PqCodebook =
    pqCodebook(residuals(corpus, centroids, idCol, vecCol), m, k,
      idCol, "residual")

  /** The residual-encoding index build: [[indexCells]]' row shape
    * (id, vec, nrm, cell, codes) with codes = PQ over the residual.
    * Serve through [[pqScoreCodesIndexedResidual]] ONLY — raw-space
    * ADC against residual codes is meaningless (the version-skew
    * contract: encoding space rides the index artifact's logicalId).
    */
  def indexCellsResidual(corpus: DataFrame, centroids: DataFrame,
                         cb: PqCodebook, idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame =
    residuals(corpus, centroids, idCol, vecCol)
      .select(col(idCol), col(vecCol), col("nrm"), col("cell"),
        pqEncode(col("residual"), cb).as("codes"))

  /** Residual IVF-ADC serve: per (query, probe cell) the query's OWN
    * residual against that cell's centroid feeds the ADC table —
    * nprobe tables per query instead of one (the real FAISS serve
    * cost shape; tables are broadcast-side, m·k folds each), then the
    * same cell equi-join + m lookups per candidate as
    * [[pqScoreCodesIndexed]]. Approximates ‖q − (centroid + r̂)‖² —
    * the true IVFPQ distance — where the raw-space serve approximates
    * ‖q − v̂‖ with v̂ quantized across the whole space.
    */
  def pqScoreCodesIndexedResidual(index: DataFrame, queries: DataFrame,
                                  centroids: DataFrame, cb: PqCodebook,
                                  k: Int, nprobe: Int,
                                  idCol: String = "vec_id",
                                  vecCol: String = "embedding")
      : DataFrame = {
    val probes = probeCells(queries, centroids, nprobe, idCol, vecCol)
    val cvec = broadcast(centroids.select(col(idCol).as("q_cell"),
      col(vecCol).as("_cv")))
    val q = broadcast(probes.join(cvec, Seq("q_cell"))
      .select(col("q_id"), col("q_cell"),
        adcTable(zip_with(col("q_vec"), col("_cv"), (a, b) =>
          a.cast(DoubleType) - b.cast(DoubleType)), cb).as("tbl")))
    val c = index.select(col(idCol).as("n_id"),
      col("cell").as("n_cell"), col("codes"))
    val dist = cb.indices.map { mi =>
      element_at(element_at(col("tbl"), mi + 1),
        element_at(col("codes"), mi + 1) + 1)
    }.reduce(_ + _)
    import org.apache.spark.sql.expressions.Window
    val scored = q.join(c, col("q_cell") === col("n_cell") &&
        col("q_id") =!= col("n_id"))
      .withColumn("dist", dist)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("dist").asc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("rnk"), col("dist"))
  }

  /** Serving-index health report — the ops table every deployed ANN
    * index ships with: one row per CENTROID (empty cells included —
    * they're the retrain signal, so a left join against the centroid
    * frame, never just groupBy over occupied cells) carrying the
    * cell's population and share, plus the index-wide summary on
    * every row (the frame is centroid-sized): total vectors,
    * occupied-cell count, and the imbalance factor max/mean. A rising
    * imbalance means probe cost concentrates (hot cells dominate
    * every query's candidate set) — the trigger for a centroid
    * retrain ([[graft.streaming.ScoringStreaming
    * .knnScoreStreamGenerational]]'s generation swap) or an nprobe
    * rebalance. One partial-aggregated count on the index scan; all
    * ratios are exact-integer divisions done last.
    */
  def indexStats(index: DataFrame, centroids: DataFrame,
                 idCol: String = "vec_id"): DataFrame = {
    val per = index.groupBy(col("cell")).agg(count(lit(1)).as("n_vec"))
    val base = broadcast(centroids.select(col(idCol).as("cell")))
      .join(per, Seq("cell"), "left")
      .select(col("cell"), coalesce(col("n_vec"), lit(0L)).as("n_vec"))
    val tot = broadcast(base.agg(
      sum(col("n_vec")).as("n_total"),
      count(lit(1)).as("n_cells"),
      sum(when(col("n_vec") > 0, 1L).otherwise(0L)).as("n_occupied"),
      max(col("n_vec")).as("max_cell")))
    // nullif guards the EMPTY-index edge (an arrival prefix with no
    // rows, a hostile fixture): ratios are null rather than an ANSI
    // divide-by-zero; any real index has n_total >= 1
    val totD = nullif(col("n_total").cast(DoubleType), lit(0.0))
    base.crossJoin(tot)
      .select(col("cell"), col("n_vec"),
        (col("n_vec").cast(DoubleType) / totD).as("frac"),
        col("n_total"), col("n_cells"), col("n_occupied"),
        (col("max_cell").cast(DoubleType) * col("n_cells").cast(DoubleType) /
          totD).as("imbalance"))
  }

  def pqKnn(corpus: DataFrame, queries: DataFrame, cb: PqCodebook, k: Int,
            idCol: String = "vec_id",
            vecCol: String = "embedding",
            cacheCodes: Boolean = true,
            cellCol: Option[String] = None): DataFrame = {
    // classic ADC: each query precomputes its m×k distance table ONCE
    // (all the dims-length folds happen here, |Q|·m·k of them), so the
    // per-pair cost below is m array lookups + m−1 adds instead of m
    // folds — the table rides inside the broadcast row
    val qCell = cellCol.map(c => Seq(col(c).as("q_cell"))).getOrElse(Nil)
    val nCell = cellCol.map(c => Seq(col(c).as("n_cell"))).getOrElse(Nil)
    val q = broadcast(queries.select(Seq(col(idCol).as("q_id"),
      col(vecCol).as("q_vec")) ++ qCell: _*)
      .select(Seq(col("q_id"), adcTable(col("q_vec"), cb).as("tbl")) ++
        qCell.map(_ => col("q_cell")): _*))
    val c0 = corpus.select(Seq(col(idCol).as("n_id"),
      pqEncode(col(vecCol), cb).as("codes")) ++ nCell: _*)
    val c = if (cacheCodes) c0.persist() else c0
    // same left-assoc sum of the same per-subspace folds as before —
    // bit-identical distances, just cached per query
    val dist = cb.indices.map { mi =>
      element_at(element_at(col("tbl"), mi + 1),
        element_at(col("codes"), mi + 1) + 1)
    }.reduce(_ + _)

    import org.apache.spark.sql.expressions.Window
    val pairs = cellCol match {
      case Some(_) => q.join(c, col("q_cell") === col("n_cell") &&
        col("q_id") =!= col("n_id"))
      case None => q.crossJoin(c).filter(col("q_id") =!= col("n_id"))
    }
    val scored = pairs.withColumn("dist", dist)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("dist").asc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("rnk"), col("dist"))
  }

  /** Embedding near-duplicate pairs within a coarse cell (IVF-style
    * pre-partition keeps this an equi-join, not an all-pairs product).
    */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
                   cellCol: String = "label", idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val a = corpus.select(col(cellCol).as("cell"), col(idCol).as("vec_a"),
      col(vecCol).as("va"), norm(col(vecCol)).as("nrm_a"))
    val b = corpus.select(col(cellCol).as("cell_b"), col(idCol).as("vec_b"),
      col(vecCol).as("vb"), norm(col(vecCol)).as("nrm_b"))
    a.join(b, col("cell") === col("cell_b") && col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        (dot(col("va"), col("vb")) /
          nullif(col("nrm_a") * col("nrm_b"), lit(0.0))).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}

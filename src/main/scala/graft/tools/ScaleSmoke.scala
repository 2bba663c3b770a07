package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Frequency, Mixing, Series, Similarity}

/** Scale-growth regression smoke: times the dedup (d2/d3/d6) and ANN
  * (v2/v12) families on a 1× and a deterministic 10× slice of the
  * documents/embeddings tables and asserts wall-time grows roughly
  * linearly — the gate that converts SCALING.md's "never all-pairs"
  * narratives into a measurable regression check (an accidental O(n²)
  * would show up as ~100× growth against the ~10× bar).
  *
  * Fixture construction keeps the WORKLOAD linear by design:
  *  - documents: copy i prefixes every text with a `cp$i` token, so
  *    shingles/minhashes differ across copies and LSH buckets don't
  *    accumulate cross-copy candidate pairs (which would be a real
  *    quadratic workload, not a regression);
  *  - embeddings: ids remapped per copy, vectors untouched — corpus
  *    scans grow 10×; the QUERY SET stays the base one (copy 0), so
  *    brute/IVF/PQ work scales with the corpus, not corpus × queries.
  *
  * Usage: `sbt "runMain graft.tools.ScaleSmoke [baseSfDir] [factor] [only]"`
  * (defaults /root/testdata/sf0.01 and 10; `only` is an optional
  * comma-separated query-name filter, e.g. `d11,t26` — used to run the
  * heaviest families at factor=100, confirming sub-linearity across
  * TWO decades, not one). Prints per-query times and ratios; exits
  * nonzero if any ratio exceeds `factor × 2.5` (generous slack for
  * fixed overheads; quadratic blowup is ~factor² and trips it with a
  * wide margin).
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val only: Option[Set[String]] =
      args.lift(2).map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs0 = spark.read.parquet(s"$baseDir/documents.parquet")
    val emb0 = spark.read.parquet(s"$baseDir/embeddings.parquet")
    // events via the ns->us normalization all event queries use
    val ev0 = graft.core.Tables.events(spark, baseDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"),
        col("event_type"))
    val nDocs = docs0.agg(max("doc_id")).as[Long].head() + 1
    val nVecs = emb0.agg(max("vec_id")).as[Long].head() + 1
    val nEv = ev0.agg(max("event_id")).as[Long].head() + 1

    def scaledDocs(f: Int): DataFrame =
      (0 until f).map { i =>
        docs0.select(
          (col("doc_id") + lit(i * nDocs)).as("doc_id"),
          (if (i == 0) col("text")
           else concat(lit(s"cp$i "), col("text"))).as("text"),
          col("source"))
      }.reduce(_.unionByName(_))

    // word-tagged copies: EVERY word carries a per-copy prefix, so the
    // shingle space is disjoint across copies — the fixture for
    // inverted-index shapes (d11 containment), whose workload would
    // otherwise grow quadratically from copies sharing nearly all
    // shingles (that would model a corpus of duplicates, not growth)
    def scaledDocsTagged(f: Int): DataFrame =
      (0 until f).map { i =>
        docs0.select(
          (col("doc_id") + lit(i * nDocs)).as("doc_id"),
          (if (i == 0) col("text")
           else array_join(transform(split(col("text"), " "),
             w => concat(lit(s"c$i"), w)), " ")).as("text"),
          col("source"))
      }.reduce(_.unionByName(_))

    def scaledEmb(f: Int): DataFrame =
      (0 until f).map { i =>
        emb0.select((col("vec_id") + lit(i * nVecs)).as("vec_id"),
          col("label"), col("embedding"))
      }.reduce(_.unionByName(_))

    // events: ids remapped, USERS remapped per copy (user_id + i*10^6)
    // so per-key row counts stay constant — the window/sort families'
    // workload grows by key count, not per-key size (growing a key 10x
    // would be a quadratic-ish sort workload, not a regression)
    def scaledEv(f: Int): DataFrame =
      (0 until f).map { i =>
        ev0.select((col("event_id") + lit(i * nEv)).as("event_id"),
          col("ts"), (col("user_id") + lit(i * 1000000L)).as("user_id"),
          col("value"), col("event_type"))
      }.reduce(_.unionByName(_))

    // materialize to parquet so every timed run scans real files, not
    // an in-memory union plan
    val tmp = Files.createTempDirectory("scalesmoke").toString
    def persist(df: DataFrame, name: String): DataFrame = {
      val p = s"$tmp/$name"
      df.write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    val d1x = persist(scaledDocs(1), "docs1")
    val dNx = persist(scaledDocs(factor), s"docs$factor")
    val dt1x = persist(scaledDocsTagged(1), "docsTagged1")
    val dtNx = persist(scaledDocsTagged(factor), s"docsTagged$factor")
    val e1x = persist(scaledEmb(1), "emb1")
    val eNx = persist(scaledEmb(factor), s"emb$factor")
    val v1x = persist(scaledEv(1), "ev1")
    val vNx = persist(scaledEv(factor), s"ev$factor")
    val queries = e1x.filter(col("vec_id") % 50 === 0)

    def bench(name: String, small: DataFrame, big: DataFrame,
              run: DataFrame => DataFrame): (String, Double) =
      benchAction[DataFrame](name, small, big, in => { run(in).count(); () })

    // for shapes whose output is a driver-side model (v17's codebook),
    // not a DataFrame — the action itself must force the computation.
    // Generic in the input so serving legs pass their (1x, Nx) STAGED
    // indexes explicitly instead of dispatching on reference equality
    // of the raw frame (an `e eq e1x` test silently scores the 1x
    // index for any derived/re-read frame — the gate would measure
    // nothing)
    def benchAction[T](name: String, small: T, big: T,
                       run: T => Unit): (String, Double) = {
      if (only.exists(!_.contains(name))) return name -> 0.0 // filtered out
      def once(in: T): Double = {
        // operators persist intermediates internally (LSH buckets, HH
        // inputs); a cache surviving from the warmup would serve the 1×
        // timed run a partially-cached pipeline while the 10× run pays
        // full cost — a spuriously super-linear ratio. Every run
        // starts cold.
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        run(in)
        (System.nanoTime() - t0) / 1e9
      }
      once(small) // warmup (codegen + reader init)
      val t1 = once(small)
      val tn = once(big)
      val ratio = tn / t1
      println(f"[scalesmoke] $name%-8s 1x=$t1%6.2f s  ${factor}x=$tn%6.2f s  ratio=$ratio%5.1f")
      name -> ratio
    }

    // ---- round-14 serving-leg stagings (untimed, built only when the
    // leg is selected): serve shapes measure the QUERY-time cost
    // against a PRE-STAGED index — the build is a corpus-release
    // artifact, priced by its own legs (v2/v5 assignment, d26 inline)
    def legOn(n: String) = only.forall(_.contains(n))
    val cents8 = e1x.filter(col("vec_id") < 8)
    // knnserve: the per-micro-batch body of knnScoreStream against a
    // parquet cell index (indexCells staged); the serve is the probe
    // equi-join + rank — the corpus never shuffles or re-assigns
    val (knnIdx1, knnIdxN) =
      if (legOn("knnserve"))
        (persist(Similarity.indexCells(e1x, cents8), "knnidx1"),
          persist(Similarity.indexCells(eNx, cents8), s"knnidx$factor"))
      else (null, null)
    // ivfpqserve: the full IVF-PQ serve (v26) against code-carrying
    // staged indexes; the codebook is FROZEN from the base corpus (a
    // model artifact — it doesn't grow with data)
    val pqCb =
      if (legOn("ivfpqserve")) Similarity.pqCodebook(e1x, m = 4, k = 16)
      else null
    val (pqIdx1, pqIdxN) =
      if (legOn("ivfpqserve"))
        (persist(Similarity.indexCells(e1x, cents8,
            codebook = Some(pqCb)), "pqidx1"),
          persist(Similarity.indexCells(eNx, cents8,
            codebook = Some(pqCb)), s"pqidx$factor"))
      else (null, null)
    // bpeserve: the per-micro-batch body of bpeCountStream with merges
    // FROZEN from the base corpus (a tokenizer version doesn't grow
    // with data); the tagged fixture grows rows AND vocabulary, so the
    // serve must stay linear even when most words are out-of-train
    val frozenMerges =
      if (legOn("bpeserve"))
        graft.functions.Bpe.mergesOf(
          graft.functions.Bpe.train(dt1x, nMerges = 5))
      else Seq.empty[(String, String)]
    // upsertserve: the v29 shape — resolve the maintained CHANGELOG
    // index to its latest state (one max-struct per id, tombstones
    // out) and run the IVF-PQ serve over it; the changelog is staged
    // like a real maintained dir (insert + every-7th update + every-
    // 11th delete, so the resolved index is ~90% of the feed's ids)
    val upCb =
      if (legOn("upsertserve")) Similarity.pqCodebook(e1x, m = 4, k = 16)
      else null
    def stageChangelog(e: DataFrame, tag: String): DataFrame = {
      val feed = e.select(col("vec_id"), col("embedding"),
          lit("insert").as("op"), lit(1L).as("seq"))
        .unionByName(e.filter(col("vec_id") % 7 === 0)
          .select(col("vec_id"), reverse(col("embedding")).as("embedding"),
            lit("update").as("op"), lit(2L).as("seq")))
        .unionByName(e.filter(col("vec_id") % 11 === 0)
          .select(col("vec_id"),
            lit(null).cast(e.schema("embedding").dataType).as("embedding"),
            lit("delete").as("op"), lit(3L).as("seq")))
      persist(Similarity.indexChangelog(feed, cents8,
        codebook = Some(upCb)), s"upidx$tag")
    }
    val (upIdx1, upIdxN) =
      if (legOn("upsertserve"))
        (stageChangelog(e1x, "1"), stageChangelog(eNx, factor.toString))
      else (null, null)
    // hashserve: the v31 shape — hash-embedded docs staged as a cell
    // index (embed + build untimed: a corpus-release artifact), the
    // serve is the same probe join as knnserve; queries are the BASE
    // corpus's embeds (the fixed-query-set convention)
    val (hePsl1, hePslN, heQs, heCents) =
      if (legOn("hashserve")) {
        def embOf(d: DataFrame) = Similarity.hashEmbed(d, dims = 64)
        val he1 = embOf(d1x)
        val cents = he1.filter(col("doc_id") < 8).persist()
        (persist(Similarity.indexCells(he1, cents, idCol = "doc_id"),
            "heidx1"),
          persist(Similarity.indexCells(embOf(dNx), cents,
            idCol = "doc_id"), s"heidx$factor"),
          he1.filter(col("doc_id") % 50 === 0).persist(), cents)
      } else (null, null, null, null)
    // residserve: the v33 shape — residual-encoded staged index, ADC
    // table per (query, probe cell); codebook frozen from the base
    // corpus residuals (a model artifact), must track the index scan
    val resCb =
      if (legOn("residserve"))
        Similarity.pqCodebookResidual(e1x, cents8, m = 4, k = 16)
      else null
    val (resIdx1, resIdxN) =
      if (legOn("residserve"))
        (persist(Similarity.indexCellsResidual(e1x, cents8, resCb),
            "residx1"),
          persist(Similarity.indexCellsResidual(eNx, cents8, resCb),
            s"residx$factor"))
      else (null, null)
    // maxsimserve: the v32 shape — chunk-level candidates off the
    // staged chunk index + exact MaxSim re-rank; queries are the BASE
    // corpus's chunks (fixed query set), so candidate volume and the
    // re-rank must track the index scan, never chunks²
    val (msIdx1, msIdxN, msQs, msCents) =
      if (legOn("maxsimserve")) {
        def chunksOf(d: DataFrame) = {
          val ch = graft.operators.Chunking.slidingChunks(d, "doc_id",
              "text", window = 16, stride = 16)
            .withColumn("chunk_uid",
              col("doc_id") * 1000000L + col("chunk_idx"))
          Similarity.hashEmbed(ch, dims = 64, idCol = "chunk_uid",
              textCol = "chunk_text",
              carryCols = Seq("doc_id", "chunk_idx"))
            .filter(Similarity.norm(col("embedding")) > 0)
        }
        val ce1 = chunksOf(dt1x)
        val cents = ce1.filter(col("chunk_idx") === 0 && col("doc_id") < 8)
          .persist()
        (persist(Similarity.indexCells(ce1, cents, idCol = "chunk_uid",
            carryCols = Seq("doc_id")), "msidx1"),
          persist(Similarity.indexCells(chunksOf(dtNx), cents,
            idCol = "chunk_uid", carryCols = Seq("doc_id")),
            s"msidx$factor"),
          ce1.filter(col("doc_id") % 50 === 0).persist(), cents)
      } else (null, null, null, null)
    // upsertserveD / upsertserveS: the DEEP-HISTORY changelog serve,
    // raw vs snapshotted — every id carries upDepth versions (insert
    // + updates) + 1/11 deletes: the regime a changelog accumulates
    // between maintenance runs, and the one snapshots exist for.
    // upsertserveD resolves the full depth·N-row history per serve
    // (the honest no-maintenance cost); upsertserveS serves the SAME
    // logical state from a Dedup.snapshotIndex'd dir (resolve
    // pre-paid up to the fold: |keys| + the unfolded tail). Compare
    // the two legs' Nx columns at the same factor — the ratio IS the
    // measured snapshot payoff the SCALING.md upsertserve prose
    // claims
    val upDepth = 16 // versions per id; deletes land at upDepth+1
    val upDCb =
      if (legOn("upsertserveD") || legOn("upsertserveS"))
        Similarity.pqCodebook(e1x, m = 4, k = 16)
      else null
    def stageUpsertHistory(e: DataFrame, tag: String,
                           snapshot: Boolean): String = {
      val dir = s"$tmp/uph$tag"
      (1 to upDepth + 1).foreach { s =>
        val batch =
          if (s == 1) e.select(col("vec_id"), col("embedding"),
            lit("insert").as("op"), lit(1L).as("seq"))
          else if (s <= upDepth) e.select(col("vec_id"),
            (if (s % 2 == 0) reverse(col("embedding"))
             else col("embedding")).as("embedding"),
            lit("update").as("op"), lit(s.toLong).as("seq"))
          else e.filter(col("vec_id") % 11 === 0)
            .select(col("vec_id"),
              lit(null).cast(e.schema("embedding").dataType)
                .as("embedding"),
              lit("delete").as("op"), lit(s.toLong).as("seq"))
        Similarity.indexChangelog(batch, cents8, codebook = Some(upDCb))
          .write.mode("overwrite").parquet(s"$dir/batch_id=$s")
      }
      if (snapshot) { Dedup.snapshotIndex(spark, dir); () }
      dir
    }
    val (upD1, upDN) =
      if (legOn("upsertserveD"))
        (stageUpsertHistory(e1x, "D1", snapshot = false),
          stageUpsertHistory(eNx, s"D$factor", snapshot = false))
      else (null, null)
    val (upS1, upSN) =
      if (legOn("upsertserveS"))
        (stageUpsertHistory(e1x, "S1", snapshot = true),
          stageUpsertHistory(eNx, s"S$factor", snapshot = true))
      else (null, null)
    // chunkserveD / chunkserveS: the SET-VALUED resolve's D/S pair —
    // the chunk changelog's latestChunkState is a per-doc max-seq
    // WINDOW, which shuffles the FULL history (every surviving row
    // must learn its doc's max seq), where the row-valued resolve is
    // a max-struct whose shuffle is ≤ |keys|. The snapshot fold is
    // therefore worth MORE here; these legs measure exactly the
    // resolve term (both legs' serve would be identical by
    // construction, so the timed action is resolve + count). Fixture:
    // every doc = 3 chunks, 8 versions deep + 1/11 doc deletes.
    val chDepth = 8
    def stageChunkHistory(e: DataFrame, tag: String,
                          snapshot: Boolean): String = {
      val dir = s"$tmp/chh$tag"
      val docs = e.select(col("vec_id").as("doc_id"), col("embedding"))
      val chunks = docs
        .withColumn("chunk_idx", explode(array(lit(0L), lit(1L), lit(2L))))
        .select(col("doc_id"),
          when(col("chunk_idx") === 1L, reverse(col("embedding")))
            .otherwise(col("embedding")).as("embedding"),
          (col("doc_id") * 1000L + col("chunk_idx")).as("chunk_uid"),
          col("chunk_idx"))
      val docCents = cents8.select(col("vec_id").as("doc_id"),
        col("embedding"))
      (1 to chDepth + 1).foreach { s =>
        val batch =
          if (s <= chDepth) chunks.select(col("doc_id"),
            (if (s % 2 == 0) reverse(col("embedding"))
             else col("embedding")).as("embedding"),
            lit(if (s == 1) "insert" else "update").as("op"),
            lit(s.toLong).as("seq"), col("chunk_uid"), col("chunk_idx"))
          else docs.filter(col("doc_id") % 11 === 0)
            .select(col("doc_id"),
              lit(null).cast(e.schema("embedding").dataType)
                .as("embedding"),
              lit("delete").as("op"), lit(s.toLong).as("seq"),
              lit(null).cast("long").as("chunk_uid"),
              lit(null).cast("long").as("chunk_idx"))
        Similarity.indexChangelog(batch, docCents, idCol = "doc_id",
            carryCols = Seq("chunk_uid", "chunk_idx"))
          .write.mode("overwrite").parquet(s"$dir/batch_id=$s")
      }
      if (snapshot) { Dedup.snapshotChunkIndex(spark, dir); () }
      dir
    }
    val (chD1, chDN) =
      if (legOn("chunkserveD"))
        (stageChunkHistory(e1x, "D1", snapshot = false),
          stageChunkHistory(eNx, s"D$factor", snapshot = false))
      else (null, null)
    val (chS1, chSN) =
      if (legOn("chunkserveS"))
        (stageChunkHistory(e1x, "S1", snapshot = true),
          stageChunkHistory(eNx, s"S$factor", snapshot = true))
      else (null, null)
    // maxsimserveT: maxsimserve with the Nx index RETUNED by the
    // k ∝ √N rule (Similarity.growthK — the growthRetrain policy):
    // the cell count grows with √factor while nprobe stays fixed, so
    // per-query candidates are nprobe·chunks/k ≈ √N-bounded. The
    // fixed-k maxsimserve leg is the CONTROL — its 1000× ratio is
    // ≈ linear (probed cells' populations grow with the corpus); this
    // leg shows the retune lever closing exactly that gap
    val (msT1, msTN, msTQs, msTCents1, msTCentsN) =
      if (legOn("maxsimserveT")) {
        def chunksOf(d: DataFrame) = {
          val ch = graft.operators.Chunking.slidingChunks(d, "doc_id",
              "text", window = 16, stride = 16)
            .withColumn("chunk_uid",
              col("doc_id") * 1000000L + col("chunk_idx"))
          Similarity.hashEmbed(ch, dims = 64, idCol = "chunk_uid",
              textCol = "chunk_text",
              carryCols = Seq("doc_id", "chunk_idx"))
            .filter(Similarity.norm(col("embedding")) > 0)
        }
        val ce1 = chunksOf(dt1x)
        val ceN = chunksOf(dtNx)
        // k ∝ √N: the base serves 8 cells, the Nx side 8·√factor
        val kN = 8 * math.ceil(math.sqrt(factor.toDouble)).toInt
        val cents1 = ce1.filter(col("chunk_idx") === 0 && col("doc_id") < 8)
          .persist()
        val centsN = ceN.filter(col("chunk_idx") === 0 && col("doc_id") < kN)
          .persist()
        (persist(Similarity.indexCells(ce1, cents1, idCol = "chunk_uid",
            carryCols = Seq("doc_id")), "msTidx1"),
          persist(Similarity.indexCells(ceN, centsN, idCol = "chunk_uid",
            carryCols = Seq("doc_id")), s"msTidx$factor"),
          ce1.filter(col("doc_id") % 50 === 0).persist(), cents1, centsN)
      } else (null, null, null, null, null)
    // t63apply: the map-only serving split of line dedup — the
    // frequent-line list is a corpus-release artifact (staged,
    // untimed); the timed apply is one broadcast + per-row array
    // filter, ZERO corpus shuffle
    val (t63f1, t63fN) =
      if (legOn("t63apply"))
        (persist(graft.operators.Boilerplate.frequentLines(
            graft.operators.Boilerplate.withLinePayload(d1x),
            textCol = "page_text"), "t63f1"),
          persist(graft.operators.Boilerplate.frequentLines(
            graft.operators.Boilerplate.withLinePayload(dNx),
            textCol = "page_text"), s"t63f$factor"))
      else (null, null)
    // filteredserve: the v30 shape — metadata rides the index row
    // (carryCols), serve filters the STAGED index ahead of the ADC
    // scoring; the filter pushes into the index scan, so the leg must
    // track the (halved) index scan like ivfpqserve
    val fsCb =
      if (legOn("filteredserve")) Similarity.pqCodebook(e1x, m = 4, k = 16)
      else null
    val (fsIdx1, fsIdxN) =
      if (legOn("filteredserve"))
        (persist(Similarity.indexCells(e1x, cents8, codebook = Some(fsCb),
            carryCols = Seq("label")), "fsidx1"),
          persist(Similarity.indexCells(eNx, cents8, codebook = Some(fsCb),
            carryCols = Seq("label")), s"fsidx$factor"))
      else (null, null)
    // d26s: pairsFromPrefixIndex served from the PARQUET prefix
    // artifact — the 100 TB shape of the exact similarity join
    val (pref1, prefN) =
      if (legOn("d26s")) {
        def stagePref(d: DataFrame, tag: String): DataFrame = {
          val sr = Dedup.shingleRows(d).persist()
          val p = persist(Dedup.prefixIndex(sr,
            sr.groupBy(col("shingle")).agg(count(lit(1)).as("df")),
            tauPermille = 500), s"pref$tag")
          sr.unpersist(); p
        }
        (stagePref(dt1x, "1"), stagePref(dtNx, factor.toString))
      } else (null, null)

    val ratios = Seq(
      bench("d2", d1x, dNx, d => Dedup.candidatePairs(d)),
      bench("d3", d1x, dNx, d => Dedup.nearDupPairs(d, threshold = 0.5)),
      bench("d6", d1x, dNx, d => Dedup.clusterIds(
        Dedup.nearDupPairs(d, threshold = 0.5)
          .select(col("doc_a"), col("doc_b")))),
      bench("v2", e1x, eNx, e => Similarity.ivfKnn(e, queries, k = 3)),
      bench("v12", e1x, eNx, e => Similarity.pqKnn(e, queries,
        Similarity.pqCodebook(e, m = 4, k = 16), k = 3,
        cellCol = Some("label"))),
      bench("t23", v1x, vNx, v => Frequency.windowedHeavyHitters(
        v.select(expr("unix_millis(ts) DIV 86400000 * 86400000").as("w"),
          col("user_id").cast("string").as("u")),
        windowCol = col("w"), valueCol = "u", k = 64, num = 1L, den = 50L)),
      bench("s3", v1x, vNx, v => Series.cusum(v, "user_id", "ts",
        "event_id", "value", driftCents = 42000L)),
      // t24: per-stratum rank window — each copy adds rows to the SAME
      // strata (source has ~5 values), so this exercises the full-
      // stratum sort the thresholded variant avoids; t25 beside it
      // shows the two-pass prefilter staying flat-ish on the same data
      bench("t24", d1x, dNx, d => Mixing.prioritySample(
        d, "source", "doc_id",
        graft.functions.TextFunctions.nTokens(col("text")), k = 5)),
      bench("t25", d1x, dNx, d => Mixing.prioritySampleThresholded(
        d, "source", "doc_id",
        graft.functions.TextFunctions.nTokens(col("text")), k = 5)),
      // q30: sessionized path mining — per-user window sort + ordered
      // collect; users are remapped per copy so sessions stay constant-
      // size and the workload grows by key count
      bench("q30", v1x, vNx, { v =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val us = unix_micros(col("ts"))
        val prev = lag(us, 1).over(w)
        v.withColumn("_ns",
            when(prev.isNull || us - prev >= lit(14400000000L), 1)
              .otherwise(0))
          .withColumn("_sid", sum(col("_ns")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("_sid"))
          .agg(concat_ws(">", transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"),
              col("event_type")))),
            x => x.getField("event_type"))).as("path"))
          .groupBy(col("path")).agg(count(lit(1)).as("ct"))
          .orderBy(col("ct").desc, col("path"))
          .limit(20)
      }),
      // v17: refined PQ training — per round one corpus scan + one
      // m×k×sub partial-aggregated shuffle; growth must track the scan
      benchAction[DataFrame]("v17", e1x, eNx, e => {
        Similarity.pqCodebookRefined(e, m = 4, k = 16, iters = 2); ()
      }),
      // d10: chunk dedup — map-side chunking + one hash exchange on the
      // chunk; plain copies are the right fixture here (duplicate
      // chunks across copies grow each first-wins group 10×, which is
      // exactly the production duplicate load the window must absorb)
      bench("d10", d1x, dNx, d => Dedup.chunkDedup(d)),
      // d11: containment over the shared-shingle inverted index — the
      // word-tagged fixture keeps shingles disjoint across copies so
      // the index (and the join) grows linearly, modeling new content
      bench("d11", dt1x, dtNx, d => Dedup.containmentPairs(d, 0.5)),
      // v20: Hamming scan over 8-byte signatures + top-R cosine rerank;
      // fixed query set, so work tracks the corpus scan
      bench("v20", e1x, eNx, e => Similarity.hammingKnn(e, queries, k = 3)),
      // t26: bloom-filter decontamination — train side grows 10×, the
      // eval benchmark stays fixed (the ANN-query-set convention)
      bench("t26", d1x, dNx, d => graft.operators.Decontaminate
        .contaminationReportBloom(
          d.filter(col("source") =!= "src1"),
          d1x.filter(col("source") === "src1"), "doc_id", "text", n = 4)),
      // t27: collocation mining — bigram count aggregate (partial
      // map-side combine) + a broadcast unigram-stats join + top-k
      bench("t27", d1x, dNx, d => graft.operators.Frequency
        .collocations(d, "doc_id", "text", minCount = 5L, topK = 50)),
      // s7: per-key median/MAD (two percentile aggs) + outlier filter;
      // users remapped per copy → key count grows, per-key size fixed
      bench("s7", v1x, vNx, v => Series.madOutliers(v, keyCol = "user_id",
        idCol = "event_id", tsCol = "ts", valueCol = "value", k = 3.0)),
      // d13: 3-round integer PageRank over the near-dup graph; the
      // word-tagged fixture keeps the edge list linear in copies (the
      // same reason as d11), so per-iteration join+agg must track it
      bench("d13", dt1x, dtNx, { d =>
        val pairs = Dedup.nearDupPairs(d, threshold = 0.5)
          .select(col("doc_a"), col("doc_b"))
        graft.operators.Graph.pagerank(
          pairs.union(pairs.select(col("doc_b"), col("doc_a")))
            .toDF("src", "dst"), iters = 3)
      }),
      // d19: cross-source overlap matrix (capped variant — the
      // deployed shape): the tagged fixture grows the vocab 10× with
      // the source count fixed, so the distinct + shingle equi-join
      // must track the vocab scan, not sources²·vocab
      bench("d19", dt1x, dtNx,
        d => Dedup.sourceOverlap(d, maxSourceFreq = 8L)),
      // d22: simhash hamming-band join — tagged copies get distinct
      // word sets, so signatures spread across the band space and the
      // equi-join grows with docs, never docs²
      bench("d22", dt1x, dtNx, d => Dedup.simhashNearDup(d)),
      // t32: exact quantiles — the raw scan dominates; the windowed
      // part runs over the value-count reduction, whose size is the
      // distinct token-count range (constant across copies)
      bench("t32", d1x, dNx, d => graft.operators.Quantiles.groupQuantiles(
        d, "source", graft.functions.TextFunctions.nTokens(col("text")),
        Seq(250, 500, 750, 950))),
      // d23: sketch set algebra — pair frame is sources² (constant
      // across copies), the scan is the shingle reduction; the exact-
      // intersection eval column is the only vocab-bound join
      bench("d23", dt1x, dtNx, d => Dedup.kmvSetOps(d)),
      // m7: perceptual near-dup at maxHamming=3 (4 bands × 12 bits:
      // 4096 band values, sparse at this scale). The driver query's
      // radius-7 variant has 6-bit bands that SATURATE beyond ~10⁵
      // payloads — the documented signature-width lever, not a smoke
      // candidate (its candidate growth is by design at fixed width)
      bench("m7", dt1x, dtNx, d => graft.operators.Multimodal
        .perceptualNearDup(graft.operators.Multimodal.withPayload(d),
          maxHamming = 3)),
      // t38: exact-substring spans — tagged copies keep the 50-token
      // windows disjoint across copies (new content), so the
      // fingerprint join and the per-doc island merge grow with docs
      bench("t38", dt1x, dtNx, d => graft.operators.DupSpans
        .exactSubstrings(d, "doc_id", "text", minLen = 50)),
      // t39: BPE counts — the tagged fixture grows the VOCABULARY 10×
      // (every word distinct per copy), stressing exactly the
      // sequential-UDF relation; the multiplicity shuffle grows with
      // rows. Untagged copies would grow rows but not vocab.
      bench("t39", dt1x, dtNx,
        d => graft.functions.Bpe.docTokenCounts(d)),
      // m8: real PPM decode — map-side parse, zero shuffle; must track
      // the payload scan exactly
      bench("m8", d1x, dNx, d => graft.operators.Multimodal.decodePpm(
        graft.operators.Multimodal.withPpmPayload(d))),
      // t43: bigram surprisal — one tagged unigram+bigram count
      // shuffle + three count joins; tagged copies grow the vocab 10×
      // so the count tables (and the joins) must track it
      bench("t43", dt1x, dtNx, d => graft.operators.Frequency
        .bigramSurprisal(d, "doc_id",
          graft.functions.TextFunctions.tokenize(lower(col("text"))))),
      // t45: NB classifier — train (vocab-sized count shuffle) +
      // score (model join + per-doc sum); vocab grows with the tagged
      // fixture, exercising the model join's growth path
      bench("t45", dt1x, dtNx, { d =>
        val toks = graft.functions.TextFunctions.tokenize(
          lower(col("text")))
        graft.operators.Classify.nbScore(d, "doc_id", toks,
          graft.operators.Classify.nbTrain(d, toks,
            col("source") === "src1"))
      }),
      // t47: DSIR — the model is BUCKET-sized (256 rows) no matter
      // the vocab, so only the gram scans and the per-doc sum grow;
      // the resample is a per-stratum rank window over scored docs
      bench("t47", dt1x, dtNx, { d =>
        val toks = graft.functions.TextFunctions.tokenize(
          lower(col("text")))
        val m = graft.operators.Dsir.model(
          d, toks, col("source") === "src1", 256)
        graft.operators.Dsir.resample(
          graft.operators.Dsir.scores(d, "doc_id", toks, m, 256)
            .join(d.select(col("doc_id"), col("source")), Seq("doc_id")),
          "source", "doc_id", k = 5)
      }),
      // t48: within-doc chunk dedup — a pure map (higher-order array
      // ops on the row), zero shuffle; must track the scan exactly
      bench("t48", d1x, dNx,
        d => graft.operators.Repetition.dedupWithin(d)),
      // m10: decoded-raster perceptual near-dup — decode is map-side;
      // tagged copies give distinct rasters, so the Hamming band join
      // grows with payloads, never payloads²
      bench("m10", dt1x, dtNx, d => graft.operators.Multimodal
        .decodedNearDup(graft.operators.Multimodal.withPpmPayload(d),
          maxHamming = 5)),
      // d25: normalized exact dedup — map-side canonicalization, one
      // hash-keyed partial agg; must track the scan like d1
      bench("d25", d1x, dNx, d => Dedup.exactNormalized(d)),
      // v23: MMR re-rank — candidate scan grows with the corpus, the
      // greedy joins stay retrieval-sized (queries × n)
      bench("v23", e1x, eNx,
        e => Similarity.mmrSelect(e, queries, n = 8, k = 3,
          lambda = 0.7)),
      // d26: prefix-filter exact similarity join — tagged copies keep
      // shingles disjoint (new content), so df stays constant and the
      // prefix self-join + per-pair array verify grow with docs; an
      // accidental fall-back to all-pairs behavior shows as ~factor²
      bench("d26", dt1x, dtNx,
        d => Dedup.prefixFilterPairs(d, tauPermille = 500)),
      // s11: nearest-event join — users remapped per copy, so the one
      // union sort grows by key count with per-key history fixed
      bench("s11", v1x, vNx, { v =>
        val views = v.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = v.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_uid"), col("ts").as("p_ts"),
            col("event_id").as("p_id"))
        graft.operators.Temporal.nearestJoin(views, purchases,
          keyL = "user_id", keyR = "p_uid", leftTs = "ts",
          rightTs = "p_ts", rightCarry = Seq("p_id"))
      }),
      // t52: BPE training (5 rounds) — the tagged fixture grows the
      // VOCABULARY 10×, which is the training state itself; each
      // round's pair count + argmax + rewrite must track it
      benchAction[DataFrame]("t52", dt1x, dtNx, d => {
        graft.functions.Bpe.train(d, nMerges = 5); ()
      }),
      // v24: centroid gate — seed fixed (the query-set convention),
      // scoring is a shuffle-free corpus scan that must track it
      bench("v24", e1x, eNx, e => Similarity.centroidQuality(
        e, e1x.filter(col("label") === 0), dims = 64, tau = 0.1)),
      // m11: decoded-audio near-dup — the WAV walk is map-side. The
      // 16-bit envelope hash holds only 4-bit bands (16 values), so by
      // pigeonhole the UNCAPPED band join saturates once the corpus
      // outgrows the signature's entropy (measured 273× at factor=100,
      // 50k payloads — real physics, not a plan bug). The production
      // posture at that corpus size is the capped join (the d15/d21
      // stop-shingle discipline; the other lever is widening blocks),
      // so the gate runs the cap
      bench("m11", dt1x, dtNx, d => graft.operators.Multimodal
        .audioNearDup(graft.operators.Multimodal.withWavPayload(d),
          maxBucket = 64)),
      // m12: scene-change detection — one projection + one generator,
      // zero shuffle; must track the payload scan exactly
      bench("m12", d1x, dNx, d => graft.operators.Multimodal
        .sceneChanges(graft.operators.Multimodal.withPayload(d), n = 8)),
      // s12: seasonal decomposition — the event scan dominates; the
      // window + seasonal legs run on the days×types reduction
      // (constant across copies)
      bench("s12", v1x, vNx,
        v => Series.seasonalDecompose(v, "event_type", "ts")),
      // d27: label propagation — per-round edge join + count + top-1
      // over node-sized frames; tagged copies keep the edge list
      // linear in copies (the d13 convention)
      bench("d27", dt1x, dtNx, { d =>
        val pairs = Dedup.nearDupPairs(d, threshold = 0.5)
          .select(col("doc_a"), col("doc_b"))
        graft.operators.Graph.labelPropagation(pairs, iters = 3,
          srcCol = "doc_a", dstCol = "doc_b")
      }),
      // t53: vocab growth — tagged copies grow the vocabulary 10×,
      // which is the min-agg reduction itself; the prefix joins are
      // bins-sized broadcasts over it
      bench("t53", dt1x, dtNx,
        d => Frequency.vocabGrowth(d, bins = 8)),
      // t54: backoff surprisal — tagged copies grow the observed
      // uni/bi/trigram tables 10×; the one tagged count shuffle and
      // the five scoring equi-joins must track that
      bench("t54", dt1x, dtNx, d => Frequency.backoffSurprisal(
        d, "doc_id", graft.functions.TextFunctions.tokenize(
          lower(col("text"))),
        isTrain = col("doc_id") % 2 === 0)),
      // m13: decode dispatch — map-side sniff + parse, zero shuffle;
      // must track the payload scan exactly
      bench("m13", d1x, dNx, d => graft.operators.Multimodal
        .decodeDispatch(graft.operators.Multimodal.withPpmPayload(d)
          .select(col("doc_id"), col("payload")))),
      // d29 (sweep leg): MinHash candidates at all four bandings over
      // freshly-built signatures — the tagged fixture keeps shingles
      // disjoint so band buckets don't accumulate cross-copy pairs;
      // each banding's equi-join must grow with docs, never docs²
      bench("d29", dt1x, dtNx, { d =>
        val sig = Dedup.signatures(d)
        Seq((1, 8), (2, 4), (4, 2), (8, 1)).map { case (b, r) =>
          Dedup.candidatePairsFromSignatures(sig, bands = b,
            rowsPerBand = r).select(col("doc_a"))
        }.reduce(_.unionByName(_))
      }),
      // d30 (sweep leg): SimHash candidates at the sweep's band counts
      // (1..4, matching the query — wider bands saturate by entropy,
      // measured 59.7× at factor=100, and are excluded there too).
      // NOTE: the gate runs maxBucket=256 — the CAPPED production
      // posture — while the d30 query itself runs uncapped, so this
      // ratio bounds the deployed configuration, not the query as
      // shipped: the uncapped bands=1 whole-signature join can still
      // pile up on signature skew (that cliff is measured and
      // documented in SCALING.md, not gated here)
      bench("d30", dt1x, dtNx, { d =>
        val sig = Dedup.simhash48(d)
        Seq(1, 2, 3, 4).map(b =>
          Dedup.hammingBandCandidates(sig, "doc_id", "simhash",
            bits = 48, bands = b, maxBucket = 256).select(col("doc_a")))
          .reduce(_.unionByName(_))
      }),
      // v25 (single-pass sweep): truth build (|corpus|×|Q|, query set
      // fixed), one cell assignment, one ranked-probe join + two
      // conditional aggregates — every piece linear in the corpus
      bench("v25", e1x, eNx, { e =>
        val cents = e.filter(col("vec_id") < 8)
        val truth = Similarity.bruteForceKnn(e, queries, k = 3)
          .select(col("q_id"), col("n_id"))
        val nTrue = broadcast(truth.agg(count(lit(1)).as("n_true")))
        val cells = Similarity.assignCells(e, cents)
          .select(col("vec_id").as("n_id"), col("cell").as("n_cell"))
        val cand = broadcast(
            Similarity.probeCellsRanked(queries, cents, nprobe = 8)
              .select(col("q_id"), col("q_cell"), col("probe_rank")))
          .join(cells, col("q_cell") === col("n_cell"))
          .filter(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("n_id"), col("probe_rank"))
        def perNp(p: String) = Seq(1, 2, 4, 8).map(np =>
          coalesce(sum(when(col("probe_rank") <= np, 1L)), lit(0L))
            .as(s"$p$np"))
        cand.agg(perNp("c").head, perNp("c").tail: _*)
          .crossJoin(truth.join(cand, Seq("q_id", "n_id"))
            .agg(perNp("g").head, perNp("g").tail: _*))
          .crossJoin(nTrue)
      }),
      // knnserve: query-stream serving against the staged index —
      // the probe-side broadcast join scans the grown index once
      // (the staged index pair IS the bench input — no dispatch)
      bench("knnserve", knnIdx1, knnIdxN, idx =>
        Similarity.ivfMultiprobeKnnIndexed(idx, queries, cents8,
          k = 3, nprobe = 2)),
      // ivfpqserve: cell-pruned ADC over the staged code index (the
      // v26 serve) — probe equi-join + m table lookups per pair, raw
      // vectors untouched; must track the index scan
      bench("ivfpqserve", pqIdx1, pqIdxN, idx =>
        Similarity.pqScoreCodesIndexed(idx, queries, cents8, pqCb,
          k = 3, nprobe = 2)),
      // bpeserve: frozen-tokenizer counting over the grown corpus —
      // stateless per doc, must track the scan + multiplicity shuffle
      bench("bpeserve", dt1x, dtNx, d =>
        graft.functions.Bpe.docTokenCountsWith(d, frozenMerges)),
      // upsertserve: latest-state resolution of the maintained
      // changelog index (max-struct, shuffle <= |keys|) + the v26
      // serve over the survivors — the v29 deployment read path;
      // must track the changelog scan
      bench("upsertserve", upIdx1, upIdxN, idx =>
        Similarity.pqScoreCodesIndexed(
          Similarity.latestIndexState(idx), queries, cents8, upCb,
          k = 3, nprobe = 2)),
      // d26s: the exact similarity join SERVED from the parquet prefix
      // artifact (build untimed above) — prefix equi-join + length
      // filter + per-pair verify, tracking the index scan; the
      // (index, docs) pair travels together so the big leg can never
      // silently score the 1x index
      benchAction[(DataFrame, DataFrame)]("d26s", (pref1, dt1x),
        (prefN, dtNx), { case (p, d) =>
          Dedup.pairsFromPrefixIndex(p, d, tauPermille = 500).count(); ()
        }),
      // t55: HTML extraction — payload synthesis + the 6-rule strip is
      // one codegen'd projection, zero shuffle; must track the doc
      // scan exactly (regex cost is per-byte, payloads are per-doc).
      // A bare count() would let Catalyst PRUNE the projection (rows
      // survive it 1:1), so the action sums derived columns instead
      benchAction[DataFrame]("t55", d1x, dNx, d => {
        graft.operators.Html
          .extractionReport(graft.operators.Html.withHtmlPayload(d))
          .agg(sum(col("text_len") + col("n_tags"))).collect(); ()
      }),
      // t56: URL canonicalization + dedup — map-side regex rules +
      // ONE hash exchange on the canonical string; the synthetic URL
      // space grows with ids, so group count grows linearly and group
      // SIZE stays constant — the window must track the scan (the
      // keeper sum forces the window + the canonicalization under it)
      benchAction[DataFrame]("t56", d1x, dNx, d => {
        graft.operators.Urls
          .urlDedupReport(graft.operators.Urls.withUrlPayload(d))
          .agg(sum(when(col("keeper"), 1L).otherwise(0L))).collect(); ()
      }),
      // stage0: the t11d from-crawl front half — URL dedup keepers →
      // HTML payload → main-text extraction; one exchange (the URL
      // window), everything else map-side (forced through the text
      // length sum — count() would prune the extraction). The cascade
      // behind it is priced by its own legs (d2/d3/t38/t26/...)
      benchAction[DataFrame]("stage0", d1x, dNx, { d =>
        val kept = graft.operators.Urls
          .urlDedupReport(graft.operators.Urls.withUrlPayload(d))
          .filter(col("keeper")).select(col("doc_id"))
          .join(d, Seq("doc_id"))
        graft.operators.Html.withHtmlPayload(kept)
          .select(col("doc_id"), graft.operators.Html
            .extractMainText(col("html")).as("text"))
          .agg(sum(length(col("text")))).collect(); ()
      }),
      // filteredserve: v30 — predicate over the carried metadata
      // prunes the staged index AT THE SCAN (PushedFilters), then the
      // same cell-pruned ADC as ivfpqserve; must track the index scan
      bench("filteredserve", fsIdx1, fsIdxN, idx =>
        Similarity.pqScoreCodesIndexed(idx.filter(col("label") % 2 === 0),
          queries, cents8, fsCb, k = 3, nprobe = 2)),
      // t57: PSL registrable domains — candidate explode (≤7/host) +
      // broadcast rule join + one max-struct per id + the id join
      // back; must track the scan (rules are fixed-size data; the
      // suffix-length sum forces the label slicing past pruning)
      benchAction[DataFrame]("t57", d1x, dNx, d => {
        graft.operators.Urls
          .registrableDomainPsl(graft.operators.Urls.withIntlUrlPayload(d),
            graft.operators.Urls.pslRules(spark))
          .agg(sum(length(col("public_suffix")))).collect(); ()
      }),
      // hashembed: the map-side feature-hash embed itself — one
      // projection, zero shuffle; count() would prune the embed away,
      // so force a component sum
      benchAction[DataFrame]("hashembed", d1x, dNx, d => {
        Similarity.hashEmbed(d, dims = 64)
          .agg(sum(element_at(col("embedding"), 1))).collect(); ()
      }),
      // hashserve: the v31 serve over the staged hash-embed index —
      // same probe-join shape as knnserve, must track the index scan
      bench("hashserve", hePsl1, hePslN, idx =>
        Similarity.ivfMultiprobeKnnIndexed(idx, heQs, heCents,
          k = 3, nprobe = 2, idCol = "doc_id")),
      // t59: link graph — href extraction is map-side, edge dedup one
      // exchange, pagerank rounds join edge-vs-node frames; plain
      // copies grow the bucket space (id/3), so nodes and edges grow
      // linearly and each round must track them
      benchAction[DataFrame]("t59", d1x, dNx, { d =>
        val own = graft.operators.Urls.withUrlPayload(d)
          .select(col("doc_id"), graft.operators.Urls
            .canonicalUrl(col("url")).as("src"))
        val links = graft.operators.Html.withLinkedHtmlPayload(d)
          .select(col("doc_id"), explode(graft.operators.Html
            .extractLinks(col("html"))).as("href"))
          .select(col("doc_id"), graft.operators.Urls
            .canonicalUrl(col("href")).as("dst"))
        // the rank-units sum forces every pagerank round — a count()
        // can skip the final left join (unique-keyed, count-preserving)
        graft.operators.Graph.pagerank(
          own.join(links, "doc_id").select(col("src"), col("dst"))
            .filter(col("src") =!= col("dst")), iters = 3)
          .agg(sum(col("rank_units"))).collect(); ()
      }),
      // q36: attribution — user-keyed view×purchase join (users
      // remapped per copy, per-user history fixed) + one min/max-
      // struct per purchase; forced through the touch-count sum
      benchAction[DataFrame]("q36", v1x, vNx, { e =>
        val v = e.filter(col("event_type") === "view")
          .select(col("user_id"), unix_micros(col("ts")).as("v_us"),
            col("event_id").as("v_id"))
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("p_id"),
            unix_micros(col("ts")).as("p_us"))
        p.join(v, Seq("user_id"))
          .filter(col("v_us") <= col("p_us") &&
            col("v_us") > col("p_us") - lit(3600000000L))
          .groupBy(col("p_id"))
          .agg(count(lit(1)).as("n_touches"))
          .agg(sum(col("n_touches"))).collect(); ()
      }),
      // t60: robots gate — rule parse is file-sized; the gate is a
      // broadcast join + max-struct per URL and must track the scan
      benchAction[DataFrame]("t60", d1x, dNx, { d =>
        val urls = graft.operators.Urls.withUrlPayload(d)
          .select(col("doc_id"), graft.operators.Urls
            .canonicalUrl(col("url")).as("url"))
        graft.operators.Robots.applyRobots(urls,
            graft.operators.Robots.parseRobots(
              graft.operators.Robots.fixture(spark)), "crawler-x")
          .agg(sum(when(col("allowed"), 1L).otherwise(0L))).collect(); ()
      }),
      // maxsimserve: v32 — candidate docs from the chunk-cell probe
      // join, exact MaxSim on candidates; the tagged fixture keeps
      // chunk vocab disjoint across copies so candidate sets stay
      // per-cell-bounded and the whole serve tracks the index scan
      bench("maxsimserve", msIdx1, msIdxN, idx =>
        graft.operators.LateInteraction.maxSimTopKIndexed(msQs, idx,
          msCents, k = 3, nprobe = 2)),
      // residserve: v33 — the residual-ADC serve; nprobe tables per
      // query are broadcast-side constants, so growth must track the
      // code-carrying index scan exactly like ivfpqserve
      bench("residserve", resIdx1, resIdxN, idx =>
        Similarity.pqScoreCodesIndexedResidual(idx, queries, cents8,
          resCb, k = 3, nprobe = 2)),
      // t61: anchor aggregation — anchor parse + canonicalization are
      // map-side; the group-by-page exchange and its windows grow with
      // the (linearly growing) page space; forced through the inlink
      // sum so the windows can't be pruned by a bare count
      benchAction[DataFrame]("t61", d1x, dNx, { d =>
        import org.apache.spark.sql.expressions.Window
        val an = graft.operators.Html.withLinkedHtmlPayload(d)
          .select(explode(
            graft.operators.Html.extractAnchors(col("html"))).as("a"))
          .select(graft.operators.Urls.canonicalUrl(col("a.href"))
            .as("page"), col("a.anchor").as("anchor"))
        val w = Window.partitionBy(col("page"))
        an.groupBy(col("page"), col("anchor"))
          .agg(count(lit(1)).as("ct"))
          .withColumn("n_inlinks", sum(col("ct")).over(w))
          .withColumn("rk", row_number().over(
            w.orderBy(col("ct").desc, col("anchor"))))
          .filter(col("rk") === 1)
          .agg(sum(col("n_inlinks"))).collect(); ()
      }),
      // bitext: v37 — margin mining with the FIXED base query sample
      // (the fixed-query-set convention): the forward brute leg scans
      // the growing y side once per query batch, the backward leg is
      // bounded by the candidate count, so the whole miner must track
      // the corpus scan, never corpus x corpus
      benchAction[DataFrame]("bitext", e1x, eNx, { e =>
        val xs = e.filter(col("vec_id") % 2 === 0)
        val ys = e.filter(col("vec_id") % 2 === 1)
        graft.operators.Bitext.marginPairs(xs, ys,
            queries.filter(col("vec_id") % 2 === 0), k = 4)
          .agg(sum(col("margin"))).collect(); ()
      }),
      // t62: sitemap coverage audit — the parsed sitemap side is
      // file-sized (fixed); the corpus-scale crawled set rides ONE
      // map-side broadcast semi-join (never shuffles), so the whole
      // audit must track the corpus scan; forced through the
      // fetch-rank sum so the window can't be pruned
      benchAction[DataFrame]("t62", d1x, dNx, { d =>
        val crawled = graft.operators.Urls.withUrlPayload(d)
          .select(graft.operators.Urls.canonicalUrl(col("url"))
            .as("canon_url"))
        graft.operators.Sitemaps.coverageAudit(
            graft.operators.Sitemaps.parseSitemap(
              graft.operators.Sitemaps.fixture(spark)), crawled)
          .agg(sum(col("fetch_rank"))).collect(); ()
      }),
      // t63: line dedup — the exploded-line distinct + per-line count
      // and the per-doc rebuild all grow with the corpus; the frequent
      // set stays broadcast-sized (boilerplate variety is bounded);
      // forced through the chars sum so the rebuild can't be pruned
      benchAction[DataFrame]("t63", d1x, dNx, { d =>
        graft.operators.Boilerplate.lineDedup(
            graft.operators.Boilerplate.withLinePayload(d),
            textCol = "page_text")
          .agg(sum(col("chars_removed"))).collect(); ()
      }),
      // t66: Luhn card redaction — pure map (extract + in-stage
      // validate + fold-replace per row, no shuffle); must track the
      // scan exactly; forced through the card-count sum
      benchAction[DataFrame]("t66", d1x, dNx, { d =>
        graft.operators.Redact.redactCardNumbers(
            graft.operators.Redact.withCardPayload(d),
            "doc_id", "page_text")
          .agg(sum(col("n_cards"))).collect(); ()
      }),
      // upsertserveD / upsertserveS: the deep-history changelog serve
      // with and without the snapshot — same logical state, same
      // query; the S leg's resolve scans |keys| + the unfolded tail
      {
        def upServe(dir: String): Unit = {
          val log = spark.read.option("basePath", dir).parquet(dir)
            .drop("batch_id")
          Similarity.pqScoreCodesIndexed(
            Similarity.latestIndexState(log), queries, cents8, upDCb,
            k = 3, nprobe = 2).count(); ()
        }
        benchAction[String]("upsertserveD", upD1, upDN, upServe)
      },
      {
        def upServe(dir: String): Unit = {
          val log = spark.read.option("basePath", dir).parquet(dir)
            .drop("batch_id")
          Similarity.pqScoreCodesIndexed(
            Similarity.latestIndexState(log), queries, cents8, upDCb,
            k = 3, nprobe = 2).count(); ()
        }
        benchAction[String]("upsertserveS", upS1, upSN, upServe)
      },
      // chunkserveD / chunkserveS: the set-valued resolve, raw deep
      // history vs the set-preserving snapshot — the window resolve
      // shuffles whatever history the dir holds, so the fold IS the
      // asymptotic lever here
      {
        def chServe(dir: String): Unit = {
          val log = spark.read.option("basePath", dir).parquet(dir)
            .drop("batch_id")
          Similarity.latestChunkState(log).count(); ()
        }
        benchAction[String]("chunkserveD", chD1, chDN, chServe)
      },
      {
        def chServe(dir: String): Unit = {
          val log = spark.read.option("basePath", dir).parquet(dir)
            .drop("batch_id")
          Similarity.latestChunkState(log).count(); ()
        }
        benchAction[String]("chunkserveS", chS1, chSN, chServe)
      },
      // maxsimserveT: the √N-retuned maxsim serve — each side serves
      // ITS OWN (index, centroids): the candidate set stays
      // nprobe/k-sliced as the corpus grows, where the fixed-k
      // maxsimserve control goes linear
      benchAction[(DataFrame, DataFrame)]("maxsimserveT",
        (msT1, msTCents1), (msTN, msTCentsN), { case (idx, cents) =>
          graft.operators.LateInteraction.maxSimTopKIndexed(msTQs, idx,
            cents, k = 3, nprobe = 2).count(); ()
        }),
      // t63apply: the map-only line-dedup apply against the staged
      // frequent-line artifact — broadcast + per-row filter, zero
      // corpus shuffle; must track the scan; forced through the
      // chars sum so the rebuild can't be pruned
      benchAction[(DataFrame, DataFrame)]("t63apply",
        (d1x, t63f1), (dNx, t63fN), { case (d, f) =>
          graft.operators.Boilerplate.applyLineDedup(
              graft.operators.Boilerplate.withLinePayload(d), f,
              textCol = "page_text")
            .agg(sum(col("chars_removed"))).collect(); ()
        }),
      // t64: the COMPOSED discovery frontier — gate + parse are
      // file-sized, the only corpus-scale stage is the audit's
      // broadcast semi-join (the t62 shape); forced through the
      // fetch-order sum so the rank window can't be pruned
      benchAction[DataFrame]("t64", d1x, dNx, { d =>
        val crawled = graft.operators.Urls.withUrlPayload(d)
          .select(graft.operators.Urls.canonicalUrl(col("url"))
            .as("canon_url"))
        graft.operators.Sitemaps.frontierFromGated(
            graft.operators.Sitemaps.gatedListed(
              graft.operators.Robots.fixture(spark),
              graft.operators.Sitemaps.fixture(spark), "crawler-x"),
            crawled)
          .agg(sum(col("fetch_order"))).collect(); ()
      }))

    val bar = factor * 2.5
    val bad = ratios.filter(_._2 > bar)
    println(s"[scalesmoke] bar=${bar}x  " +
      (if (bad.isEmpty) "PASS" else s"FAIL: ${bad.mkString(", ")}"))
    spark.stop()
    if (bad.nonEmpty) sys.exit(1)
  }
}

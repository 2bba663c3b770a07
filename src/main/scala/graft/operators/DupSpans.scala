package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokenize

/** Cross-document duplicated-span detection: for each document, how
  * much of it consists of word n-grams that also appear in *other*
  * documents. This is the "duplicated n-gram fraction" family of
  * filters (Rae et al. Gopher §A1.1, Penedo et al. RefinedWeb) used to
  * demote boilerplate, mirrored templates, and near-copies that
  * MinHash-level dedup ([[Dedup]]) keeps because the docs as a whole
  * are dissimilar. Complements [[Repetition]] (intra-doc repeats) and
  * [[Decontaminate]] (corpus-vs-benchmark overlap): this one is
  * corpus-vs-itself.
  *
  * Scale shape: grams explode map-side and are immediately reduced to
  * one row per (doc, gram) with a partial-aggregated count, so the
  * shuffle carries a 64-bit-equivalent gram key + a count — never the
  * span text. The gram→doc-count aggregate and the join back are both
  * keyed on that same hash, so AQE co-partitions them with no extra
  * exchange. Nothing is ever all-pairs: a gram shared by d documents
  * costs d rows, not d² pair rows.
  */
object DupSpans {

  /** 64-bit-equivalent gram key: the first 16 hex chars of md5. Both
    * sides of the oracle derive the identical key, so grouping by the
    * hash is exactly mirrorable; collision probability at 2⁻⁶⁴ is
    * negligible against corpus sizes (and a collision only ever
    * *overcounts* duplication by one gram).
    */
  private def gramKey(g: org.apache.spark.sql.Column) =
    substring(md5(g), 1, 16)

  /** Per-doc duplicated-span report.
    *
    * @param n gram width in words; a doc with fewer than n words has
    *          zero gram slots (null `dup_frac`).
    * @return one row per input doc: (id, n_grams, dup_grams, dup_frac)
    *         where `dup_grams` counts gram *occurrences* (multiplicity
    *         kept — a doc that repeats a shared span is more
    *         duplicated, not less) whose gram occurs in ≥ 2 distinct
    *         docs.
    */
  def report(docs: DataFrame, idCol: String, textCol: String,
             n: Int): DataFrame = {
    require(n >= 2, s"gram width must be >= 2 words, got $n")
    val grams = docs
      .select(col(idCol), tokenize(col(textCol)).as("w"))
      .filter(size(col("w")) >= n)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("w")) - (n - 1)),
        i => array_join(slice(col("w"), i, lit(n)), " "))).as("g"))
    // one row per (doc, gram) with its in-doc multiplicity — the only
    // shuffle of gram granularity, map-side combined before exchange
    val dg = grams
      .groupBy(col(idCol), gramKey(col("g")).as("gh"))
      .agg(count(lit(1)).as("ct"))
    // dg is already distinct per (doc, gram): counting rows per gram
    // IS the distinct-doc count
    val gd = dg.groupBy(col("gh")).agg(count(lit(1)).as("n_docs"))
    val agg = dg.join(gd, "gh")
      .groupBy(col(idCol))
      .agg(sum(col("ct")).as("n_grams"),
        sum(when(col("n_docs") >= 2, col("ct")).otherwise(lit(0L)))
          .as("dup_grams"))
    // every input doc surfaces, including those too short for a gram
    docs.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("dup_grams"), lit(0L)).as("dup_grams"),
        // null (not 0) when the doc has no gram slots: "no signal",
        // the same convention as Repetition.report's fractions
        (col("dup_grams").cast("double") / col("n_grams").cast("double"))
          .as("dup_frac"))
  }

  /** Duplicated-span REMOVAL — the rewrite step [[report]] only
    * measures (Lee et al., "Deduplicating Training Data Makes
    * Language Models Better": cross-doc duplicated spans are cut from
    * the text, not used to drop whole documents). A token is removed
    * iff it is covered by at least one n-gram occurring in ≥ 2
    * distinct documents; surviving tokens rejoin in order. Emits one
    * row per doc: (id, n_tokens, n_removed, cleaned_text) —
    * `cleaned_text` null for null input text.
    *
    * Scale shape: the gram/dup-set legs are [[report]]'s (hash-keyed,
    * vocab-sized, never span text across a shuffle); the only new
    * state is the per-doc duplicated-START-POSITION list, bounded by
    * the doc's own length, aggregated back onto the doc row where a
    * per-row lambda erases covered tokens — removal is map-side work
    * on each doc, never a cross-doc operation.
    */
  /** Exact duplicate substrings of length ≥ `minLen` tokens — the
    * published exact-substring dedup rule (Lee et al. 2022 §4.1 run
    * their suffix-array EXACTSUBSTR at 50 tokens): report every
    * maximal token range of a document whose every `minLen`-token
    * window also occurs verbatim in at least one OTHER document.
    * Complements [[report]]/[[removeDupSpans]] (short-gram coverage):
    * the length threshold makes this precise — boilerplate sentences
    * shorter than `minLen` are untouched — at the cost of missing
    * short duplicates, which is exactly the published trade-off.
    *
    * Method: fingerprint every `minLen`-token window ([[gramKey]] of
    * the window text — the relational stand-in for the suffix-array
    * pass, identical output on collision-free data), keep windows
    * whose fingerprint occurs in ≥ 2 distinct docs, and merge each
    * doc's surviving window starts into maximal spans (two windows
    * merge iff their covered token ranges overlap or touch:
    * s₂ ≤ s₁ + minLen). The gaps-and-islands pass runs per doc over
    * its own duplicated starts — bounded by doc length, never
    * cross-doc. Shuffles carry 16-hex window keys and integer starts
    * only; a window in d docs costs d rows, never d².
    *
    * @return (id, span_start, span_end, span_tokens, n_windows), one
    *         row per maximal duplicated span; token positions 1-based
    *         inclusive. Docs with no duplicated window emit no rows.
    */
  def exactSubstrings(docs: DataFrame, idCol: String, textCol: String,
                      minLen: Int): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2 tokens, got $minLen")
    val wins = windowRows(docs, idCol, textCol, minLen)
    val dup = wins.select(col(idCol), col("wh")).distinct()
      .groupBy(col("wh")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2).select("wh")
    // distinct starts: a window text repeated at two starts of one doc
    // contributes both starts once each
    val starts = wins.join(dup, "wh").select(col(idCol), col("s")).distinct()
    islandSpans(starts, idCol, minLen)
  }

  /** Gaps-and-islands merge of duplicated window starts into maximal
    * spans — shared by the batch operator and the streaming twin. Input
    * is distinct (id, s) rows; per-doc window state is bounded by the
    * doc's own duplicated-start count.
    */
  private def islandSpans(starts: DataFrame, idCol: String,
                          minLen: Int): DataFrame = {
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("s"))
    starts
      // new island iff this window's range no longer touches the
      // previous one's: s > prev_s + minLen (first row: null → 0)
      .withColumn("_nw",
        when(col("s") > lag(col("s"), 1).over(byDoc) + minLen, lit(1))
          .otherwise(lit(0)))
      .withColumn("_isl", sum(col("_nw")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("_isl"))
      .agg(min(col("s")).cast("long").as("span_start"),
        (max(col("s")) + (minLen - 1)).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1L).as("span_tokens"),
        col("n_windows"))
  }

  /** Window-fingerprint rows of a (possibly tiny, batch-sized) doc
    * frame: (id, s, wh) for every minLen-token window.
    */
  private def windowRows(docs: DataFrame, idCol: String, textCol: String,
                         minLen: Int): DataFrame =
    docs
      .select(col(idCol), tokenize(col(textCol)).as("w"))
      .filter(size(col("w")) >= minLen)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("w")) - (minLen - 1)),
        i => struct(i.as("s"),
          gramKey(array_join(slice(col("w"), i, lit(minLen)), " "))
            .as("wh")))).as("p"))
      .select(col(idCol), col("p.s").as("s"), col("p.wh").as("wh"))

  /** Streaming [[exactSubstrings]] against a growing window-fingerprint
    * index — the bucket-index recipe of
    * [[Dedup.streamingCandidatePairs]] applied to exact-substring
    * detection: per micro-batch, a doc's window is duplicated iff the
    * same window text occurs in ANOTHER doc of this batch or anywhere
    * in the accumulated index; duplicated starts merge into maximal
    * spans ([[islandSpans]]) and `onBatch` receives the batch's span
    * rows. The batch's distinct (wh, id) rows then append to the
    * index under a `batch_id=N` partition — Overwrite per partition,
    * so a replayed batch rewrites its own rows instead of
    * double-counting (exactly-once detection under at-least-once
    * foreachBatch). All data in one batch ≡ the batch operator;
    * across batches, detection happens at ARRIVAL time (the later
    * copy reports the span), the same directionality as the LSH
    * bucket-index probe.
    *
    * Scale: per batch, one equi-join of batch window keys against the
    * index (a window in d docs costs d rows) plus the per-doc island
    * merge; index reads prune to `batch_id < current` via partition
    * pruning.
    */
  def streamingExactSubstrings(stream: DataFrame, indexDir: String,
      onBatch: (Long, DataFrame) => Unit,
      idCol: String = "doc_id", textCol: String = "text",
      minLen: Int = 50)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(minLen >= 2, s"minLen must be >= 2 tokens, got $minLen")
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val wins = windowRows(batch, idCol, textCol, minLen).persist()
      val indexPath = new org.apache.hadoop.fs.Path(indexDir)
      val fs = indexPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // within-batch rule: same window text in >= 2 batch docs
      val dupLocal = wins.select(col(idCol), col("wh")).distinct()
        .groupBy(col("wh")).agg(count(lit(1)).as("_n"))
        .filter(col("_n") >= 2).select("wh")
      val dupKeys =
        if (!fs.exists(indexPath)) dupLocal
        else {
          val index = spark.read.option("basePath", indexDir)
            .parquet(indexDir)
          require(index.columns.contains("batch_id"),
            s"$indexDir is not a batch_id-partitioned window index; " +
              "rebuild it (no in-place migration from other layouts)")
          // strictly-prior batches only: a replayed batch must not
          // probe its own half-written keys
          dupLocal.unionByName(
            index.filter(col("batch_id") < batchId).select("wh"))
            .distinct()
        }
      val starts = wins.join(dupKeys, "wh")
        .select(col(idCol), col("s")).distinct()
      onBatch(batchId, islandSpans(starts, idCol, minLen))
      wins.select(col("wh"), col(idCol)).distinct()
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(indexDir)
      wins.unpersist()
      () // pin the Unit-returning foreachBatch overload
    }
  }

  /** [[exactSubstrings]]' REMOVAL twin with keep-first semantics —
    * Lee et al. remove all but one occurrence of each duplicated
    * substring: a window is removable from doc d iff the same window
    * text occurs in a LOWER-id doc (the canonical copy survives
    * where [[removeDupSpans]] obliterates every occurrence). Tokens
    * covered by any removable window are cut; survivors rejoin in
    * order. Output matches removeDupSpans: (id, n_tokens, n_removed,
    * cleaned_text).
    *
    * Same scale shape as exactSubstrings, plus one keeper aggregate:
    * min(doc_id) per window key is partial-aggregatable; the
    * removable-start lists aggregate back per doc (bounded by doc
    * length) and the cut is a per-row lambda.
    */
  def removeExactSubstrings(docs: DataFrame, idCol: String,
                            textCol: String, minLen: Int): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2 tokens, got $minLen")
    val toks = docs
      .select(col(idCol), col(textCol), tokenize(col(textCol)).as("w"))
    val wins = windowRows(docs, idCol, textCol, minLen)
    // keeper = lowest doc id holding the window; removable elsewhere
    val keeper = wins.groupBy(col("wh"))
      .agg(min(col(idCol)).as("_keep"))
    val starts = wins.join(keeper, "wh")
      .filter(col(idCol) > col("_keep"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_set(col("s"))).as("_starts"))
    toks.join(starts, Seq(idCol), "left")
      .withColumn("_starts",
        coalesce(col("_starts"), array().cast("array<int>")))
      .select(col(idCol),
        size(col("w")).cast("long").as("n_tokens"),
        (size(col("w")) - size(filter(col("w"), (_, j) =>
          !exists(col("_starts"), s =>
            s <= j + 1 && j + 1 <= s + (minLen - 1))))).cast("long")
          .as("n_removed"),
        array_join(filter(col("w"), (_, j) =>
          !exists(col("_starts"), s =>
            s <= j + 1 && j + 1 <= s + (minLen - 1))), " ")
          .as("cleaned_text"))
  }

  def removeDupSpans(docs: DataFrame, idCol: String, textCol: String,
                     n: Int): DataFrame = {
    require(n >= 2, s"gram width must be >= 2 words, got $n")
    val toks = docs
      .select(col(idCol), col(textCol), tokenize(col(textCol)).as("w"))
    val grams = toks
      .filter(size(col("w")) >= n)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("w")) - (n - 1)),
        i => struct(i.as("i"),
          gramKey(array_join(slice(col("w"), i, lit(n)), " ")).as("gh"))))
        .as("p"))
      .select(col(idCol), col("p.i").as("i"), col("p.gh").as("gh"))
    // grams in >= 2 distinct docs (the report's dup rule)
    val dup = grams.select(col(idCol), col("gh")).distinct()
      .groupBy(col("gh")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2).select(col("gh"))
    val starts = grams.join(dup, "gh")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("i"))).as("_starts"))
    toks.join(starts, Seq(idCol), "left")
      .withColumn("_starts",
        coalesce(col("_starts"), array().cast("array<int>")))
      .select(col(idCol),
        size(col("w")).cast("long").as("n_tokens"),
        (size(col("w")) - size(filter(col("w"), (_, j) =>
          !exists(col("_starts"), s =>
            s <= j + 1 && j + 1 <= s + (n - 1))))).cast("long")
          .as("n_removed"),
        array_join(filter(col("w"), (_, j) =>
          !exists(col("_starts"), s =>
            s <= j + 1 && j + 1 <= s + (n - 1))), " ").as("cleaned_text"))
  }
}

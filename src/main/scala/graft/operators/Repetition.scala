package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions.tokenize

/** Gopher-style repetition-quality signals, per document: how much of a
  * doc is the same few words/phrases repeated. The curation rule "drop
  * docs whose most common 2-gram covers too much of the text" (Rae et
  * al., Gopher §A1.1) is the standard pre-training filter for
  * boilerplate and keyword-stuffed spam; the reference's quality
  * surface (length/punct/stopword, `TextOps` t3) has no repetition
  * axis, so this fills it.
  *
  * Everything is computed with codegen'd higher-order array functions
  * on the row itself — tokenize, `array_distinct`, `array_sort` + one
  * `aggregate` run-length fold for the top-bigram count — so the
  * operator is a pure map: ZERO shuffle, no explode, no join, at any
  * scale. (An explode+groupBy formulation would shuffle one row per
  * bigram — ~doc_len× the data volume — to compute a per-doc number.)
  */
object Repetition {

  /** Most-repeated-bigram count via sort + run-length fold: equal
    * bigrams are adjacent after `array_sort`, so the longest run IS the
    * top count. The fold carries (prev, run, best) through one linear
    * pass — O(L log L) per row, all inside whole-stage codegen.
    */
  def topBigramCount(text: Column): Column = {
    val words = tokenize(text)
    val n = size(words)
    val bigrams = when(n >= 2,
      zip_with(slice(words, lit(1), n - 1), slice(words, lit(2), n - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast(ArrayType(StringType)))
    aggregate(
      array_sort(bigrams),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))
  }

  /** Per-doc repetition report: word counts plus the two Gopher-rule
    * fractions. Ratios are int÷int in double (engine-portable); empty
    * docs yield null fractions (nullif denominators), never an ANSI
    * divide-by-zero.
    */
  def report(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val words = tokenize(col(textCol))
    val n = size(words)
    val distinctN = size(array_distinct(words))
    docs.select(
      col(idCol),
      n.as("n_words"),
      distinctN.as("distinct_words"),
      topBigramCount(col(textCol)).as("top_bigram_ct"),
      (lit(1.0) - distinctN.cast(DoubleType) / nullif(n, lit(0)))
        .as("dup_word_frac"),
      // greatest(n-1, 0): an empty doc has -1 "bigram slots", which
      // would dodge the nullif and yield -0.0 — clamp so it nulls out
      (topBigramCount(col(textCol)).cast(DoubleType) /
        nullif(greatest(n - 1, lit(0)), lit(0))).as("top_bigram_frac"))
  }

  /** WITHIN-doc duplicate-chunk removal, keep-first: split the doc
    * into fixed `n`-word chunks (the `Dedup.chunkDedup` grid — same
    * trailing-partial rule) and keep only each chunk's FIRST
    * occurrence inside its own document. This is the repair twin of
    * the [[report]] signals — the "remove repeated lines/paragraphs
    * within a page" rule (C4 dedups repeated lines; MassiveText
    * filters on within-doc repetition) — and the LOCAL complement of
    * the corpus-wide `Dedup.chunkDedup` (which keeps one copy
    * GLOBALLY; run this first so boilerplate repeated inside a page
    * doesn't hand the global keep to whichever doc sorts first).
    *
    * keep-first per row: chunk i survives iff `array_position`
    * (FIRST index of that value) equals i — a pure higher-order
    * filter on the chunk array. O(chunks²) comparisons per row, all
    * inside whole-stage codegen, and like everything in this object
    * a pure map: ZERO shuffle at any corpus size. Emits the
    * deduplicated text plus kept/dropped counts (d10's report
    * shape).
    */
  /** WITHIN-doc duplicated-chunk fraction as a pure column:
    * (chunks − distinct chunks) / chunks over the [[dedupWithin]]
    * grid — the gate form of that operator (null for docs with no
    * chunks: "no signal"). `array_distinct` instead of the keep-first
    * filter because only the COUNT matters here, and the distinct
    * count is the same set size.
    */
  def dupChunkFrac(textCol: Column, n: Int = 3): Column = {
    val w = split(textCol, " ")
    val chunks = transform(
      sequence(lit(0),
        ceil(size(w).cast(DoubleType) / n).cast(LongType) - 1),
      j => concat_ws(" ", slice(w, (j * n + 1).cast(IntegerType), lit(n))))
    // null text guarded OUTSIDE the sequence: size(null) = -1 would
    // make sequence(0, -1) step downward, not produce empty
    when(textCol.isNotNull,
      (size(chunks) - size(array_distinct(chunks))).cast(DoubleType) /
        nullif(size(chunks), lit(0)))
  }

  def dedupWithin(docs: DataFrame, n: Int = 3, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val chunks = transform(
      sequence(lit(0),
        ceil(size(col("_w")).cast(DoubleType) / n).cast(LongType) - 1),
      j => concat_ws(" ",
        slice(col("_w"), (j * n + 1).cast(IntegerType), lit(n))))
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), split(col(textCol), " ").as("_w"))
      .withColumn("_c", chunks)
      .withColumn("_k",
        filter(col("_c"), (c, i) => array_position(col("_c"), c) === i + 1))
      .select(col(idCol),
        array_join(col("_k"), " ").as("clean_text"),
        size(col("_k")).cast(LongType).as("kept_chunks"),
        (size(col("_c")) - size(col("_k"))).cast(LongType)
          .as("dropped_chunks"))
  }
}

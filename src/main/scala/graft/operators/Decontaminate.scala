package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions.tokenize

/** Benchmark decontamination: find corpus documents sharing word
  * n-grams with a (small) benchmark/eval set — the overlap check every
  * training pipeline runs before a data release so eval questions
  * don't leak into the training corpus (the GPT-3 appendix-C 13-gram
  * rule). The reference has exact/near dedup WITHIN a corpus
  * (`Dedup`); this is the asymmetric variant against a protected set.
  *
  * Scale shape: the benchmark side is eval-set sized (thousands of
  * docs), so its distinct gram set is collected into a broadcast hash
  * join — the 100 TB corpus side is a pure map (tokenize → gram →
  * per-doc distinct, all codegen'd HOFs) and is NEVER shuffled; the
  * only exchange is the final per-doc hit count, which partial-
  * aggregates map-side. For benchmark sets too big to broadcast raw,
  * hash each gram to 8 bytes first (`xxhash64`) — same join, 10×
  * smaller build side.
  */
object Decontaminate {

  /** Sliding word n-grams over an ALREADY-TOKENIZED array column.
    * `words` must be a bound attribute (a projected column), not an
    * expression tree: the `transform` lambda below evaluates `words`
    * once per gram position, so passing `tokenize(text)` directly
    * re-splits the whole document per position — O(L²) per doc (a
    * measured 3× slowdown on t13 before the pre-projection).
    */
  def wordNgramsOf(words: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    when(size(words) >= n,
      transform(sequence(lit(1), size(words) - (n - 1)),
        i => concat_ws(" ", slice(words, i, lit(n)))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Sliding word n-grams as space-joined strings; docs shorter than n
    * yield an empty array (never a negative-length sequence). For bulk
    * scans prefer projecting `tokenize(text)` into its own column
    * first and calling [[wordNgramsOf]] — see its scaladoc.
    */
  def wordNgrams(text: Column, n: Int): Column =
    wordNgramsOf(tokenize(text), n)

  /** Per-corpus-doc contamination report: (id, hit_ct) where hit_ct =
    * #distinct n-grams of the doc that appear anywhere in `bench`.
    * Docs with zero overlap are absent (the common case — keep the
    * result sparse).
    */
  def contaminationReport(corpus: DataFrame, bench: DataFrame,
                          idCol: String, textCol: String,
                          n: Int): DataFrame = {
    // eval-set sized: distinct grams then broadcast to every executor
    val benchGrams = bench
      .select(tokenize(col(textCol)).as("_w"))
      .select(explode(wordNgramsOf(col("_w"), n)).as("g"))
      .distinct()
    corpus
      // tokenize in its OWN projection so the gram lambda reads a
      // bound array, not the split expression (see wordNgramsOf);
      // array_distinct BEFORE explode: per-doc dedup happens in the
      // row, so repeated grams never reach the join
      .select(col(idCol), tokenize(col(textCol)).as("_w"))
      .select(col(idCol), explode(array_distinct(wordNgramsOf(col("_w"), n))).as("g"))
      .join(broadcast(benchGrams), "g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("hit_ct"))
  }
}

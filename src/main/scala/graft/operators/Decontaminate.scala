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

  /** Bloom-prefiltered [[contaminationReport]]: bit-identical output,
    * but corpus grams pass through a Bloom membership test BEFORE any
    * join — the 100 TB shape when the benchmark gram set is too large
    * to broadcast raw. The bloom stage is a pure map (k codegen'd
    * xxhash64 probes against a literal bit array, ~1 bit/gram of
    * protected content at these parameters vs ~30 bytes/gram raw), so
    * only the tiny surviving fraction ever reaches the exact-verify
    * join — which therefore no longer NEEDS to be a broadcast: with
    * survivors at ~fp-rate × corpus, a shuffled equi-join on the gram
    * is executor-memory-safe however big the benchmark grows.
    *
    * Exactness contract: Bloom filters have no false negatives, and
    * every false positive dies in the exact join — so the output
    * equals [[contaminationReport]]'s on any input (the t26 oracle
    * certifies this cross-engine against the gridless exact SQL).
    *
    * The filter is built WITH Spark's own xxhash64 (one eval-set-sized
    * job collecting bit positions, never the grams themselves), so the
    * probe side is guaranteed hash-compatible with the build side.
    *
    * @param bitsLog2 log2 of the bit-array size (default 2²⁰ bits =
    *   16K longs in the plan literal); size ~10 bits/gram for ~1% fp
    * @param k number of hash probes per gram
    */
  def contaminationReportBloom(corpus: DataFrame, bench: DataFrame,
                               idCol: String, textCol: String, n: Int,
                               bitsLog2: Int = 20, k: Int = 5): DataFrame =
    // persisted: the eval-set-sized gram frame feeds BOTH the bit-
    // position collect and the exact-verify join — without the cache
    // the tokenize+explode+distinct lineage runs twice (the
    // candidatePairs persist rationale: AQE bypasses ReusedExchange)
    contaminationReportBloomGrams(corpus,
      benchGramSet(bench, textCol, n).persist(),
      idCol, textCol, n, bitsLog2, k)

  /** The benchmark's distinct n-gram set — the BUILD half of the
    * decontamination build/serve split: in production this is staged
    * once per benchmark release ([[graft.core.Artifacts]]) and every
    * pipeline run serves it, instead of re-tokenizing the eval set
    * per run. Feed it to [[contaminationReportBloomGrams]] /
    * [[contaminationReportGrams]].
    */
  def benchGramSet(bench: DataFrame, textCol: String, n: Int): DataFrame =
    bench
      .select(tokenize(col(textCol)).as("_w"))
      .select(explode(wordNgramsOf(col("_w"), n)).as("g"))
      .distinct()

  /** [[contaminationReportBloom]] with a pre-built gram set (column
    * `g`) — the SERVE half. `benchGrams` should be distinct; a staged
    * artifact or the inline [[benchGramSet]] both qualify.
    */
  def contaminationReportBloomGrams(corpus: DataFrame,
                                    benchGrams: DataFrame,
                                    idCol: String, textCol: String, n: Int,
                                    bitsLog2: Int = 20, k: Int = 5)
      : DataFrame = {
    require(bitsLog2 >= 6 && bitsLog2 <= 30,
      s"bitsLog2 must be in [6, 30], got $bitsLog2")
    require(k >= 1 && k <= 16, s"k must be in [1, 16], got $k")
    val m = 1L << bitsLog2
    // probe i's position for gram g; seeding by prefix keeps the k
    // probes independent while reusing the codegen'd hash both sides
    def pos(g: Column, i: Int): Column =
      pmod(xxhash64(concat(lit(s"b$i:"), g)), lit(m))
    // build: positions (not grams) come back to the driver — k × |bench
    // grams| longs, eval-set sized
    val setBits = benchGrams
      .select(explode(array((0 until k).map(i => pos(col("g"), i)): _*))
        .as("p"))
      .distinct().collect().map(_.getLong(0))
    val words = new Array[Long](1 << (bitsLog2 - 6))
    setBits.foreach { p =>
      words((p >>> 6).toInt) |= (1L << (p & 63L))
    }
    val bits = typedLit(words.toSeq)
    val hit = (g: Column) => (0 until k)
      .map { i =>
        val p = pos(g, i)
        // bitwiseAND, not % 2: arithmetic shiftright keeps the sign
        // bit, and Spark's % is a remainder (-3 % 2 = -1) — a set bit
        // in a negative word would read as unset under % 2 = 1
        (call_function("shiftright",
          element_at(bits, (p / 64 + 1).cast("int")),
          (p % 64).cast("int")).bitwiseAND(lit(1L)) === 1)
      }
      .reduce(_ && _)
    corpus
      .select(col(idCol), tokenize(col(textCol)).as("_w"))
      .select(col(idCol),
        explode(array_distinct(wordNgramsOf(col("_w"), n))).as("g"))
      .filter(hit(col("g")))
      // exact verify over the survivors; deliberately NOT broadcast —
      // see scaladoc (AQE may still choose broadcast when small)
      .join(benchGrams, "g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("hit_ct"))
  }

  /** Per-corpus-doc contamination report: (id, hit_ct) where hit_ct =
    * #distinct n-grams of the doc that appear anywhere in `bench`.
    * Docs with zero overlap are absent (the common case — keep the
    * result sparse).
    */
  def contaminationReport(corpus: DataFrame, bench: DataFrame,
                          idCol: String, textCol: String,
                          n: Int): DataFrame =
    // eval-set sized: distinct grams then broadcast to every executor
    contaminationReportGrams(corpus,
      benchGramSet(bench, textCol, n), idCol, textCol, n)

  /** [[contaminationReport]] with a pre-built distinct gram set
    * (column `g`) — the SERVE half of the build/serve split.
    */
  def contaminationReportGrams(corpus: DataFrame, benchGrams: DataFrame,
                               idCol: String, textCol: String,
                               n: Int): DataFrame = {
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

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the missing tier above the
  * rule-based gates (`Repetition`, `TextFunctions.qualityScore`):
  * production pipelines (CCNet's fastText LM filter, the GPT-3 /
  * PaLM "pagelike" logistic classifiers) TRAIN a linear text
  * classifier on a labeled seed (wiki-like = positive, raw crawl =
  * negative) and keep docs the model scores positive. A multinomial
  * Naive Bayes with bag-of-words features IS a linear classifier
  * (score = Σ_w log-odds(w)), and its training is nothing but token
  * counting — two aggregations — which makes it the natural
  * Spark-distributed, deterministic member of that family: no SGD,
  * no float accumulation order, bit-identical on every run.
  *
  * Determinism discipline (same as `Frequency.unigramSurprisal`):
  * all log₂ terms are INTEGER bit-lengths (⌊log₂ x⌋ =
  * `length(bin(x)) − 1`), so weights, scores, and verdicts are exact
  * integers until the final per-token mean — replayable cross-engine
  * (the DuckDB oracle runs the same arithmetic).
  *
  * Scale shape: training is one token explode → per-(term, class)
  * partial-aggregated count (ONE shuffle, state ∝ vocabulary);
  * scoring is a token explode → broadcast join against the
  * vocabulary-sized model → per-doc sum (ONE shuffle). The corpus is
  * never shuffled row-wise in either phase.
  */
object Classify {

  /** ⌊log₂ x⌋ for x ≥ 1 as an integer column. */
  private def bits(x: Column): Column = length(bin(x)) - 1

  /** Train the NB log-odds model: (term, w_bits) where
    * w_bits(term) = ⌊log₂(ct⁺+1)⌋ − ⌊log₂(ct⁻+1)⌋
    *              − ⌊log₂(N⁺+V)⌋ + ⌊log₂(N⁻+V)⌋
    * (Laplace-smoothed class-conditional log-likelihood ratio; the
    * normalizer constants are folded in per term so scoring is a
    * single weight-sum). Terms unseen in one class get the smoothed
    * floor. The score of a term seen in NO class — possible only
    * when scoring out-of-train docs — is the same formula at
    * ct⁺ = ct⁻ = 0, exposed as [[unseenBits]].
    *
    * `label` must be a boolean column over `docs` (true = positive
    * seed). Class priors are intentionally NOT folded in: the
    * operator scores CONTENT; callers with unbalanced seeds add
    * `bits(n⁺) − bits(n⁻)` themselves if they want MAP verdicts.
    */
  def nbTrain(docs: DataFrame, toks: Column, label: Column): DataFrame = {
    val tok = docs.select(label.as("_pos"), explode(toks).as("term"))
    val counts = tok.groupBy(col("term"))
      .agg(sum(when(col("_pos"), 1L).otherwise(0L)).as("ctp"),
        sum(when(col("_pos"), 0L).otherwise(1L)).as("ctn"))
    // class totals + vocab size: three scalars, one tiny agg
    val tot = counts.agg(sum(col("ctp")).as("np"), sum(col("ctn")).as("nn"),
      count(lit(1)).as("v"))
    counts.crossJoin(broadcast(tot))
      .select(col("term"),
        (bits(col("ctp") + 1) - bits(col("ctn") + 1)
          - bits(col("np") + col("v")) + bits(col("nn") + col("v")))
          .cast("long").as("w_bits"))
  }

  /** The weight of a term absent from the training vocabulary:
    * ct⁺ = ct⁻ = 0 ⇒ −⌊log₂(N⁺+V)⌋ + ⌊log₂(N⁻+V)⌋. Needs the same
    * (N⁺, N⁻, V) the model was trained with, so it is derived from
    * the same inputs rather than stored; callers scoring the train
    * corpus itself never hit it.
    */
  def unseenBits(docs: DataFrame, toks: Column, label: Column): Column = {
    // driver-side: three scalars
    val row = docs.select(label.as("_pos"), explode(toks).as("term"))
      .agg(sum(when(col("_pos"), 1L).otherwise(0L)),
        sum(when(col("_pos"), 0L).otherwise(1L)),
        countDistinct(col("term"))).head()
    val (np, nn, v) = (row.getLong(0), row.getLong(1), row.getLong(2))
    lit((63 - java.lang.Long.numberOfLeadingZeros(nn + v)).toLong
      - (63 - java.lang.Long.numberOfLeadingZeros(np + v)).toLong)
  }

  /** Score docs against a trained model: per doc,
    * score_bits = Σ over TOKEN INSTANCES of w_bits (multinomial NB),
    * n_tokens, avg_bits = score_bits / n_tokens (the length-
    * normalized quality signal — what a percentile gate consumes),
    * and pred = score_bits ≥ 0 (the balanced-prior verdict).
    * `unseenW` fills tokens outside the model vocabulary.
    */
  def nbScore(docs: DataFrame, idCol: String, toks: Column,
              model: DataFrame, unseenW: Column = lit(0L)): DataFrame =
    docs.select(col(idCol), explode(toks).as("term"))
      .join(broadcast(model), Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("w_bits"), unseenW)).cast("long").as("score_bits"))
      .withColumn("avg_bits",
        col("score_bits").cast("double") / col("n_tokens"))
      .withColumn("pred", col("score_bits") >= 0L)
}

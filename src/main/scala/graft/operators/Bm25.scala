package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.TextFunctions.{nTokens, tokenize}

/** BM25 ranked retrieval over a document corpus: score every document
  * against a fixed bag of query terms and return the top-k — the
  * relevance layer a corpus-curation stack uses for "find docs about
  * X" audits and for query-targeted data selection.
  *
  * Scoring follows Robertson–Spärck Jones BM25 with one deliberate
  * twist: the idf factor is the RATIO (N − df + ½)/(df + ½) rather
  * than its logarithm. The ranking is unchanged for single-term
  * queries and near-identical in practice for short ones, and every
  * arithmetic op stays rational — `ln` is the one step whose last bit
  * depends on the platform's libm, which would break bit-exact
  * reproducibility across engines (the property all our oracle checks
  * rest on). A production deployment that wants the classic curve can
  * wrap the ratio in `log1p` at the cost of engine-exact comparisons.
  *
  * Scale shape: term frequencies explode only the query terms (the
  * `isin` filter runs before the shuffle, so the exchange carries ≤
  * |terms| rows per doc); df and the corpus length stats are
  * model-sized aggregates joined back by broadcast; the final top-k
  * is a `TakeOrderedAndProject`, never a global sort. Per-doc term
  * scores are summed in FIXED term-list order via conditional
  * aggregates — a plain float `sum` would add in partition order and
  * lose cross-engine determinism.
  */
object Bm25 {

  def topK(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    require(terms.distinct.size == terms.size, "query terms must be unique")

    // dl rides along as a grouping key (it's functionally dependent on
    // the doc id) — one scan yields per-doc tf for EVERY term at once
    // (conditional counts), so the whole match side is ONE shuffle; the
    // earlier per-(doc, term) form shuffled once for tf, again for df,
    // and a third time for the per-doc sum
    val perDoc = docs
      .select(col(idCol), nTokens(col(textCol)).as("dl"),
        explode(tokenize(col(textCol))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("dl"))
      .agg(
        count(when(col("term") === terms.head, lit(1))).as("_tf0"),
        terms.zipWithIndex.tail.map { case (t, i) =>
          count(when(col("term") === t, lit(1))).as(s"_tf$i")
        }: _*)
    // document frequencies fold over the (small) matched-doc frame,
    // not a second corpus scan; corpus stats are the one other scan
    val df = perDoc.agg(
      sum(when(col("_tf0") > 0, 1L)).as("_df0"),
      terms.indices.tail.map(i =>
        sum(when(col(s"_tf$i") > 0, 1L)).as(s"_df$i")): _*)
    val stats = docs.agg(count(lit(1)).as("n"),
      sum(nTokens(col(textCol)).cast("long")).as("toks"))

    // one IEEE op per step, mirrored textually by the SQL oracle —
    // constants like k1+1 are combined IN the expression (not
    // pre-folded in Scala) so both engines perform the identical
    // float-op sequence, tie-breaks included. Per-term scores sum in
    // FIXED term-list order (coalesced at zero tf), preserving the
    // bit-exact total the oracle checks.
    val avgdl = col("toks").cast(DoubleType) / col("n")
    def termScore(i: Int): Column = {
      val idf = (col("n").cast(DoubleType) - col(s"_df$i") + lit(0.5)) /
        (col(s"_df$i").cast(DoubleType) + lit(0.5))
      val tfD = col(s"_tf$i").cast(DoubleType)
      val s = idf * (tfD * (lit(k1) + lit(1.0))) /
        (tfD + lit(k1) *
          ((lit(1.0) - lit(b)) + lit(b) * col("dl").cast(DoubleType) / avgdl))
      when(col(s"_tf$i") > 0, s).otherwise(lit(0.0))
    }
    val total = terms.indices.map(termScore).reduce(_ + _)

    perDoc
      .crossJoin(broadcast(df))
      .crossJoin(broadcast(stats))
      .select(col(idCol), total.as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}

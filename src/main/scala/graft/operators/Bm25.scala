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
    // the doc id) — one scan yields tf AND doc length, with no
    // doc_id join back to a second corpus scan
    val tf = docs
      .select(col(idCol), nTokens(col(textCol)).as("dl"),
        explode(tokenize(col(textCol))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("dl"), col("term")).agg(count(lit(1)).as("tf"))
    val stats = docs.agg(count(lit(1)).as("n"),
      sum(nTokens(col(textCol)).cast("long")).as("toks"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

    // one IEEE op per step, mirrored textually by the SQL oracle —
    // constants like k1+1 are combined IN the expression (not
    // pre-folded in Scala) so both engines perform the identical
    // float-op sequence, tie-breaks included
    val avgdl = col("toks").cast(DoubleType) / col("n")
    val idf = (col("n").cast(DoubleType) - col("df") + lit(0.5)) /
      (col("df").cast(DoubleType) + lit(0.5))
    val tfD = col("tf").cast(DoubleType)
    val score = idf * (tfD * (lit(k1) + lit(1.0))) /
      (tfD + lit(k1) *
        ((lit(1.0) - lit(b)) + lit(b) * col("dl").cast(DoubleType) / avgdl))

    val scored = tf
      .join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("term"), score.as("s"))

    // fixed-order summation: s(term1) + s(term2) + … in `terms` order
    val perTerm = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, col("s"))).as(s"_s$i")
    }
    val total = terms.indices
      .map(i => coalesce(col(s"_s$i"), lit(0.0)))
      .reduce(_ + _)

    scored.groupBy(col(idCol)).agg(perTerm.head, perTerm.tail: _*)
      .select(col(idCol), total.as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}

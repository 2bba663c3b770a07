package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-wide line-level boilerplate removal — the CCNet / RefinedWeb
  * line-dedup discipline (Wenzek et al. 2020 §3.1 dedup paragraphs by
  * hash across shards; Penedo et al. 2023 line-wise corrections): a
  * line whose exact form recurs in at least `minDocs` DISTINCT
  * documents is chrome (nav menus, cookie banners, copyright
  * footers), not content — it is cut from EVERY document and the
  * survivors rejoin in original order. Contrast the span family:
  * t36/t42 cut duplicated token n-grams anywhere; this operator works
  * at the markup-given line boundary and thresholds on document
  * frequency, so a quote shared by two pages survives while a footer
  * on ten thousand dies.
  *
  * Scale shape (100 TB): the exploded lines shuffle ONCE on the
  * well-distributed (line, doc_id) composite for the doc-distinct
  * pass, then document frequency is a map-side-combinable count per
  * line — the billion-doc footer key is no hot key because partial
  * aggregation collapses it per partition. The frequent-line set
  * itself SHRINKS as `minDocs` grows (boilerplate variety is bounded,
  * a few MB at web scale), so it broadcasts back onto the line stream
  * and the rebuild groups by doc_id only. If a corpus ever outgrew
  * the broadcast, dropping the hint falls back to a shuffled join
  * with no semantic change.
  */
object Boilerplate {

  /** Deterministic multi-line page payload over the documents table —
    * same construction replayed literally by the SQL oracle. Per doc:
    * a host-keyed header and copyright footer (df ≈ N/4 — clear
    * boilerplate), a `section k` nav line (df ≈ N/7), the doc's own
    * text as 8-word content lines (doc-specific), and a `page b`
    * line shared only by the ≤3 docs of one id-bucket — df ≤ 3, so at
    * any `minDocs` ≥ 4 (the [[lineDedup]] default) it pins the
    * threshold boundary AND guarantees every doc keeps at least one
    * line (at `minDocs` ∈ {2, 3} that guarantee is off).
    */
  def withLinePayload(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val id = col(idCol)
    val host = Urls.hostOf(id)
    val w = split(col(textCol), " ")
    val content = transform(
      sequence(lit(0),
        ceil(size(w).cast("double") / 8).cast("long") - 1),
      j => concat_ws(" ", slice(w, (j * 8 + 1).cast("int"), lit(8))))
    docs.filter(col(textCol).isNotNull)
      .withColumn("page_text", concat_ws("\n",
        concat(lit("home | about | contact | "), host),
        concat(lit("section "), (id % 7).cast("string")),
        array_join(content, "\n"),
        concat(lit("page "), (id / 3).cast("long").cast("string")),
        concat(lit("copyright 2024 "), host)))
  }

  /** One row per kept document: `clean_text` (boilerplate lines cut,
    * original line order), `n_lines`, `n_removed`, `chars_removed`.
    * Null-text docs drop (no lines to audit).
    */
  def lineDedup(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id", minDocs: Int = 4): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), posexplode(split(col(textCol), "\n")))
      .toDF(idCol, "idx", "line")
    // document frequency: doc-distinct first (composite key, no hot
    // key), then a map-side-combinable count per line
    val frequent = lines.select(col("line"), col(idCol)).distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
    val isBp: Column = col("df").isNotNull
    lines.join(broadcast(frequent), Seq("line"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
            array_sort(collect_list(
              when(!isBp, struct(col("idx"), col("line"))))),
            s => s("line")), "\n").as("clean_text"),
        count(lit(1)).as("n_lines"),
        sum(when(isBp, 1L).otherwise(0L)).as("n_removed"),
        sum(when(isBp, length(col("line"))).otherwise(0))
          .cast("long").as("chars_removed"))
  }
}

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

  /** The corpus-generation ARTIFACT: the ≥ `minDocs` frequent-line
    * list (line, df) — built once per corpus generation (this is the
    * only stage that shuffles), then [[applyLineDedup]] applies it to
    * any shard map-only. Document frequency is doc-distinct first
    * (composite key, no hot key), then a map-side-combinable count
    * per line.
    */
  def frequentLines(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id", minDocs: Int = 4)
      : DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(split(col(textCol), "\n")).as("line"))
      .select(col("line"), col(idCol)).distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
  }

  /** Map-only application of a staged frequent-line list: the list
    * collapses to ONE array row that broadcast-cross-joins the corpus
    * (the `Graph.pagerank` scalar-frame pattern — kept in-plan, no
    * driver round-trip), and each document filters its own line array
    * in place — original order free, ZERO shuffle of the corpus.
    *
    * The trade, measured: the per-line probe is a linear
    * array_contains over the frequent list, so this path wins when
    * that list is genuinely boilerplate-sized (the deployment case —
    * MBs at web scale) and LOSES when it is corpus-sized (the
    * ScaleSmoke copy fixture manufactures exactly that: 100× copies
    * push most content chunks over the df threshold, and this path
    * measured 5.3× vs the join path's 2.4×). [[lineDedup]] therefore
    * defaults to the broadcast-hash-join formulation, which is robust
    * to ANY frequent-list size at the cost of one corpus regroup;
    * use this apply for the staged small-list serving shape
    * (path-equality spec-pinned).
    */
  def applyLineDedup(docs: DataFrame, frequent: DataFrame,
                     textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    val fl = frequent.agg(collect_list(col("line")).as("_fl"))
    docs.filter(col(textCol).isNotNull)
      .crossJoin(broadcast(fl))
      .withColumn("_lines", split(col(textCol), "\n"))
      .withColumn("_removed",
        filter(col("_lines"), l => array_contains(col("_fl"), l)))
      .select(col(idCol),
        array_join(filter(col("_lines"),
          l => !array_contains(col("_fl"), l)), "\n").as("clean_text"),
        size(col("_lines")).cast("long").as("n_lines"),
        size(col("_removed")).cast("long").as("n_removed"),
        aggregate(col("_removed"), lit(0),
          (acc, l) => acc + length(l)).cast("long").as("chars_removed"))
  }

  /** One row per kept document: `clean_text` (boilerplate lines cut,
    * original line order), `n_lines`, `n_removed`, `chars_removed`.
    * Null-text docs drop (no lines to audit). Uses the
    * broadcast-hash-join formulation (per-line O(1) probe + one
    * regroup by doc), which is robust to any frequent-list size —
    * see the measured trade on [[applyLineDedup]].
    */
  def lineDedup(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id", minDocs: Int = 4): DataFrame = {
    val lines = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), posexplode(split(col(textCol), "\n")))
      .toDF(idCol, "idx", "line")
    val frequent = frequentLines(docs, textCol, idCol, minDocs)
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

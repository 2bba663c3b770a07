package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions.langProfiles
import graft.operators.CorpusPipeline

/** End-state oracle for the full corpus-curation composition
  * ([[graft.operators.CorpusPipeline.curate]]): per document, the first
  * failing stage (or "kept"), the train/val split, the packed chunk id,
  * and the near-dup cluster label — one row per input doc, so the
  * whole language-ID → quality → exact-dedup → near-dup-cluster →
  * stratified-sample → split → pack cascade is pinned in one query.
  *
  * The oracle SQL is the composition of the already-proven t2/t3
  * (language/quality), d1 (exact dedup), d2/d3/d6 (LSH candidates,
  * Jaccard verify, cluster closure), t9 (salted sampling), t7 (stable
  * split), and t10 (budget packing) mirrors, re-rooted on the
  * quality-surviving doc set exactly as the pipeline stages are.
  */
object CurateOps {

  /** Non-default rates so the "sampled" stage actually fires. */
  private val cfg = CorpusPipeline.Config(
    sampleRates = Map("en" -> 8000), defaultRate = 9000)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t11_curate" -> { (s, dir) =>
      CorpusPipeline.curate(Tables.load(s, dir, "documents"), cfg)
        .select(col("doc_id"),
          coalesce(col("drop_reason"), lit("kept")).as("stage"),
          // nulls coalesced to sentinels: the driver compare hashes
          // scalar values, and "" / -1 are unambiguous here (split and
          // chunk_id exist iff kept, cluster_id iff in a near-dup
          // component)
          coalesce(col("split"), lit("")).as("split"),
          coalesce(col("chunk_id"), lit(-1L)).as("chunk_id"),
          coalesce(col("cluster_id"), lit(-1L)).as("cluster_id"))
    })

  def oracle: Map[String, String] = Map(
    "t11_curate" -> {
      val scores = langProfiles.map { case (l, p) =>
        s"len(list_intersect(${TextOps.sqlTokenSet}, ${TextOps.sqlProfile(p)})) AS s_$l"
      }.mkString(",\n  ")
      val best = langProfiles.map(l => s"s_${l._1}").mkString("greatest(", ", ", ")")
      val cases = langProfiles.map { case (l, _) =>
        s"WHEN s_$l = best AND best > 0 THEN '$l'"
      }.mkString("\n  ")
      val stops = TextOps.sqlProfile(langProfiles.flatMap(_._2).distinct)
      val nt = TextOps.sqlNTokens
      val minQ = cfg.minQuality
      val sampleRate =
        s"CASE WHEN pred_lang = 'en' THEN ${cfg.sampleRates("en")} ELSE ${cfg.defaultRate} END"
      s"""WITH RECURSIVE sc AS (
         |  SELECT doc_id, text, $scores,
         |    $nt AS n_tokens,
         |    len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS punct_ct,
         |    CAST(len(list_filter(list_filter(string_split(lower(text),' '), x -> len(x) > 0),
         |        w -> list_contains($stops, w))) AS DOUBLE) / nullif($nt, 0) AS stop_ratio
         |  FROM documents),
         |b AS (SELECT *, $best AS best FROM sc),
         |m AS (
         |  SELECT doc_id, text, n_tokens,
         |    CASE $cases ELSE 'und' END AS pred_lang,
         |    least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
         |      + least(stop_ratio * 4.0, 1.0) * 0.4
         |      + (1.0 - least(CAST(punct_ct AS DOUBLE) / nullif(n_tokens, 0), 1.0)) * 0.2 AS quality
         |  FROM b),
         |ok AS (
         |  SELECT doc_id, text FROM m
         |  WHERE text IS NOT NULL AND len(text) > 0
         |    AND quality IS NOT NULL AND quality >= $minQ),
         |${DedupOps.sqlCandidatesFrom("ok")},
         |${DedupOps.sqlClusterCtes(cfg.jaccard)},
         |keep AS (SELECT MIN(doc_id) AS doc_id FROM ok GROUP BY md5(text)),
         |dr AS (
         |  SELECT m.doc_id,
         |    CASE
         |      WHEN m.text IS NULL OR len(m.text) = 0 THEN 'empty'
         |      WHEN m.quality IS NULL OR m.quality < $minQ THEN 'quality'
         |      WHEN k.doc_id IS NULL THEN 'exact_dup'
         |      WHEN c.cluster_id IS NOT NULL AND c.cluster_id <> m.doc_id THEN 'near_dup'
         |      WHEN NOT (CAST('0x' || substr(md5('s:' || CAST(m.doc_id AS VARCHAR)), 1, 4) AS INT) * 10000
         |                < ($sampleRate) * 65536) THEN 'sampled'
         |      ELSE NULL END AS drop_reason,
         |    m.n_tokens, c.cluster_id
         |  FROM m
         |  LEFT JOIN keep k ON k.doc_id = m.doc_id
         |  LEFT JOIN clus c ON c.doc_id = m.doc_id),
         |pk AS (
         |  SELECT doc_id,
         |    CAST(COALESCE(SUM(tok) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      // ${cfg.budget} AS BIGINT) AS chunk_id
         |  FROM (SELECT doc_id, COALESCE(n_tokens, 0) AS tok
         |        FROM dr WHERE drop_reason IS NULL))
         |SELECT d.doc_id,
         |  COALESCE(d.drop_reason, 'kept') AS stage,
         |  CASE WHEN d.drop_reason IS NULL THEN
         |    CASE WHEN CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) AS INT) * 1000
         |              < ${cfg.trainPermille} * 65536
         |         THEN 'train' ELSE 'val' END
         |  ELSE '' END AS split,
         |  COALESCE(pk.chunk_id, -1) AS chunk_id,
         |  COALESCE(d.cluster_id, -1) AS cluster_id
         |FROM dr d LEFT JOIN pk ON pk.doc_id = d.doc_id""".stripMargin
    })
}

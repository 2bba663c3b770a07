package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Multimodal

/** Multimodal-column operators over `documents` (text bytes stand in
  * for media blobs — the container has no codecs; see Multimodal).
  * m1 has a full SQL oracle; m2/m3 exercise the mapPartitions decode
  * path, which is not SQL-expressible → rows-only check by the driver.
  */
object MultimodalOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- binary metadata extraction (map-side, shuffle-free) -------------
    "m1_binary_meta" -> { (s, dir) =>
      Multimodal.withMetadata(Multimodal.withPayload(docs(s, dir)))
        .select(col("doc_id"), col("byte_len"), col("sha"), col("header_hex"))
    },

    // ---- stubbed decode via mapPartitions (rows-only check) --------------
    "m2_decode_features" -> { (s, dir) =>
      Multimodal.decode(Multimodal.withPayload(docs(s, dir)))
        .select(col("doc_id"), col("width"), col("height"), col("channels"))
    },

    // ---- deterministic frame sampling (rows-only check) ------------------
    "m3_frame_sample" -> { (s, dir) =>
      Multimodal.sampleFrames(Multimodal.withPayload(docs(s, dir)), n = 4)
        .select(col("doc_id"), col("frame_digests"))
    })

  def oracle: Map[String, String] = Map(
    // text is ASCII → byte length == char length; sha256/hex portable
    "m1_binary_meta" ->
      """SELECT doc_id,
        | CAST(strlen(text) AS INT) AS byte_len,
        | sha256(text) AS sha,
        | upper(hex(substr(text, 1, 4))) AS header_hex
        |FROM documents""".stripMargin
  )
}

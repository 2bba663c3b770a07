package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokenize

/** Within-document sliding-window chunking — the retrieval/RAG
  * counterpart of [[Packing]] (which packs ACROSS documents to a
  * token budget; this splits WITHIN a document into overlapping
  * windows an embedder or retriever indexes). Overlap keeps
  * boundary-straddling facts findable: window w, stride s < w gives
  * every token membership in ⌈w/s⌉ chunks.
  *
  * Pure map: tokenization, the chunk-count arithmetic, and the window
  * slices are all per-row expressions (`explode` multiplies rows
  * map-side, no shuffle anywhere) — at 100 TB this is a single scan
  * whose output is ~w/s× the token volume, the irreducible cost of
  * the overlap itself. All arithmetic is integer (ceil-div via
  * (n−w+s−1) DIV s, non-negative operands), so chunk boundaries are
  * engine-exact.
  */
object Chunking {

  /** @param window chunk width in tokens
    * @param stride start-to-start distance (≤ window; < window ⇒
    *               overlap of window − stride tokens)
    * @return one row per chunk: (id, chunk_idx, chunk_text, n_tokens);
    *         docs with at least one token produce ≥ 1 chunk (a doc
    *         shorter than `window` is its own single chunk); empty
    *         docs produce none
    */
  def slidingChunks(docs: DataFrame, idCol: String, textCol: String,
                    window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window], got $stride")
    val toks = docs
      .select(col(idCol), tokenize(col(textCol)).as("w"))
      .filter(size(col("w")) >= 1)
      .withColumn("n", size(col("w")))
    // chunks fully covered by the previous one are never emitted: the
    // last start is the smallest multiple of stride reaching the end
    val nChunks = when(col("n") <= window, lit(1))
      .otherwise(lit(1) +
        expr(s"(n - $window + ${stride - 1}) DIV $stride"))
    toks
      .select(col(idCol), col("w"), col("n"),
        explode(sequence(lit(0), nChunks.cast("int") - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("w"), col("chunk_idx") * stride + 1,
          lit(window)), " ").as("chunk_text"),
        least(lit(window), col("n") - col("chunk_idx") * stride)
          .as("n_tokens"))
  }
}

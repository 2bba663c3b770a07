package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction for the Warehouse's streaming file "topics".
  *
  * A running file sink appends one parquet file per partition per
  * micro-batch forever; at a 10-second trigger that is ~8.6k files per
  * topic per day — the classic small-file problem. Naive compaction
  * (rewrite + delete under the same root) breaks both reader paths:
  * batch readers of a sink dir trust `_spark_metadata` (which would
  * reference deleted files), and streaming readers must never see
  * absorbed rows again under a new file name (a compacted file looks
  * like NEW data to a file stream — instant duplicates).
  *
  * This protocol compacts SAFELY WHILE EVERY QUERY KEEPS RUNNING:
  *
  *  1. Only live files older than `horizonMs` are absorbed — the
  *     writer never revisits a written file, and a downstream
  *     restart re-reads at most its last UNCOMMITTED batch, whose
  *     files are necessarily younger than any sane horizon (pick
  *     horizon ≫ trigger interval × sink-commit lag; the spec uses an
  *     explicit all-caught-up barrier instead).
  *  2. Absorbed rows are rewritten into ONE segment dir under
  *     `<topic>/_compacted/seg=<n>/`, with the absorbed file names
  *     recorded INSIDE the segment (`_source_files`) and a `_done`
  *     marker written last — crash before the marker leaves only
  *     garbage a later pass overwrites; the originals are deleted
  *     only after the marker is durable, so rows always exist in at
  *     least one committed place.
  *  3. `_spark_metadata` is NEVER touched — the running sink owns it
  *     (its own log compaction rewrites those files at its pleasure).
  *     Streaming consumers with live checkpoints never re-list
  *     absorbed entries (seen-file tracking is by name); consumers
  *     starting FRESH against a compacted topic must read
  *     [[Compaction.topicView]] (batch) or set
  *     `spark.sql.files.ignoreMissingFiles` (streams) — absorbed
  *     entries then contribute zero rows and the segment side supplies
  *     them exactly once.
  *
  * [[topicView]] is the post-compaction batch reader root: committed
  * segments ∪ (live files − absorbed names). It bypasses
  * `_spark_metadata` by globbing data files directly — glob paths
  * never engage the metadata file index.
  *
  * At 100 TB the answer is a table format: these topics become Delta /
  * Iceberg tables and this pass becomes `OPTIMIZE` (whose manifest
  * swap is exactly step 2-3 with transactional metadata). The seam is
  * the same call site; this is the file-native equivalent with the
  * identical reader contract.
  */
object Compaction {

  private def segRoot(topicDir: String) = new java.io.File(topicDir, "_compacted")

  private def liveFiles(topicDir: String): Array[java.io.File] =
    Option(new java.io.File(topicDir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && !f.getName.startsWith(".") &&
        !f.getName.startsWith("_"))

  private def committedSegs(topicDir: String): Array[java.io.File] =
    Option(segRoot(topicDir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(d => d.isDirectory && new java.io.File(d, "_done").exists())

  /** File names already absorbed into a committed segment (their
    * originals may or may not still exist — a crash between marker
    * and delete leaves both, and the view must not double-read).
    */
  private def absorbedNames(topicDir: String): Set[String] =
    committedSegs(topicDir).flatMap { seg =>
      val f = new java.io.File(seg, "_source_files")
      if (f.exists())
        new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
          .split("\n").filter(_.nonEmpty)
      else Array.empty[String]
    }.toSet

  /** One compaction pass over `topicDir`: absorb every live data file
    * older than `horizonMs` into a new committed segment, then delete
    * the originals. Returns the number of files absorbed (0 = nothing
    * eligible, no segment written). Safe to run concurrently with the
    * topic's writer and its downstream consumers (see object doc);
    * passes are sequential per topic — run one compactor per topic.
    */
  def compactTopic(spark: SparkSession, topicDir: String,
                   horizonMs: Long): Int = {
    val cutoff = System.currentTimeMillis() - horizonMs
    val absorbed = absorbedNames(topicDir)
    val eligible = liveFiles(topicDir)
      .filter(f => f.lastModified() < cutoff && !absorbed(f.getName))
    if (eligible.isEmpty) return 0
    val segN = committedSegs(topicDir).map(_.getName.stripPrefix("seg="))
      .flatMap(_.toIntOption).maxOption.getOrElse(-1) + 1
    val root = segRoot(topicDir)
    root.mkdirs()
    val tmp = new java.io.File(root, s".tmp_seg_$segN")
    // one coalesced rewrite: the segment is the many-small-files fix,
    // so emit few large files (size-targeted at scale; 1 suffices for
    // the local deployment)
    spark.read.parquet(eligible.map(_.getPath).toIndexedSeq: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(tmp.getPath)
    java.nio.file.Files.write(
      new java.io.File(tmp, "_source_files").toPath,
      eligible.map(_.getName).mkString("\n").getBytes("UTF-8"))
    require(new java.io.File(tmp, "_done").createNewFile(),
      s"compact: could not mark segment $segN of $topicDir")
    val dst = new java.io.File(root, s"seg=$segN")
    require(tmp.renameTo(dst),
      s"compact: could not publish segment $segN of $topicDir")
    // originals die only after the segment (with its marker) is
    // durable; a crash mid-delete leaves survivors the view excludes
    // by name
    eligible.foreach(f => f.delete())
    eligible.length
  }

  /** Batch reader root for a (possibly) compacted topic: committed
    * segments ∪ live files minus absorbed names. Bypasses
    * `_spark_metadata` (globs engage the plain file index), so it
    * stays correct after absorbed files are deleted — use this
    * instead of `spark.read.parquet(topicDir)` once a topic is under
    * compaction. On an uncompacted topic it reads exactly the live
    * files.
    */
  def topicView(spark: SparkSession, topicDir: String): DataFrame = {
    val absorbed = absorbedNames(topicDir)
    val live = liveFiles(topicDir)
      .filter(f => !absorbed(f.getName)).map(_.getPath)
    val segs = committedSegs(topicDir)
      // data files only: globbing each segment dir's parquet files
      // keeps _source_files/_done out of schema inference's way
      .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet")))
      .map(_.getPath)
    val paths = (live ++ segs).toIndexedSeq
    require(paths.nonEmpty,
      s"topicView: $topicDir has no data files (topic never written?)")
    spark.read.parquet(paths: _*)
  }
}

package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build/serve split for expensive derived tables — the PQ
  * encode/serve economics ([[graft.operators.Similarity.pqCodebook]] →
  * `pqScoreCodes`) generalized to any pipeline leg: an LSH near-dup
  * index, a benchmark n-gram set, a duplicated-span report are built
  * ONCE per (input, config) version and SERVED read-only by every
  * later run. At 100 TB these are the staged tables every production
  * pipeline materializes between stages (a dbt/Airflow DAG node, a
  * Delta table); locally they live under one artifact root so a
  * cold-started run pays a small parquet read instead of re-shingling
  * the corpus.
  *
  * Content keying: the caller's key should fold in [[fingerprint]] of
  * every input dir plus the config values the leg depends on, so a
  * regenerated input or a changed threshold REBUILDS instead of
  * serving stale rows. Publication is atomic (build into a tmp dir, a
  * `_done` marker rides the rename), so a crashed build leaves no
  * half-artifact and concurrent builders converge on one copy.
  */
object Artifacts {

  def root: String = sys.env.getOrElse("SPARK_GRAFT_ARTIFACTS",
    s"${System.getProperty("java.io.tmpdir")}/graft-artifacts")

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Cheap content fingerprint of a local input dir: (name, size,
    * mtime) of every visible file. On a cluster the analog is the
    * table snapshot/version id — same contract, cheaper than hashing
    * 100 TB of bytes and sufficient against the regenerated-testdata
    * staleness mode.
    */
  def fingerprint(dir: String): String = {
    val d = new java.io.File(dir)
    val entries = Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && !f.getName.startsWith("."))
      .sortBy(_.getName)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
    md5(entries.mkString("|"))
  }

  /** Serve the artifact for `key`, building it first if absent. The
    * build's result is written as parquet and re-read, so the served
    * frame scans files (a real staged table), never the build lineage.
    */
  def table(spark: SparkSession, key: String)(build: => DataFrame)
      : DataFrame = {
    val dir = new java.io.File(root, md5(key))
    val done = new java.io.File(dir, "_done")
    if (dir.exists() && !done.exists()) {
      // pre-marker leftovers (a crash mid-publish can't produce this —
      // the marker rides the rename — but a foreign dir could)
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
    if (!done.exists()) {
      new java.io.File(root).mkdirs()
      val tmp = new java.io.File(root,
        s".tmp_${md5(key)}_${ProcessHandle.current().pid()}")
      build.write.mode("overwrite").parquet(tmp.getPath)
      // the raw key rides inside the artifact so stale GENERATIONS
      // (same logical artifact, older input fingerprint) are
      // identifiable after the dir name is hashed
      java.nio.file.Files.writeString(
        new java.io.File(tmp, "_key").toPath, key)
      require(new java.io.File(tmp, "_done").createNewFile(),
        s"artifact: could not mark $key complete")
      if (!tmp.renameTo(dir)) {
        // lost a build race: another process published first — serve
        // theirs, drop ours
        require(done.exists(), s"artifact: could not publish $key")
        org.apache.commons.io.FileUtils.deleteDirectory(tmp)
      }
      pruneStale(key)
    }
    spark.read.parquet(dir.getPath)
  }

  /** After publishing a new generation, drop older generations of the
    * SAME logical artifact: any sibling whose key shares this key's
    * prefix up to the final `|`-segment (the input fingerprint, by
    * the class-doc keying convention) but differs in full. Without
    * this the artifact root grows without bound across input
    * regenerations — the staged tables of testdata that no longer
    * exists. Runs only on the (rare) build path. LOCAL-FS caveat
    * (same as upsertDim): a process still serving a stale generation
    * when its input was regenerated would lose files mid-read; on a
    * cluster this is the table-format's snapshot-expiry operation
    * (`VACUUM` / `expire_snapshots`), which handles live readers.
    */
  private def pruneStale(key: String): Unit = {
    val cut = key.lastIndexOf('|')
    if (cut <= 0) return
    val prefix = key.substring(0, cut + 1)
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .foreach { d =>
        val kf = new java.io.File(d, "_key")
        if (d.isDirectory && kf.exists()) {
          val k = java.nio.file.Files.readString(kf.toPath)
          if (k != key && k.startsWith(prefix))
            org.apache.commons.io.FileUtils.deleteDirectory(d)
        }
      }
  }
}

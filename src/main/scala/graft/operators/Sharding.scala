package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic epoch shuffling + exact-balanced shard assignment —
  * the step between a curated corpus and a training run: every epoch
  * needs a reproducible pseudo-random permutation of the corpus,
  * split into equal contiguous shards (one per data-loader worker),
  * stable across reruns and cluster sizes.
  *
  * The naive formulation — `ORDER BY hash` + `row_number()` over an
  * unpartitioned window — serializes the whole corpus through ONE
  * task. This is the two-phase rank instead (the t10/t15 pattern at
  * epoch scope): bucket each row by its hash's leading byte(s),
  * collect per-bucket COUNTS (bucket-count rows, never data), turn
  * them into broadcast prefix offsets, and rank locally within each
  * bucket — bucket prefixes order consistently with the full hash, so
  * local rank + bucket offset IS the exact global rank. Shards are
  * `floor(rank * S / total)`: contiguous, sizes differing by at most
  * one, derived in integer arithmetic.
  *
  * Determinism: the permutation is a pure function of (seed, id) via
  * md5 — rerunning the epoch, at any parallelism, on any engine,
  * reproduces the identical order (md5 hex compares lexicographically
  * the same everywhere; ties broken by id, though 128-bit collisions
  * never occur in practice).
  */
object Sharding {

  /** @param numShards  number of equal contiguous shards (> 0)
    * @param seed       epoch seed — change per epoch for a fresh permutation
    * @param buckets    two-phase fan-out (driver holds this many counts;
    *                   256 = one hash byte suits harness scale, 65536 at
    *                   corpus scale)
    */
  /** [[epochShards]] balanced by a WEIGHT (token mass) instead of row
    * count: shard boundaries fall where cumulative weight crosses
    * multiples of `total/S`, so each data-loader worker receives
    * near-equal TOKENS rather than near-equal documents — the split a
    * heterogeneous-length corpus actually wants (doc-balanced shards
    * can differ by whole factors in token work). Same two-phase exact
    * rank; phase 1 additionally carries per-bucket weight sums, and
    * the per-row offset is the cumulative weight BEFORE the row.
    * Zero-weight rows are allowed (LEAST-clamped into the last
    * shard at the tail); an ALL-zero-weight corpus carries no token
    * signal to balance by, so it falls back to row-count sharding
    * ([[epochShards]] semantics, same permutation) rather than
    * silently dropping rows.
    */
  def epochShardsByWeight(df: DataFrame, idCol: String,
                          weight: org.apache.spark.sql.Column,
                          numShards: Int, seed: String = "epoch0",
                          buckets: Int = 256): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    require(buckets == 256 || buckets == 65536,
      s"buckets must be 256 or 65536 (whole hash bytes), got $buckets")
    val hexDigits = if (buckets == 256) 2 else 4
    val spark = df.sparkSession
    import spark.implicits._
    val h = md5(concat(lit(s"$seed:"), col(idCol).cast("string")))
    // a null id has no deterministic place in an id-keyed permutation
    // (null hash, null tie-break) — and would decode as a null bucket
    // in the phase-1 counts; excluded, like asofJoin's null keys
    val withB = df.filter(col(idCol).isNotNull)
      .select(col(idCol), weight.cast(LongType).as("_wt"),
        h.as("_h"))
      .withColumn("_b", conv(substring(col("_h"), 1, hexDigits), 16, 10)
        .cast("int"))
    val counts = withB.groupBy(col("_b"))
      .agg(count(lit(1)).as("_c"), sum(col("_wt")).as("_s"))
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    val totalW = counts.map(_._3).sum
    if (counts.isEmpty)
      return withB.select(col(idCol), lit(0L).as("rank"),
        lit(0).as("shard")).limit(0)
    if (totalW <= 0L)
      // rows exist but no weight mass: row-balanced fallback (the
      // permutation is identical — same seed, same hash)
      return epochShards(df, idCol, numShards, seed, buckets)
    val offsets = counts.scanLeft((0, 0L, 0L, 0L, 0L)) {
      case ((_, _, accC, _, accW), (b, c, s)) =>
        (b, accC, accC + c, accW, accW + s)
    }.drop(1).map { case (b, offC, _, offW, _) => (b, offC, offW) }
    val w = Window.partitionBy(col("_b")).orderBy(col("_h"), col(idCol))
    withB
      .join(broadcast(offsets.toSeq.toDF("_b", "_offc", "_offw")), Seq("_b"))
      .withColumn("rank",
        (row_number().over(w).cast(LongType) - 1L) + col("_offc"))
      // cumulative weight BEFORE this row = bucket offset + local
      // cumsum minus own weight
      .withColumn("_cumBefore",
        sum(col("_wt")).over(w) - col("_wt") + col("_offw"))
      .withColumn("shard",
        least(expr(s"CAST((_cumBefore * $numShards) DIV $totalW AS INT)"),
          lit(numShards - 1)))
      .select(col(idCol), col("rank"), col("shard"))
  }

  def epochShards(df: DataFrame, idCol: String, numShards: Int,
                  seed: String = "epoch0", buckets: Int = 256): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    require(buckets == 256 || buckets == 65536,
      s"buckets must be 256 or 65536 (whole hash bytes), got $buckets")
    val hexDigits = if (buckets == 256) 2 else 4
    val spark = df.sparkSession
    import spark.implicits._
    val h = md5(concat(lit(s"$seed:"), col(idCol).cast("string")))
    // null ids excluded — see epochShardsByWeight
    val withB = df.filter(col(idCol).isNotNull).select(col(idCol), h.as("_h"))
      .withColumn("_b", conv(substring(col("_h"), 1, hexDigits), 16, 10)
        .cast("int"))
    // phase 1: bucket counts → prefix offsets (driver math over
    // `buckets` rows — data rows never collect)
    val counts = withB.groupBy(col("_b")).agg(count(lit(1)).as("_c"))
      .as[(Int, Long)].collect().sortBy(_._1)
    val total = counts.map(_._2).sum
    if (total == 0L)
      return withB.select(col(idCol), lit(0L).as("rank"),
        lit(0).as("shard")).limit(0)
    val offsets = counts.scanLeft((0, 0L, 0L)) { case ((_, _, acc), (b, c)) =>
      (b, acc, acc + c)
    }.drop(1).map { case (b, off, _) => (b, off) }
    // phase 2: local rank within the bucket + broadcast offset
    val w = Window.partitionBy(col("_b")).orderBy(col("_h"), col(idCol))
    withB
      .join(broadcast(offsets.toSeq.toDF("_b", "_off")), Seq("_b"))
      .withColumn("rank",
        (row_number().over(w).cast(LongType) - 1L) + col("_off"))
      .withColumn("shard",
        expr(s"CAST((rank * $numShards) DIV $total AS INT)"))
      .select(col(idCol), col("rank"), col("shard"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for shuffles AQE can't re-plan.
  *
  * AQE's skew-join split covers sort-merge joins in batch; it does NOT
  * cover stream-stream joins, `flatMapGroupsWithState` keyed ops, or
  * cases where one logical key's rows must land in one task by plan
  * shape. For those, the classic fix is salting: spread the hot key
  * over `salt` sub-keys, replicate the other side per sub-key, and the
  * hot key's work runs `salt`-wide instead of as one straggler.
  *
  * Results are identical to the plain equi-join (spec-pinned): every
  * (left row, right row) pair with equal keys meets in exactly one
  * sub-key — the left row's salt — because the right side carries ALL
  * `salt` values. Cost: the right side shuffles `salt`× its size, so
  * pick `salt` ≈ hot-key rows ÷ target-task rows, and keep the
  * replicated side the smaller one (this engine's t15/t10 two-phase
  * scans are the same idea applied to windows: bucket first, combine
  * after).
  */
object Skew {

  /** Inner equi-join on `key`, salted `salt` ways. The salt is a
    * deterministic row fingerprint (replay/retry-stable, unlike a
    * random or monotonic id), uniform across a key's rows so the hot
    * key spreads evenly.
    *
    * LIMIT of the default fingerprint: BYTE-IDENTICAL duplicate left
    * rows all hash to the same salt, so a hot key made of exact
    * duplicates still lands in one task (results stay correct — the
    * mitigation is just a no-op for that case). A retry-stable
    * per-duplicate disambiguator doesn't exist without an ordering
    * assumption (partition-id + counter changes across retries and
    * would break shuffle-replay consistency), so for such inputs pass
    * `saltOn` with a column that distinguishes the duplicates — an
    * event id, an offset, or a pre-assigned row id from the source.
    *
    * @param saltOn optional expression to fingerprint instead of the
    *   whole row; must be deterministic per row (retry-stable).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int, saltOn: Option[Column] = None): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val fp = saltOn.getOrElse(struct(left.columns.toIndexedSeq.map(col): _*))
    val l = left.withColumn("_salt",
      pmod(xxhash64(fp), lit(salt.toLong)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }

  /** Key-distribution profile — the pre-flight a 100 TB job runs
    * BEFORE choosing a partitioning/salting strategy for a keyed
    * shuffle: the top-k hottest keys with their share of total rows,
    * beside the key-space summary (key count, total, median and p99
    * per-key row counts). `top1 share × total ≫ total / tasks` is the
    * [[saltedJoin]] trigger; p99/p50 spread quantifies the tail.
    *
    * Shape: one key-count aggregate (partial map-side), a 1-row
    * summary broadcast beside it, TakeOrdered for the top-k — the
    * profiled table is scanned ONCE and never sorted globally.
    * Exact percentiles over the per-key counts (a |keys|-sized frame,
    * not the data); deterministic top-k tie-break (ct desc, key asc).
    */
  def keyProfile(df: DataFrame, keyCol: String, topK: Int = 5): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("ct"))
    val summary = broadcast(counts.agg(
      count(lit(1)).as("n_keys"), sum(col("ct")).as("total"),
      expr("percentile(ct, 0.5)").as("p50_ct"),
      expr("percentile(ct, 0.99)").as("p99_ct")))
    counts.orderBy(col("ct").desc, col("key")).limit(topK)
      .crossJoin(summary)
      .select(col("key"), col("ct"),
        (col("ct").cast("double") / col("total")).as("share"),
        col("n_keys"), col("total"), col("p50_ct"), col("p99_ct"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
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
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val l = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(salt.toLong)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}

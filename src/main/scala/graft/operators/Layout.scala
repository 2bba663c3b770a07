package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering — the write-side lever that turns multi-
  * dimensional selective queries from full scans into narrow reads at
  * 100 TB. A single-column sort clusters one predicate dimension;
  * interleaving the bits of SEVERAL dimensions (the Z-order / Morton
  * curve, the technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`)
  * gives every interleaved dimension partial locality, so a box
  * predicate on any subset touches a small band of files and parquet
  * min/max row-group pruning does the rest.
  *
  * Everything here is deterministic Column arithmetic (shifts, masks,
  * ors — whole-stage codegen, no UDF), so the z-value itself is
  * oracle-checkable bit-for-bit and a re-run of the writer produces
  * the identical layout.
  */
object Layout {

  /** Morton z-value of `cols`, interleaving the low `bits` bits of
    * each (column i's bit j lands at position j * n + i). Inputs must
    * be non-negative and fit `bits` bits — out-of-range inputs fold
    * into the top band via the mask rather than corrupting neighbors'
    * bits (the mask keeps every term in its own bit position).
    * n * bits must fit a signed long.
    *
    * The expression is an unrolled fold of n × bits codegen'd terms —
    * for the typical (2 dims, 16 bits) that is 32 shift-mask-or ops
    * per row, cheap beside the exchange it feeds.
    */
  def zvalue(bits: Int, cols: Column*): Column = {
    require(cols.nonEmpty, "zvalue needs at least one column")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits * dims must fit a signed long, got $bits x ${cols.size}")
    val n = cols.size
    val terms = for {
      (c, i) <- cols.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("long"), j).bitwiseAND(lit(1L)), j * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The identical z-value as engine-neutral SQL (shared term list —
    * the oracle mirror is generated, not hand-kept in sync).
    */
  def zvalueSql(bits: Int, cols: String*): String = {
    require(cols.nonEmpty && bits >= 1 && bits * cols.size <= 62)
    val n = cols.size
    val terms = for {
      (c, i) <- cols.zipWithIndex
      j <- 0 until bits
    } yield s"((((CAST($c AS BIGINT) >> $j) & 1)) << ${j * n + i})"
    terms.mkString(" | ")
  }

  /** Range-cluster `df` into `partitions` z-contiguous slices, sorted
    * within each — the write shape: one file per slice, every file
    * owning a compact z-range so each interleaved dimension's min/max
    * file statistics are tight. `repartitionByRange` samples range
    * bounds; the CONTENT of each file is deterministic given the
    * bounds, and file-level locality (what the pruning spec measures)
    * is stable across runs.
    */
  def clusterByZ(df: DataFrame, z: Column, partitions: Int): DataFrame = {
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    df.withColumn("_z", z)
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }
}

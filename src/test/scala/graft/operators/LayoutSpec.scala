package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zvalue interleaves bits exactly (column i bit j -> j*n + i)") {
    // x=0b10, y=0b01: x0=0->pos0, y0=1->pos1, x1=1->pos2, y1=0->pos3
    val out = Seq((2L, 1L)).toDF("x", "y")
      .select(Layout.zvalue(2, col("x"), col("y"))).as[Long].head()
    assert(out === 6L)
    // identity on one dimension
    val one = Seq(45L).toDF("x")
      .select(Layout.zvalue(6, col("x"))).as[Long].head()
    assert(one === 45L)
    // 3 dims: each coordinate 1 -> bits 0,1,2 set
    val three = Seq((1L, 1L, 1L)).toDF("x", "y", "z")
      .select(Layout.zvalue(1, col("x"), col("y"), col("z")))
      .as[Long].head()
    assert(three === 7L)
  }

  test("zvalueSql mirrors the Column expression bit-for-bit") {
    val df = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val mismatch = df.select(
        Layout.zvalue(6, col("x"), col("y")).as("a"),
        expr(Layout.zvalueSql(6, "x", "y")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mismatch === 0L)
  }

  test("z-clustered layout localizes BOTH dimensions; a sort only one") {
    // 64x64 grid, 16 files of ~256 consecutive z-values = ~16x16 tiles
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val base = Files.createTempDirectory("layout").toString
    Layout.clusterByZ(grid, Layout.zvalue(6, col("x"), col("y")), 16)
      .write.parquet(s"$base/zorder")
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(s"$base/xsort")

    def filesTouched(path: String, pred: String): Long =
      spark.read.parquet(path).filter(pred)
        .select(input_file_name().as("f")).distinct().count()

    val box = "y >= 8 AND y <= 15" // selective on y ONLY
    // x-sorted files each span all y: every file contains the band
    assert(filesTouched(s"$base/xsort", box) >= 14L)
    // z-tiles: the band lives in the first tile row (~4 of 16 files;
    // range-bound sampling can shift a boundary, hence the slack)
    assert(filesTouched(s"$base/zorder", box) <= 6L)
    // and the z layout still localizes x too (no one-dimension trade)
    assert(filesTouched(s"$base/zorder", "x >= 8 AND x <= 15") <= 6L)
    // correctness: clustering permutes, never drops
    assert(spark.read.parquet(s"$base/zorder").count() === 4096L)
  }
}

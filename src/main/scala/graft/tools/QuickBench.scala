package graft.tools

import graft.SparkEntry
import graft.core.Graft

/** Repeat-run one query to split plan/codegen overhead from execution:
  * `sbt "runMain graft.tools.QuickBench <sfDir> <query> [reps] [cold]"`.
  * Default keeps caches across reps (run2+ ≈ Bench's warm mode); the
  * `cold` flag clears the cache before every rep (≈ Bench's cold mode
  * once run1 has paid JIT + codegen).
  */
object QuickBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cold = args.length > 3 && args(3) == "cold"
    val spark = Graft.session("quick-bench")
    args(1).split(",").foreach { name =>
      (1 to reps).foreach { i =>
        if (cold) spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, dir).count()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}

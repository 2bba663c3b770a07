package graft.tools

import graft.SparkEntry
import graft.core.Graft

/** Repeat-run one query to split plan/codegen overhead from execution:
  * `sbt "runMain graft.tools.QuickBench <sfDir> <query> [reps]"`.
  */
object QuickBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = Graft.session("quick-bench")
    args(1).split(",").foreach { name =>
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, dir).count()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}

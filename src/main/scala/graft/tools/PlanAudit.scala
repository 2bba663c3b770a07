package graft.tools

import graft.SparkEntry
import graft.core.Graft

/** Prints formatted physical plans for selected queries so plan
  * regressions (lost pushdown, missed broadcast, codegen gaps) are
  * visible. Dev tool, not part of the driver contract.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("plan-audit", "8")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "q2_province_stats", "q4_interval_join",
        "t1_keyword_stats", "d2_lsh_candidates", "v2_knn_ivf")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}

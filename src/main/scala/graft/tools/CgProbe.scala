package graft.tools
import org.apache.spark.sql.execution.debug
/** Codegen method-size probe: for each query name passed as an arg,
  * print every whole-stage-codegen subtree's maxMethodCodeSize (AQE
  * off, sf0.001). The ad-hoc twin of CodegenSizeSpec — use it to
  * check a NEW literal-heavy operator against HotSpot's 8,000-byte
  * DontCompileHugeMethods ceiling before pinning it in the spec.
  * Usage: `sbt "runMain graft.tools.CgProbe v9_knn_pq v28_pq_sweep"`.
  */
object CgProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      val sizes = debug.codegenStringSeq(df.queryExecution.executedPlan)
        .map(_._3.maxMethodCodeSize)
      println(s"[cg] $q subtrees=${sizes.size} sizes=${sizes.mkString(",")}")
    }
    spark.stop()
  }
}

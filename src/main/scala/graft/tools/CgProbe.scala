package graft.tools
import org.apache.spark.sql.execution.debug
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

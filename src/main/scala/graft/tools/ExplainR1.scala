package graft.tools
import graft.SparkEntry
import graft.core.Graft
object ExplainR1 {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("explain-r1")
    val df = SparkEntry.queries("r1_cdc_normalize")(spark, "/root/testdata/sf0.1")
    df.explain("formatted")
    spark.stop()
  }
}

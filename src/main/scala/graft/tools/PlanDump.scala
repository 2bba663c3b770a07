package graft.tools
import graft.SparkEntry
import org.apache.spark.sql.execution.FormattedMode

/** Dump .explain("formatted") for queries to files:
  * runMain graft.tools.PlanDump <sfDir> <outDir> <q1,q2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(dir, out, qs) = args
    val spark = graft.core.Graft.session("plan-dump")
    new java.io.File(out).mkdirs()
    qs.split(",").foreach { name =>
      val p = SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$out/$name.txt"), p)
      println(s"[plandump] wrote $out/$name.txt (${p.length} chars)")
    }
    spark.stop()
  }
}

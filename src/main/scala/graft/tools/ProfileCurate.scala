package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Decompose the curate-family serve cost (r18 optimization): replays
  * the BENCH session config (8 shuffle partitions, AQE on), runs each
  * t11* query cold with a job listener, and prints per-job wall time +
  * task counts so the stage-versus-expression split is measurable.
  * `sbt "runMain graft.tools.ProfileCurate <sfDir> <q1,q2,..> [reps]"`.
  */
object ProfileCurate {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qs = args.lift(1).getOrElse("t11_curate").split(",")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        math.min(cpus.toInt, 8).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description"))
            .getOrElse("") + s" [stages=${j.stageIds.size}]"))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobs.get(j.jobId)).foreach { case (t0, d) =>
          done.add((j.jobId, (System.nanoTime() - t0) / 1e9, d))
        }
      }
    })
    qs.foreach { name =>
      (1 to reps).foreach { i =>
        spark.catalog.clearCache()
        done.clear()
        val t0 = System.nanoTime()
        val q = SparkEntry.queries(name)(spark, dir)
        val t1 = System.nanoTime()
        val n = q.count()
        val t2 = System.nanoTime()
        println(f"[prof] $name rep$i: construct ${(t1 - t0) / 1e9}%.2f s, " +
          f"execute ${(t2 - t1) / 1e9}%.2f s ($n rows)")
        import scala.jdk.CollectionConverters._
        done.asScala.toSeq.sortBy(_._1).foreach { case (id, s, d) =>
          println(f"[prof]   job $id%3d ${s}%6.2f s $d")
        }
      }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Artifacts, Tables}

/** Where does t11* CONSTRUCTION time go? (r18: the profiler showed
  * construct ≫ execute for the curate family.) Times each building
  * block in isolation: artifact fingerprints, staged reads, the
  * scoring projection's analysis, the full curate plan build.
  */
object ProfileConstruct {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 3).foreach { i =>
      time(s"fingerprint x1 ($i)")(Artifacts.fingerprint(dir))
      val d = time(s"Tables.load documents ($i)")(
        Tables.load(spark, dir, "documents"))
      time(s"langId+quality withColumns analysis ($i)") {
        d.withColumn("pred_lang",
            graft.functions.TextFunctions.langId(col("text")))
          .withColumn("quality",
            graft.functions.TextFunctions.qualityScore(col("text")))
          .withColumn("_rep",
            graft.operators.Repetition.topBigramCount(col("text")))
          .withColumn("_intra",
            graft.operators.Repetition.dupChunkFrac(col("text"), 3))
          .queryExecution.analyzed
      }
      time(s"t11 FULL construct ($i)")(
        graft.queries.CurateOps.queries("t11_curate")(spark, dir))
      time(s"t11c FULL construct ($i)")(
        graft.queries.CurateOps.queries("t11c_curate_full")(spark, dir))
      // isolate CATALYST cost of the big scoring trees: force a full
      // optimize+physical-plan of the scored projection vs a literal
      // stand-in of the same shape (no execution either way)
      val scored = d
        .withColumn("pred_lang",
          graft.functions.TextFunctions.langId(col("text")))
        .withColumn("quality",
          graft.functions.TextFunctions.qualityScore(col("text")))
        .withColumn("_rep",
          graft.operators.Repetition.topBigramCount(col("text")))
        .withColumn("_intra",
          graft.operators.Repetition.dupChunkFrac(col("text"), 3))
      time(s"plan-only scored exprs ($i)")(
        scored.queryExecution.executedPlan)
      val lits = d.withColumn("pred_lang", lit("en"))
        .withColumn("quality", lit(0.5))
        .withColumn("_rep", lit(1))
        .withColumn("_intra", lit(0.5))
      time(s"plan-only literal exprs ($i)")(
        lits.queryExecution.executedPlan)
      spark.catalog.clearCache()
    }
    // sample the driver stack during one more construct to find the
    // hot frames (poor-man's profiler: 20 ms sampling of this thread)
    val main = Thread.currentThread()
    val samples = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val st = main.getStackTrace
        // top interesting frame: first org.apache.spark / graft frame
        val top = st.find(f =>
          f.getClassName.startsWith("org.apache.spark.sql.catalyst") ||
          f.getClassName.startsWith("org.apache.spark.sql.execution") ||
          f.getClassName.startsWith("graft"))
        samples.add(top.map(f => s"${f.getClassName}.${f.getMethodName}")
          .getOrElse(st.headOption.map(_.getClassName).getOrElse("?")))
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    graft.queries.CurateOps.queries("t11c_curate_full")(spark, dir)
    sampling = false
    import scala.jdk.CollectionConverters._
    samples.asScala.groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy(-_._2).take(25)
      .foreach { case (f, n) => println(f"[prof] sample $n%4d  $f") }
    spark.stop()
  }
}

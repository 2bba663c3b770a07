package graft.tools

import org.apache.spark.sql.functions._

/** Decompose the d29/d30 banding sweeps and d26 prefix filter:
  * `sbt "runMain graft.tools.ProfileSweeps <sfDir>"`.
  */
object ProfileSweeps {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.queries.DedupOps
    // prestage
    Seq("d30_hamming_band_sweep", "d29_lsh_plan_sweep", "d26_prefix_filter",
      "d24_containment_recall").foreach(n =>
      DedupOps.queries(n)(spark, dir))
    val reps = sys.env.getOrElse("PROF_REPS", "3").toInt
    (1 to reps).foreach { i =>
      time(s"d30 full $i")(
        DedupOps.queries("d30_hamming_band_sweep")(spark, dir).count())
      time(s"d29 full $i")(
        DedupOps.queries("d29_lsh_plan_sweep")(spark, dir).count())
      time(s"d26 full $i")(
        DedupOps.queries("d26_prefix_filter")(spark, dir).count())
      time(s"d24 full $i")(
        DedupOps.queries("d24_containment_recall")(spark, dir).count())
    }
    if (sys.env.contains("PROF_SKIP_LEGS")) { spark.stop(); return }
    // d30 per-leg decomposition
    val sig = DedupOps.profileSimhash48Idx(spark, dir)
    val truth = DedupOps.profileHammingTruthIdx(spark, dir)
    println(s"[prof] sig rows = ${sig.count()}, truth rows = ${truth.count()}")
    Seq(1, 2, 3, 4).foreach { b =>
      val cand = graft.operators.Dedup.hammingBandCandidates(
        sig, "doc_id", "simhash", bits = 48, bands = b)
      time(s"d30 cand(bands=$b) count")(
        println(s"  n_cand=${cand.count()}"))
      time(s"d30 caught(bands=$b)")(
        truth.join(cand, Seq("doc_a", "doc_b"), "left_semi").count())
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Measures the salted join against the plain join on a zipf-keyed
  * fixture, in the regime [[Skew.saltedJoin]] exists for: broadcast
  * OFF and AQE's skew-join split OFF — the plan shape of stream-stream
  * joins and keyed stateful ops, where AQE cannot re-plan a hot key
  * out of a single task. Results go into SCALING.md §Skew.
  *
  * Usage: `sbt "runMain graft.tools.SkewBench [rows] [hotPermille]"`
  * (defaults 4M rows, 800‰ on the hot key, 200k cold keys, salt=32).
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(4000000L)
    val hotPermille = args.lift(1).map(_.toInt).getOrElse(800)
    val coldKeys = args.lift(2).map(_.toLong).getOrElse(200000L)
    val salt = args.lift(3).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // the stream/stateful regime: no broadcast rescue, no AQE skew
      // split — a hot key is one task unless the operator salts it
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.enabled", "false")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // zipf-ish: hotPermille‰ of rows on key 0, the rest uniform over
    // coldKeys; payload column defeats trivial pruning, row_id is the
    // retry-stable salt source (hot rows are otherwise identical)
    val left = spark.range(rows).select(
      when(pmod(col("id"), lit(1000)) < hotPermille, lit(0L))
        .otherwise(pmod(xxhash64(col("id")), lit(coldKeys)) + 1L).as("key"),
      col("id").as("row_id"),
      (col("id") % 97).cast("double").as("v"))
    val right = spark.range(coldKeys + 1)
      .select(col("id").as("key"), (col("id") % 13).as("tag"))

    def time(label: String, df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = df.groupBy("tag").agg(sum("v")).collect().length
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[skewbench] $label%-12s $s%8.2f s  ($n tag groups)")
      s
    }

    left.persist().count(); right.persist().count()
    time("warmup", left.join(right, Seq("key")))
    val plain = time("plain", left.join(right, Seq("key")))
    val salted = time("salted",
      Skew.saltedJoin(left, right, "key", salt, saltOn = Some(col("row_id"))))
    println(f"[skewbench] rows=$rows hot=${hotPermille}‰ salt=$salt " +
      f"speedup=${plain / salted}%.2fx")
    spark.stop()
  }
}

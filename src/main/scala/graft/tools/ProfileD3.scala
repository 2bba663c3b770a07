package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Graft, Tables}
import graft.operators.Dedup

/** Stage-by-stage timing of the d3 near-dup pipeline:
  * `sbt "runMain graft.tools.ProfileD3 <sfDir>"`.
  */
object ProfileD3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.session("profile-d3")
    val docs = Tables.load(spark, dir, "documents")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    time("docs.count")(docs.count())
    val sr = Dedup.shingleRows(docs)
    time("shingleRows.count")(sr.count())
    val sigs = Dedup.signatures(docs)
    time("signatures.count")(sigs.count())
    val bk = Dedup.lshBuckets(docs)
    time("lshBuckets.count")(bk.count())
    val cand = Dedup.candidatePairs(docs)
    time("candidatePairs.count")(cand.count())
    val nd = Dedup.nearDupPairs(docs, 0.8)
    time("nearDupPairs.count cold")(nd.count())
    time("nearDupPairs.count warm")(nd.count())
    val nd2 = Dedup.nearDupPairs(docs, 0.8)
    time("nearDupPairs fresh-DF warm")(nd2.count())
    spark.stop()
  }
}

package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Scale-growth regression smoke: times the dedup (d2/d3/d6) and ANN
  * (v2/v12) families on a 1× and a deterministic 10× slice of the
  * documents/embeddings tables and asserts wall-time grows roughly
  * linearly — the gate that converts SCALING.md's "never all-pairs"
  * narratives into a measurable regression check (an accidental O(n²)
  * would show up as ~100× growth against the ~10× bar).
  *
  * Fixture construction keeps the WORKLOAD linear by design:
  *  - documents: copy i prefixes every text with a `cp$i` token, so
  *    shingles/minhashes differ across copies and LSH buckets don't
  *    accumulate cross-copy candidate pairs (which would be a real
  *    quadratic workload, not a regression);
  *  - embeddings: ids remapped per copy, vectors untouched — corpus
  *    scans grow 10×; the QUERY SET stays the base one (copy 0), so
  *    brute/IVF/PQ work scales with the corpus, not corpus × queries.
  *
  * Usage: `sbt "runMain graft.tools.ScaleSmoke [baseSfDir] [factor]"`
  * (defaults /root/testdata/sf0.01 and 10). Prints per-query times and
  * ratios; exits nonzero if any ratio exceeds `factor × 2.5` (generous
  * slack for fixed overheads; quadratic blowup is ~factor² and trips
  * it with a wide margin).
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs0 = spark.read.parquet(s"$baseDir/documents.parquet")
    val emb0 = spark.read.parquet(s"$baseDir/embeddings.parquet")
    val nDocs = docs0.agg(max("doc_id")).as[Long].head() + 1
    val nVecs = emb0.agg(max("vec_id")).as[Long].head() + 1

    def scaledDocs(f: Int): DataFrame =
      (0 until f).map { i =>
        docs0.select(
          (col("doc_id") + lit(i * nDocs)).as("doc_id"),
          (if (i == 0) col("text")
           else concat(lit(s"cp$i "), col("text"))).as("text"),
          col("source"))
      }.reduce(_.unionByName(_))

    def scaledEmb(f: Int): DataFrame =
      (0 until f).map { i =>
        emb0.select((col("vec_id") + lit(i * nVecs)).as("vec_id"),
          col("label"), col("embedding"))
      }.reduce(_.unionByName(_))

    // materialize to parquet so every timed run scans real files, not
    // an in-memory union plan
    val tmp = Files.createTempDirectory("scalesmoke").toString
    def persist(df: DataFrame, name: String): DataFrame = {
      val p = s"$tmp/$name"
      df.write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    val d1x = persist(scaledDocs(1), "docs1")
    val dNx = persist(scaledDocs(factor), s"docs$factor")
    val e1x = persist(scaledEmb(1), "emb1")
    val eNx = persist(scaledEmb(factor), s"emb$factor")
    val queries = e1x.filter(col("vec_id") % 50 === 0)

    def bench(name: String, run: (DataFrame, DataFrame) => DataFrame): (String, Double) = {
      def once(d: DataFrame, e: DataFrame): Double = {
        val t0 = System.nanoTime()
        run(d, e).count()
        (System.nanoTime() - t0) / 1e9
      }
      once(d1x, e1x) // warmup (codegen + reader init)
      val t1 = once(d1x, e1x)
      val tn = once(dNx, eNx)
      val ratio = tn / t1
      println(f"[scalesmoke] $name%-8s 1x=$t1%6.2f s  ${factor}x=$tn%6.2f s  ratio=$ratio%5.1f")
      name -> ratio
    }

    val ratios = Seq(
      bench("d2", (d, _) => Dedup.candidatePairs(d)),
      bench("d3", (d, _) => Dedup.nearDupPairs(d, threshold = 0.5)),
      bench("d6", (d, _) => Dedup.clusterIds(
        Dedup.nearDupPairs(d, threshold = 0.5)
          .select(col("doc_a"), col("doc_b")))),
      bench("v2", (_, e) => Similarity.ivfKnn(e, queries, k = 3)),
      bench("v12", (_, e) => Similarity.pqKnn(e, queries,
        Similarity.pqCodebook(e, m = 4, k = 16), k = 3,
        cellCol = Some("label"))))

    val bar = factor * 2.5
    val bad = ratios.filter(_._2 > bar)
    println(s"[scalesmoke] bar=${bar}x  " +
      (if (bad.isEmpty) "PASS" else s"FAIL: ${bad.mkString(", ")}"))
    spark.stop()
    if (bad.nonEmpty) sys.exit(1)
  }
}

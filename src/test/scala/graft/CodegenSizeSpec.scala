package graft

import org.apache.spark.sql.execution.debug
import org.scalatest.funsuite.AnyFunSuite

/** Codegen method-size guard — the generalized v26 diagnosis: HotSpot
  * refuses to JIT any method whose BYTECODE exceeds the 8,000-byte
  * `DontCompileHugeMethods` ceiling (`-XX:HugeMethodLimit=8000`,
  * product build, not overridable there), so a generated method in
  * the 8 k–65 k band runs INTERPRETED for the life of the executor —
  * PLANS.md's v26 entry measured the fused build+serve plan 2.7×
  * slower from exactly one 9,887-byte method. Spark's own guard
  * (`spark.sql.codegen.hugeMethodLimit`, default 65,535 — the JVM's
  * hard 64 KB *verifier* limit) misses that band entirely: it
  * disables codegen only when even interpretation would fail.
  *
  * This spec walks the whole-stage-codegen compile stats of the
  * literal-heaviest pinned queries (inline centroids, ADC codebook
  * tables, bloom bit literals, band expressions) and asserts every
  * generated method stays under the JIT ceiling. A literal blob
  * growing past it would silently de-JIT the hot path — correct
  * results, interpreted speed — which no correctness gate catches.
  */
class CodegenSizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** HotSpot C2's DontCompileHugeMethods ceiling (bytecode bytes). */
  private val hugeMethodLimit = 8000

  private val pinned = Seq(
    "v9_knn_pq", // corpus encode + query ADC table (PqCodes/AdcTable)
    "v12_knn_ivfpq", // same kernels under the cell equi-join
    "v17_pq_refined_recall", // two encode legs (seed + refined)
    "v24_embed_quality", // literal seed-centroid gate
    "v25_ivf_nprobe_sweep", // ranked-probe join over staged cells
    "v26_ivfpq_serve", // staged serve + per-query ADC tables
    "v28_pq_sweep", // four ADC legs, four codebooks (m=8: 128 codewords)
    "v29_index_upsert_serve", // changelog-resolved serve
    "t26_bloom_decontam", // bloom bit literals
    "d30_hamming_band_sweep", // four band-extraction legs
    "v33_residual_pq_serve", // residual encode + per-probe-cell ADC
    "v31_hashembed_knn") // literal-centroid serve over hash embeds

  test("every whole-stage-generated method stays under HotSpot's 8000-byte JIT ceiling") {
    // AQE wraps the plan in AdaptiveSparkPlanExec whose codegen stages
    // only materialize at execution — walk the static plan instead
    // (same generated code; this is how the v26 root cause was found)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try pinned.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan
      val stats = debug.codegenStringSeq(plan)
      assert(stats.nonEmpty, s"$name produced no codegen subtrees")
      stats.zipWithIndex.foreach { case ((subtree, _, s), i) =>
        assert(s.maxMethodCodeSize < hugeMethodLimit,
          s"$name subtree $i: max generated method " +
            s"${s.maxMethodCodeSize} B >= $hugeMethodLimit B " +
            s"(JIT-refused band). Subtree:\n${subtree.take(800)}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }
}

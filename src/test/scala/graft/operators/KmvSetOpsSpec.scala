package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KmvSetOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Docs where each word is its own 1-shingle-capable token; overlap
    * is engineered via shared words: source a = w0..w599, b = w300..w899
    * (300 shared), c = disjoint w2000..w2099.
    */
  private def fixture = {
    def doc(src: String, id: Long, from: Int, until: Int) =
      (id, (from until until).map(i => s"w$i").mkString(" "), src)
    Seq(doc("a", 1, 0, 600), doc("b", 2, 300, 900),
      doc("c", 3, 2000, 2100)).toDF("doc_id", "text", "source")
  }

  private def row(df: org.apache.spark.sql.DataFrame, sa: String, sb: String) =
    df.filter(col("src_a") === sa && col("src_b") === sb).head()

  test("unsaturated sketches (k >= universe) give exact set operations") {
    // 3-shingles of a 600-word doc: 598 per source — k = 4096 never fills
    val out = Dedup.kmvSetOps(fixture, k = 4096)
    val ab = row(out, "a", "b")
    // shingles shared by a and b: those fully inside w300..w599 = 298
    assert(ab.getLong(ab.fieldIndex("exact_inter")) === 298L)
    assert(ab.getDouble(ab.fieldIndex("est_inter")) === 298.0)
    assert(ab.getDouble(ab.fieldIndex("est_union")) === (598.0 + 598.0 - 298.0))
    val ac = row(out, "a", "c")
    assert(ac.getLong(ac.fieldIndex("exact_inter")) === 0L)
    assert(ac.getDouble(ac.fieldIndex("est_inter")) === 0.0)
  }

  test("saturated sketches: union merge is exact algebra, estimates calibrated") {
    val out = Dedup.kmvSetOps(fixture, k = 64)
    val ab = row(out, "a", "b")
    // the merged-union estimate must EQUAL a direct single-group pass
    // over the union'd rows (k-min of union == k-min of the k-mins)
    val direct = Dedup.kmvDistinct(
      fixture.filter(col("source") =!= "c").withColumn("source", lit("u"))
        .select(col("source"), explode(Dedup.shinglesOf(
          split(col("text"), " "), 3)).as("sh")).distinct(),
      groupCol = "source", valueCol = "sh", k = 64)
    val directEst = direct.select(col("kmv_estimate")).as[Double].head()
    assert(ab.getDouble(ab.fieldIndex("est_union")) === directEst)
    // estimator calibration on this deterministic hash set: within
    // ±35% of truth for the union, intersection lands in a sane band
    val estU = ab.getDouble(ab.fieldIndex("est_union"))
    assert(math.abs(estU - 898.0) / 898.0 < 0.35, s"est_union=$estU")
    val estI = ab.getDouble(ab.fieldIndex("est_inter"))
    assert(estI >= 0.0 && estI < 898.0, s"est_inter=$estI")
  }

  test("every ordered pair appears exactly once, zero-overlap pairs included") {
    val out = Dedup.kmvSetOps(fixture, k = 64)
    val pairs = out.select("src_a", "src_b").as[(String, String)]
      .collect().toSet
    assert(pairs === Set(("a", "b"), ("a", "c"), ("b", "c")))
  }
}

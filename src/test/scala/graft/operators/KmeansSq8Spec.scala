package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.VecI8

/** Pins the scalar-quantized (SQ8/VecI8) kernels and the k-means
  * trainer invariants the v6/v7/v8 oracle queries rely on.
  */
class VecI8Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("pack+dot is bit-identical to the HOF integer dot on real codes") {
    val qz = emb
      .filter(Similarity.maxAbs($"embedding") > 0)
      .select($"vec_id",
        Similarity.sq8($"embedding", Similarity.maxAbs($"embedding")).as("q"))
    val pairs = qz.limit(25).select($"q".as("qa"))
      .crossJoin(qz.limit(7).select($"q".as("qb")))
    val diffs = pairs.select(
        (VecI8.dot(VecI8.pack($"qa"), VecI8.pack($"qb")) -
          Similarity.dotIntHof($"qa", $"qb")).as("d"))
      .filter($"d" =!= 0L).count()
    assert(diffs === 0)
  }

  test("pack clamps out-of-range values and maps null elements to 0") {
    val df = Seq(Tuple1(Seq(Some(300L), Some(-300L), Some(127L),
      Some(-128L), None, Some(0L)))).toDF("q")
    val bytes = df.select(VecI8.pack($"q")).as[Array[Byte]].head()
    assert(bytes.toSeq === Seq[Byte](127, -128, 127, -128, 0, 0))
  }

  test("integer dot truncates to the shorter input") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(10L, 20L))).toDF("a", "b")
    val v = df.select(VecI8.dot(VecI8.pack($"a"), VecI8.pack($"b")))
      .as[Long].head()
    assert(v === 50L) // 1·10 + 2·20, third lane dropped
  }

  test("sq8 codes stay in [-127, 127] on real embeddings") {
    val bad = emb.filter(Similarity.maxAbs($"embedding") > 0)
      .select(explode(
        Similarity.sq8($"embedding", Similarity.maxAbs($"embedding"))).as("c"))
      .filter($"c" > 127L || $"c" < -127L).count()
    assert(bad === 0)
  }

  test("sqKnn excludes zero vectors (no quantization scale) on both sides") {
    val zero = Seq((9999L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding")
    val withZero = emb.select($"vec_id", $"embedding").union(zero)
    // zero query vector → filtered out before the scan, empty result
    assert(Similarity.sqKnn(withZero,
      withZero.filter($"vec_id" === 9999L), k = 3).count() === 0)
    // zero corpus vector → never appears as a neighbor
    val out = Similarity.sqKnn(withZero,
        withZero.filter($"vec_id" === 0L), k = 1000)
      .filter($"n_id" === 9999L).count()
    assert(out === 0)
  }
}

class KmeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("trainKmeans is partition-independent bit-for-bit") {
    val m1 = Similarity.trainKmeans(emb.repartition(1), k = 4, iters = 2)
    val m7 = Similarity.trainKmeans(emb.repartition(7), k = 4, iters = 2)
    assert(m1 === m7)
  }

  test("objective is non-decreasing across Lloyd's iterations") {
    val objs = (0 to 3).map { i =>
      Similarity.kmeansObjective(emb,
        Similarity.trainKmeans(emb, k = 4, iters = i))
    }
    objs.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-12, s"objective decreased: $objs")
    }
  }

  test("a cell that loses all members keeps its previous centroid") {
    // every vector identical → ties all break to centroid 0, so
    // centroid 1 trains on an empty cell and must survive unchanged
    val allSame = (0L to 5L).map(i => (i, Array(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val m = Similarity.trainKmeans(allSame, k = 2, iters = 1).toMap
    assert(m(1) === Seq(3.0, 4.0)) // untouched seed, exact
    // centroid 0 = mean of the cell's unit vectors ≈ (0.6, 0.8)
    assert(math.abs(m(0)(0) - 0.6) < 1e-9)
    assert(math.abs(m(0)(1) - 0.8) < 1e-9)
  }

  test("assignModel with an empty model yields an empty typed frame") {
    val out = Similarity.assignModel(emb, Seq.empty)
    assert(out.columns.toSeq === Seq("vec_id", "cell"))
    assert(out.count() === 0)
  }

  test("assignModel ties break to the lowest centroid id") {
    val vecs = Seq((10L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val model: Similarity.KmeansModel =
      Seq(0 -> Seq(2.0, 0.0), 1 -> Seq(1.0, 0.0)) // both cosine 1.0
    val cell = Similarity.assignModel(vecs, model)
      .select($"cell").as[Long].head()
    assert(cell === 0L)
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the mean-pool aggregation (v18's operator): the scalar
  * (group, pos, m) surface and the array-building wrapper must be two
  * views of the same aggregate, exactly dims rows/components per
  * group, independent of partitioning.
  */
class MeanPoolSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("meanPool array is exactly meanPoolRows rebuilt in pos order") {
    val rows = Similarity.meanPoolRows(emb, "label", dims = 64)
      .groupBy($"label")
      .agg(transform(array_sort(collect_list(struct($"pos", $"m"))),
        x => x.getField("m")).as("rebuilt"))
    val diffs = Similarity.meanPool(emb, "label", dims = 64)
      .join(rows, "label")
      .filter($"pooled" =!= $"rebuilt").count()
    assert(diffs === 0)
  }

  test("meanPoolRows emits only atomic columns, dims rows per group") {
    val out = Similarity.meanPoolRows(emb, "label", dims = 64)
    assert(out.schema.fields.forall(f => !f.dataType.typeName.matches(
      "array|map|struct")))
    val bad = out.groupBy($"label").agg(count(lit(1)).as("n"))
      .filter($"n" =!= 64L).count()
    assert(bad === 0)
  }

  test("mean is partitioning-independent (bit-equal at 1 vs 13 parts)") {
    val a = Similarity.meanPoolRows(emb.repartition(1), "label", dims = 64)
    val b = Similarity.meanPoolRows(emb.repartition(13), "label", dims = 64)
    assert(a.join(b.withColumnRenamed("m", "m2"), Seq("label", "pos"))
      .filter($"m" =!= $"m2").count() === 0)
    assert(a.count() === b.count())
  }

  test("wrong-width and null vectors are excluded from the pool") {
    val df = Seq(
      ("a", Some(Seq(1.0f, 2.0f))),
      ("a", Some(Seq(3.0f, 4.0f))),
      ("a", Some(Seq(9.0f))), // wrong width — must not vote
      ("a", None)
    ).toDF("label", "embedding")
    val m = Similarity.meanPoolRows(df, "label", dims = 2)
      .orderBy($"pos").as[(String, Int, Double)].collect()
    assert(m.toSeq === Seq(("a", 0, 2.0), ("a", 1, 3.0)))
  }
}

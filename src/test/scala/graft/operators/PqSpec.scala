package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the product-quantization kernels (codebook slicing, argmin
  * encode, ADC distance) behind the v9 driver query.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private val M = 4
  private val K = 16

  /** Driver-side replica of encode + ADC with the same float-op order. */
  private def sqDistScala(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }

  test("native vec_sqdist kernel is bit-identical to the HOF fold") {
    val pairs = emb.limit(50).select($"embedding".as("a"))
      .crossJoin(emb.limit(11).select($"embedding".as("b")))
    val diffs = pairs.select(
        (Similarity.sqDist($"a", $"b") -
          Similarity.sqDistHof($"a", $"b")).as("d"))
      .filter($"d" =!= 0.0).count()
    assert(diffs === 0)
  }

  test("codebook slices the first-k vectors into m contiguous subspaces") {
    val cb = Similarity.pqCodebook(emb, M, K)
    assert(cb.size === M && cb.forall(_.size === K))
    assert(cb.forall(_.forall(_.size === 64 / M)))
    val first = emb.orderBy("vec_id").limit(1)
      .select(transform($"embedding", x => x.cast("double")))
      .as[Seq[Double]].head()
    assert(cb(1)(0) === first.slice(16, 32))
  }

  test("encode is the per-subspace argmin with lowest-id tie-break") {
    val cb = Similarity.pqCodebook(emb, M, K)
    val got = emb.select($"vec_id",
        Similarity.pqEncode($"embedding", cb).as("codes"),
        transform($"embedding", x => x.cast("double")).as("v"))
      .as[(Long, Seq[Int], Seq[Double])].collect()
    got.foreach { case (_, codes, v) =>
      assert(codes.size === M)
      codes.zipWithIndex.foreach { case (c, mi) =>
        assert(c >= 0 && c < K)
        val sub = v.slice(mi * 16, (mi + 1) * 16)
        val dists = cb(mi).map(cw => sqDistScala(sub, cw))
        // argmin with lowest-id tie-break
        val best = dists.zipWithIndex.minBy { case (d, i) => (d, i) }._2
        assert(c === best)
      }
    }
  }

  test("ADC distances match the driver-side replica and rank correctly") {
    val cb = Similarity.pqCodebook(emb, M, K)
    val queries = emb.filter($"vec_id" % 50 === 0)
    val knn = Similarity.pqKnn(emb, queries, cb, k = 3)
      .as[(Long, Long, Int, Double)].collect()
    assert(knn.nonEmpty)
    val vecs = emb.select($"vec_id",
        transform($"embedding", x => x.cast("double")))
      .as[(Long, Seq[Double])].collect().toMap
    val codes = emb.select($"vec_id", Similarity.pqEncode($"embedding", cb))
      .as[(Long, Seq[Int])].collect().toMap
    knn.foreach { case (qId, nId, _, dist) =>
      val expected = (0 until M).foldLeft(0.0) { (acc, mi) =>
        acc + sqDistScala(
          vecs(qId).slice(mi * 16, (mi + 1) * 16),
          cb(mi)(codes(nId)(mi)))
      }
      assert(dist === expected, s"q=$qId n=$nId")
    }
    // per query: ranks are 1..3 with non-decreasing distance
    knn.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._3)
      assert(sorted.map(_._3).toSeq === Seq(1, 2, 3))
      assert(sorted.sliding(2).forall(p => p.head._4 <= p.last._4))
    }
  }

  test("pqKnn is deterministic under repartitioning") {
    val cb = Similarity.pqCodebook(emb, M, K)
    val queries = emb.filter($"vec_id" % 100 === 0)
    def run(c: org.apache.spark.sql.DataFrame) =
      Similarity.pqKnn(c, queries, cb, k = 3)
        .as[(Long, Long, Int, Double)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(run(emb) === run(emb.repartition(11)))
  }

  test("write-then-serve PQ index equals the fused path row-for-row") {
    val cb = Similarity.pqCodebook(emb, M, K)
    val queries = emb.filter($"vec_id" % 50 === 0)
    val dir = java.nio.file.Files.createTempDirectory("pq_idx").toString
    // build once, persist, serve from the persisted index
    Similarity.pqEncodeCorpus(emb, cb).write.mode("overwrite").parquet(dir)
    val served = Similarity.pqScoreCodes(
        spark.read.parquet(dir), queries, cb, k = 3)
      .as[(Long, Long, Int, Double)].collect().sortBy(r => (r._1, r._3)).toSeq
    val fused = Similarity.pqKnn(emb, queries, cb, k = 3)
      .as[(Long, Long, Int, Double)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(served === fused)
  }

  test("releaseIndex retrains the codebook on the RESOLVED corpus and re-encodes") {
    val e = emb.filter($"vec_id" < 40)
    val vecType = e.schema("embedding").dataType
    val feed = e.select($"vec_id", $"embedding",
        lit("insert").as("op"), lit(1L).as("seq"))
      .unionByName(e.filter($"vec_id" === 2)
        .select($"vec_id", reverse($"embedding").as("embedding"),
          lit("update").as("op"), lit(2L).as("seq")))
      .unionByName(e.filter($"vec_id" === 5)
        .select($"vec_id", lit(null).cast(vecType).as("embedding"),
          lit("delete").as("op"), lit(2L).as("seq")))
    val cents = e.filter($"vec_id" < 2)
    val (idx, cb) = Similarity.releaseIndex(
      Similarity.indexChangelog(feed, cents), cents, M, K)
    // the live corpus the release must have trained/encoded against:
    // id 5 gone (a tombstoned id must not train codewords), id 2 the
    // reversed update
    val live = e.filter($"vec_id" =!= 5).select($"vec_id",
      when($"vec_id" === 2, reverse($"embedding"))
        .otherwise($"embedding").as("embedding"))
    assert(cb === Similarity.pqCodebook(live, M, K),
      "codebook trained on the resolved live state")
    assert(cb !== Similarity.pqCodebook(e, M, K),
      "the release actually moved the codebook (id 2 < 16 reversed)")
    // re-encode: the released index equals a fresh build over the
    // live corpus under the new codebook, row for row
    val fresh = Similarity.indexCells(live, cents, codebook = Some(cb))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id", $"embedding", $"nrm", $"cell", $"codes")
        .as[(Long, Seq[Float], Double, Long, Seq[Int])].collect().toSet
    assert(canon(idx) === canon(fresh))
  }

  test("refined codebook is deterministic and partition-independent") {
    def run(c: org.apache.spark.sql.DataFrame) =
      Similarity.pqCodebookRefined(c, M, K, iters = 2)
    val a = run(emb)
    val b = run(emb.repartition(11))
    // bit-equality of every codeword component: the DECIMAL(28,12)
    // mean sum is associative, so partitioning must not matter
    assert(a === b)
    // encode under the refined codebook is likewise stable
    val ea = emb.select($"vec_id", Similarity.pqEncode($"embedding", a))
      .as[(Long, Seq[Int])].collect().sortBy(_._1).toSeq
    val eb = emb.repartition(7)
      .select($"vec_id", Similarity.pqEncode($"embedding", b))
      .as[(Long, Seq[Int])].collect().sortBy(_._1).toSeq
    assert(ea === eb)
  }

  test("refinement rounds never increase per-subspace quantization MSE") {
    // Lloyd's guarantee: assign-then-recenter is non-increasing in
    // summed squared reconstruction error; verify across 3 rounds
    def mse(cb: Similarity.PqCodebook): Double = {
      val vecs = emb.select(transform($"embedding", x => x.cast("double")))
        .as[Seq[Double]].collect()
      vecs.map { v =>
        (0 until M).map { mi =>
          val sub = v.slice(mi * 16, (mi + 1) * 16)
          cb(mi).map(cw => sqDistScala(sub, cw)).min
        }.sum
      }.sum / vecs.length
    }
    val errs = (0 to 3).map(i =>
      mse(Similarity.pqCodebookRefined(emb, M, K, iters = i)))
    errs.sliding(2).foreach { case Seq(prev, next) =>
      assert(next <= prev + 1e-9, s"MSE rose across a round: $errs")
    }
    // and one round genuinely improves on the raw seed for this corpus
    assert(errs(1) < errs(0))
  }

  test("filtered serve over a meta-carrying index equals the index built from the filtered corpus") {
    // the v30 contract: index columns are pure per-row functions, so
    // serve-time index.filter(meta) == ingest-time corpus.filter(meta)
    // — and the pre-filter is applied BEFORE ranking (v22's contract),
    // so every query still gets k admissible candidates
    val e = emb
    val cents = e.filter($"vec_id" < 8)
    val cb = Similarity.pqCodebook(e, M, K)
    val queries = e.filter($"vec_id" % 50 === 0)
    val metaIdx = Similarity.indexCells(e, cents, codebook = Some(cb),
      carryCols = Seq("label"))
    val preIdx = Similarity.indexCells(e.filter($"label" % 2 === 0),
      cents, codebook = Some(cb))
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id", "rnk", "dist")
        .as[(Long, Long, Int, Double)].collect().toSet
    val filtered = res(Similarity.pqScoreCodesIndexed(
      metaIdx.filter($"label" % 2 === 0), queries, cents, cb,
      k = 3, nprobe = 2))
    assert(filtered.nonEmpty)
    assert(filtered === res(Similarity.pqScoreCodesIndexed(
      preIdx, queries, cents, cb, k = 3, nprobe = 2)))
    // and every returned neighbor satisfies the predicate
    val evenIds = e.filter($"label" % 2 === 0)
      .select($"vec_id").as[Long].collect().toSet
    assert(filtered.forall { case (_, nid, _, _) => evenIds(nid) })
  }

  test("IVF-PQ equals exhaustive PQ re-ranked within the query's cell") {
    val cb = Similarity.pqCodebook(emb, M, K)
    val queries = emb.filter($"vec_id" % 50 === 0)
    val ivfpq = Similarity.pqKnn(emb, queries, cb, k = 3,
        cellCol = Some("label"))
      .as[(Long, Long, Int, Double)].collect()
      .map(r => (r._1, r._3) -> (r._2, r._4)).toMap
    // reference: all same-cell ADC pairs, ranked per query in Scala
    val cells = emb.select($"vec_id", $"label").as[(Long, Long)]
      .collect().toMap
    val all = Similarity.pqKnn(emb, queries, cb, k = Int.MaxValue)
      .as[(Long, Long, Int, Double)].collect()
    val expect = all
      .filter { case (q, n, _, _) => cells(q) == cells(n) }
      .groupBy(_._1).toSeq.flatMap { case (q, g) =>
        g.sortBy(r => (r._4, r._2)).take(3).zipWithIndex.map {
          case ((_, n, _, d), i) => (q, i + 1) -> (n, d)
        }
      }.toMap
    assert(ivfpq === expect)
  }
}

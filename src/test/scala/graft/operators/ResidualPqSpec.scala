package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins residual IVF-PQ ([[Similarity.residuals]] /
  * [[Similarity.pqCodebookResidual]] / [[Similarity.indexCellsResidual]]
  * / [[Similarity.pqScoreCodesIndexedResidual]]) against a full
  * in-test JVM replay (assignment → residual → seed codebook → argmin
  * encode → per-probe-cell ADC → rank), the algebraic identity
  * residual + centroid = vector, and the point of the encoding:
  * strictly lower quantization distortion than raw-space PQ on a
  * clustered fixture.
  */
class ResidualPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // clustered fixture: two far-apart cells, small per-vector noise —
  // the geometry residual encoding exists for
  private val cents = Seq(
    (0L, Seq(10.0, 0.0, 0.0, 0.0)),
    (1L, Seq(0.0, 10.0, 0.0, 0.0)))
  private val noise = (0 until 20).map { i =>
    Seq(0.3 * ((i % 5) - 2), 0.2 * ((i % 3) - 1),
      0.25 * ((i % 7) - 3), 0.15 * ((i % 4) - 1))
  }
  private val vecs: Seq[(Long, Seq[Double])] = noise.zipWithIndex.map {
    case (n, i) =>
      val c = cents(i % 2)._2
      (100L + i, c.zip(n).map { case (a, b) => a + b })
  }

  private def centsDF = cents.toDF("vec_id", "embedding")
  private def vecsDF = vecs.toDF("vec_id", "embedding")

  // ---- JVM replay of every stage (same op order as the operators) --
  private def dot(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
  private def nrm(a: Seq[Double]): Double = math.sqrt(dot(a, a))
  private def cos(a: Seq[Double], b: Seq[Double]): Double =
    dot(a, b) / (nrm(a) * nrm(b))
  private def cellOf(v: Seq[Double]): Long =
    cents.map { case (cid, cv) => (cos(v, cv), cid) }
      .sortBy { case (c, cid) => (-c, cid) }.head._2
  private def resOf(v: Seq[Double]): Seq[Double] = {
    val cv = cents.find(_._1 == cellOf(v)).get._2
    v.zip(cv).map { case (a, b) => a - b }
  }
  private def sqd(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
      acc + (x - y) * (x - y) }
  /** seed codebook over a space: first k rows by id, m subspaces */
  private def seedCb(rows: Seq[Seq[Double]], m: Int, k: Int)
      : Seq[Seq[Seq[Double]]] = {
    val sub = rows.head.size / m
    (0 until m).map(mi =>
      rows.take(k).map(_.slice(mi * sub, (mi + 1) * sub)))
  }
  private def encode(v: Seq[Double], cb: Seq[Seq[Seq[Double]]]): Seq[Int] =
    cb.zipWithIndex.map { case (cws, mi) =>
      val sub = cws.head.size
      val s = v.slice(mi * sub, (mi + 1) * sub)
      cws.zipWithIndex.map { case (cw, ci) => (sqd(s, cw), ci) }
        .sortBy { case (d, ci) => (d, ci) }.head._2
    }
  private def adc(q: Seq[Double], codes: Seq[Int],
                  cb: Seq[Seq[Seq[Double]]]): Double =
    cb.zipWithIndex.map { case (cws, mi) =>
      val sub = cws.head.size
      sqd(q.slice(mi * sub, (mi + 1) * sub), cws(codes(mi)))
    }.reduce(_ + _)

  test("residual + centroid reconstructs the vector exactly; cells match assignCells") {
    val got = Similarity.residuals(vecsDF, centsDF)
      .select(col("vec_id"), col("embedding"), col("cell"), col("residual"))
      .as[(Long, Seq[Double], Long, Seq[Double])].collect()
    assert(got.length === vecs.length)
    got.foreach { case (id, v, cell, r) =>
      assert(cell === cellOf(v), s"id=$id")
      val cv = cents.find(_._1 == cell).get._2
      assert(r.zip(cv).map { case (a, b) => a + b } === v, s"id=$id")
    }
  }

  test("residual serve matches the full JVM replay, table-per-probe-cell") {
    val m = 2; val kcw = 4; val k = 3; val nprobe = 2
    val cb = Similarity.pqCodebookResidual(vecsDF, centsDF, m, kcw)
    // replay codebook: first kcw residuals by id
    val expectCb = seedCb(vecs.sortBy(_._1).map(v => resOf(v._2)), m, kcw)
    assert(cb.map(_.map(_.toSeq).toSeq).toSeq === expectCb)
    val idx = Similarity.indexCellsResidual(vecsDF, centsDF, cb)
    val queries = vecsDF.filter(col("vec_id") % 5 === 0)
    val got = Similarity.pqScoreCodesIndexedResidual(idx, queries,
        centsDF, cb, k, nprobe)
      .select("q_id", "n_id", "rnk", "dist")
      .as[(Long, Long, Int, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(r =>
        (r._2, r._4)).toSeq).toMap
    // replay: nprobe=2 of 2 centroids = full probe; per probe cell the
    // query's residual AGAINST THAT CELL scores that cell's members
    val codesOf = vecs.map { case (id, v) => id -> encode(resOf(v), expectCb) }.toMap
    val cellsOf = vecs.map { case (id, v) => id -> cellOf(v) }.toMap
    val expect = vecs.filter(_._1 % 5 == 0).map { case (qid, qv) =>
      val cand = cents.flatMap { case (cid, cv) =>
        val qres = qv.zip(cv).map { case (a, b) => a - b }
        vecs.filter { case (nid, _) =>
          nid != qid && cellsOf(nid) == cid }
          .map { case (nid, _) => (nid, adc(qres, codesOf(nid), expectCb)) }
      }
      qid -> cand.sortBy { case (nid, d) => (d, nid) }.take(k)
    }.toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (qid, exp) =>
      assert(got(qid) === exp, s"q=$qid")
    }
  }

  test("residual encoding strictly lowers ADC distortion vs raw-space PQ") {
    val m = 2; val kcw = 4
    val rawCb = Similarity.pqCodebook(vecsDF, m, kcw)
    val resCb = Similarity.pqCodebookResidual(vecsDF, centsDF, m, kcw)
    // distortion = mean |ADC estimate − true sq distance| over all
    // (query, candidate) pairs, each scored in its serve's own space
    val pairs = for {
      (qid, qv) <- vecs; (nid, nv) <- vecs if nid != qid
    } yield (qv, nv)
    val rawCbS = rawCb.map(_.map(_.toSeq).toSeq).toSeq
    val resCbS = resCb.map(_.map(_.toSeq).toSeq).toSeq
    val rawErr = pairs.map { case (qv, nv) =>
      math.abs(adc(qv, encode(nv, rawCbS), rawCbS) - sqd(qv, nv))
    }.sum / pairs.size
    val resErr = pairs.map { case (qv, nv) =>
      val cv = cents.find(_._1 == cellOf(nv)).get._2
      val qres = qv.zip(cv).map { case (a, b) => a - b }
      math.abs(adc(qres, encode(resOf(nv), resCbS), resCbS) -
        sqd(qres, resOf(nv)))
    }.sum / pairs.size
    assert(resErr < rawErr,
      f"residual distortion $resErr%.4f should beat raw $rawErr%.4f")
  }
}

package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class Bm25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark query spark engine fast"),
    (2L, "spark slow"),
    (3L, "vector store and vector index"),
    (4L, "nothing relevant at all here"),
    (5L, "query query query"))

  /** Plain-Scala replica of Bm25.topK's exact float-op sequence. */
  private def brute(terms: Seq[String], k1: Double = 1.2,
                    b: Double = 0.75): Map[Long, Double] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
    val n = corpus.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val df = terms.map(t => t -> toks.values.count(_.contains(t))).toMap
    toks.flatMap { case (id, ws) =>
      val score = terms.map { t =>
        val tf = ws.count(_ == t)
        if (tf == 0 || df(t) == 0) 0.0
        else {
          val idf = (n.toDouble - df(t) + 0.5) / (df(t).toDouble + 0.5)
          idf * (tf.toDouble * (k1 + 1.0)) /
            (tf.toDouble + k1 * ((1.0 - b) + b * ws.size.toDouble / avgdl))
        }
      }.reduce(_ + _)
      if (score == 0.0) None else Some(id -> score)
    }
  }

  test("scores are bit-identical to a plain-Scala replica of the formula") {
    val terms = Seq("spark", "query", "vector")
    val got = Bm25.topK(corpus.toDF("doc_id", "text"), "doc_id", "text",
      terms, k = 10).as[(Long, Double)].collect().toMap
    assert(got === brute(terms))
  }

  test("single-term ranking is by tf for equal-length docs") {
    val docs = Seq((1L, "x a b"), (2L, "x x b"), (3L, "x x x"))
      .toDF("doc_id", "text")
    val r = Bm25.topK(docs, "doc_id", "text", Seq("x"), k = 3)
      .as[(Long, Double)].collect()
    assert(r.map(_._1).toSeq === Seq(3L, 2L, 1L))
    assert(r(0)._2 > r(1)._2 && r(1)._2 > r(2)._2)
  }

  test("docs without any query term are absent; k caps the output") {
    val top1 = Bm25.topK(corpus.toDF("doc_id", "text"), "doc_id", "text",
      Seq("spark"), k = 1).as[(Long, Double)].collect()
    assert(top1.length === 1)
    val all = Bm25.topK(corpus.toDF("doc_id", "text"), "doc_id", "text",
      Seq("spark", "query", "vector"), k = 100)
      .as[(Long, Double)].collect()
    assert(!all.map(_._1).contains(4L))
  }

  test("result is deterministic under repartitioning") {
    val df = corpus.toDF("doc_id", "text")
    val a = Bm25.topK(df, "doc_id", "text", Seq("spark", "query"), k = 5)
      .as[(Long, Double)].collect().toSeq
    val b = Bm25.topK(df.repartition(7), "doc_id", "text",
      Seq("spark", "query"), k = 5).as[(Long, Double)].collect().toSeq
    assert(a === b)
  }
}

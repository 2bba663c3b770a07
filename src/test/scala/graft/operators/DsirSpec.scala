package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** DSIR importance resampling: model/score values against an
  * independent in-JVM replica of the construction math (md5 buckets,
  * bit-length log-odds), and the exact shift-key resample against a
  * brute-force rational priority comparison.
  */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val B = 16

  // ---- independent replica of the operator's construction math ----------

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bucket(gram: String): Long =
    java.lang.Long.parseLong(md5hex("d:" + gram).substring(0, 4), 16) % B

  private def grams(text: String): Seq[String] = {
    val w = text.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
    w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  private def bl(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)

  private val corpus = Seq(
    (1L, "the cat sat on the mat", "en", "a"),
    (2L, "the dog ate the cat food", "en", "a"),
    (3L, "le chat est sur le tapis", "fr", "a"),
    (4L, "der hund frisst das futter", "de", "b"),
    (5L, "the the the the", "en", "b"),
    (6L, "cat", "fr", "b"),
    (7L, "", "en", "b"))

  private def replicaModel: Map[Long, Long] = {
    val rows = corpus.flatMap { case (_, t, lang, _) =>
      grams(t).map(g => (lang == "en", bucket(g)))
    }
    val nt = rows.count(_._1).toLong
    val nr = rows.size.toLong
    rows.groupBy(_._2).map { case (b, g) =>
      val ctt = g.count(_._1).toLong
      val ctr = g.size.toLong
      b -> (bl(ctt + 1) - bl(ctr + 1) - bl(nt + B) + bl(nr + B))
    }
  }

  private def replicaScores: Map[Long, (Long, Long)] = {
    val m = replicaModel
    corpus.flatMap { case (id, t, _, _) =>
      val gs = grams(t)
      if (gs.isEmpty) None
      else Some(id -> (gs.size.toLong, gs.map(g => m(bucket(g))).sum))
    }.toMap
  }

  private def df = corpus.toDF("doc_id", "text", "lang", "source")
  private def toks = filter(split(lower(col("text")), " "),
    w => length(w) > 0)

  test("model weights equal the bit-length log-odds replica") {
    val got = Dsir.model(df, toks, col("lang") === "en", B)
      .as[(Long, Long)].collect().toMap
    assert(got === replicaModel)
    assert(got.size <= B)
  }

  test("scores equal the replica; token-less docs are absent") {
    val m = Dsir.model(df, toks, col("lang") === "en", B)
    val got = Dsir.scores(df, "doc_id", toks, m, B)
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, s) => id -> (n, s) }.toMap
    assert(got === replicaScores)
    assert(!got.contains(7L)) // empty text: no features, not scorable
    // n_grams = 2*tokens - 1 for multi-token docs
    assert(got(1L)._1 === 11L && got(6L)._1 === 1L)
  }

  test("resample equals brute-force rational priority within the band") {
    val m = Dsir.model(df, toks, col("lang") === "en", B)
    val scored = Dsir.scores(df, "doc_id", toks, m, B)
      .join(df.select(col("doc_id"), col("source")), Seq("doc_id"))
    val got = Dsir.resample(scored, "source", "doc_id", k = 2, band = 40)
      .select(col("source"), col("doc_id")).as[(String, Long)]
      .collect().toSet

    def u16(id: Long): Long =
      java.lang.Long.parseLong(md5hex("r:" + id).substring(0, 4), 16)
    val rep = replicaScores.toSeq.map { case (id, (_, s)) =>
      val src = corpus.find(_._1 == id).get._4
      (src, id, s)
    }
    val expect = rep.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      val smax = rows.map(_._3).max
      rows.map { case (_, id, s) =>
        val sh = math.min(smax - s, 40L).toInt
        (src, id, (BigInt(u16(id)) + 1) << sh)
      }.sortBy { case (_, id, key) => (key, id) }.take(2)
        .map(r => (src, r._2))
    }.toSet
    assert(got === expect)
    assert(got.size === 4) // 2 strata x k=2
  }

  test("band clamp floors the key tier for far-below-max scores") {
    // stratum max dominated by one doc; a doc `band`+Δ bits below it
    // must get the same shift as one exactly `band` below
    val scored = Seq(
      (1L, "x", 100L), (2L, "x", 100L - 46L), (3L, "x", 100L - 200L))
      .toDF("doc_id", "source", "score_bits")
    // with band=4: shifts are 0, 4, 4 — doc 3 not shifted further
    val keep = Dsir.resample(scored, "source", "doc_id", k = 3, band = 4)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(keep === Set(1L, 2L, 3L)) // k covers all: clamp can't drop rows
  }

  test("staged featureRows path equals the direct path exactly") {
    val rows = Dsir.featureRows(df, "doc_id", toks,
      col("lang") === "en", B)
    val mDirect = Dsir.model(df, toks, col("lang") === "en", B)
      .as[(Long, Long)].collect().toMap
    val mRows = Dsir.modelFromRows(rows, B)
      .as[(Long, Long)].collect().toMap
    assert(mRows === mDirect)
    val sDirect = Dsir.scores(df, "doc_id", toks,
        Dsir.model(df, toks, col("lang") === "en", B), B)
      .as[(Long, Long, Long)].collect().toSet
    val sRows = Dsir.scoresFromRows(rows, "doc_id",
        Dsir.modelFromRows(rows, B))
      .as[(Long, Long, Long)].collect().toSet
    assert(sRows === sDirect)
  }

  test("parameter validation") {
    val d = df
    intercept[IllegalArgumentException](Dsir.model(d, toks, lit(true), 1))
    intercept[IllegalArgumentException](
      Dsir.resample(d.withColumn("score_bits", lit(0L)), "source",
        "doc_id", k = 0))
    intercept[IllegalArgumentException](
      Dsir.resample(d.withColumn("score_bits", lit(0L)), "source",
        "doc_id", k = 1, band = 47))
  }
}

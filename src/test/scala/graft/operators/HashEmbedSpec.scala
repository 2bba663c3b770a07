package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[Similarity.hashEmbed]] — the feature-hashing text embedder —
  * against an independent JVM-side replay of its construction (md5
  * token hash → bucket/sign → signed tf sums), plus its contract
  * edges: zero-shuffle plan, empty-doc zero vector, tf (not set)
  * semantics, and dims parameterization.
  */
class HashEmbedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent replay: first 12 md5 hex chars as a long, bucket =
    * h % dims, sign = bit 47 → ±1, summed per bucket over token
    * OCCURRENCES of lower(text) split on single spaces.
    */
  private def expected(text: String, dims: Int): Seq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val acc = Array.fill(dims)(0.0)
    text.toLowerCase.split(" ").filter(_.nonEmpty).foreach { w =>
      val hex = md.digest(w.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val h = java.lang.Long.parseLong(hex, 16)
      val s = if (((h >> 47) & 1L) == 1L) 1.0 else -1.0
      acc((h % dims).toInt) += s
    }
    acc.toSeq
  }

  private def embed(texts: Seq[String], dims: Int): Map[Long, Seq[Double]] =
    Similarity.hashEmbed(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"), dims = dims)
      .as[(Long, Seq[Double])].collect().toMap

  test("embedding matches the independent md5 replay, dims 64 and 16") {
    val texts = Seq("the quick brown fox", "The THE the",
      "one two three four five six seven eight nine ten")
    for (dims <- Seq(16, 64)) {
      val got = embed(texts, dims)
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) === expected(t, dims), s"dims=$dims doc=$i")
      }
    }
  }

  test("term frequency, not token set: repeated tokens accumulate") {
    val one = embed(Seq("alpha"), 8)(0L)
    val three = embed(Seq("alpha alpha alpha"), 8)(0L)
    assert(three === one.map(_ * 3))
    assert(one.map(math.abs).sum === 1.0)
  }

  test("empty and whitespace-only docs embed to the zero vector") {
    val got = embed(Seq("", "   "), 8)
    assert(got(0L) === Seq.fill(8)(0.0))
    assert(got(1L) === Seq.fill(8)(0.0))
  }

  test("the embed is one map-side projection: no Exchange in the plan") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Similarity.hashEmbed(docs, dims = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("hash-embedded corpus flows through the ANN stack end to end") {
    // 40 docs, queries = ids % 10 == 0, centroids = first 4: the
    // staged-index serve must equal the inline multiprobe search
    val docs = (0L until 40L)
      .map(i => (i, s"tok${i % 7} tok${i % 11} tok${i % 13} t$i"))
      .toDF("doc_id", "text")
    val he = Similarity.hashEmbed(docs, dims = 32).cache()
    val cents = he.filter(col("doc_id") < 4)
    val qs = he.filter(col("doc_id") % 10 === 0)
    val inline = Similarity.ivfMultiprobeKnn(he, qs, cents, k = 3,
      nprobe = 2, idCol = "doc_id")
    val idx = Similarity.indexCells(he, cents, idCol = "doc_id")
    val served = Similarity.ivfMultiprobeKnnIndexed(idx, qs, cents,
      k = 3, nprobe = 2, idCol = "doc_id")
    val a = inline.orderBy("q_id", "rnk")
      .as[(Long, Long, Int, Double)].collect().toSeq
    val b = served.orderBy("q_id", "rnk")
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(a.nonEmpty)
    assert(a === b)
    he.unpersist()
  }

  test("cell-partitioned staged index: the serve prunes cell dirs via DPP") {
    // the 100 TB index layout: stage partitioned on `cell`, and the
    // probe join's broadcast side reused as a dynamic partition filter
    // means a query batch reads its probe cells, not the whole index
    val docs = (0L until 200L)
      .map(i => (i, s"tok${i % 7} tok${i % 11} tok${i % 13} t$i"))
      .toDF("doc_id", "text")
    val he = Similarity.hashEmbed(docs, dims = 32).cache()
    val cents = he.filter(col("doc_id") < 4)
    val qs = he.filter(col("doc_id") % 50 === 0)
    val idx = Similarity.indexCells(he, cents, idCol = "doc_id")
    val tmp = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    idx.write.mode("overwrite").partitionBy("cell").parquet(tmp)
    val staged = spark.read.parquet(tmp)
    // partition-column round trip: cell comes back as the inferred
    // partition type (int), LAST in the schema — join-by-value intact
    assert(staged.schema.last.name === "cell")
    val served = Similarity.ivfMultiprobeKnnIndexed(staged, qs, cents,
      k = 3, nprobe = 2, idCol = "doc_id")
    val flat = Similarity.ivfMultiprobeKnnIndexed(idx, qs, cents,
      k = 3, nprobe = 2, idCol = "doc_id")
    val servedRows = served.orderBy("q_id", "rnk")
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(servedRows === flat.orderBy("q_id", "rnk")
      .as[(Long, Long, Int, Double)].collect().toSeq)
    // executedPlan only carries the inserted DPP subquery once the
    // query ran (AQE finalizes the plan at execution)
    served.collect()
    val plan = served.queryExecution.executedPlan.toString
    // the probe side reused as the pruning subquery (the scan line's
    // own IN-subquery rendering is length-truncated, so pin the
    // subquery node and the pruning expression prefix)
    assert(plan.contains("SubqueryAdaptiveBroadcast dynamicpruning#"), plan)
    assert(plan.contains("dynamicpruningexpression(cast(cell"), plan)
    he.unpersist()
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ShardingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("epoch rank equals the single-sort reference; shards balanced ±1") {
    val ids = (0L until 503L)
    val df = ids.toDF("doc_id")
    val out = Sharding.epochShards(df, "doc_id", numShards = 7)
      .as[(Long, Long, Int)].collect()
    val wantOrder = ids.sortBy(id => (md5hex(s"epoch0:$id"), id))
    assert(out.sortBy(_._2).map(_._1).toSeq === wantOrder)
    // exact global rank: 0..n-1 with no gaps
    assert(out.map(_._2).sorted.toSeq === (0L until 503L))
    // shards contiguous in rank, sizes differ by at most one
    val sizes = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes.keySet === (0 until 7).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
    val byShard = out.groupBy(_._3).view
      .mapValues(rs => (rs.map(_._2).min, rs.map(_._2).max)).toMap
    for (s0 <- 0 until 6)
      assert(byShard(s0)._2 + 1 === byShard(s0 + 1)._1, s"shard $s0 boundary")
  }

  test("permutation is seed-dependent and parallelism-invariant") {
    val df = (0L until 200L).toDF("doc_id")
    def run(d: org.apache.spark.sql.DataFrame, seed: String) =
      Sharding.epochShards(d, "doc_id", 4, seed = seed)
        .as[(Long, Long, Int)].collect().sortBy(_._1).toSeq
    assert(run(df, "epoch0") === run(df.repartition(13), "epoch0"))
    assert(run(df, "epoch0") !== run(df, "epoch1"))
  }

  test("weight-balanced shards: token mass within one max-doc of even") {
    // heterogeneous weights: doc i weighs (i % 50) + 1
    val rows = (0L until 400L).map(i => (i, (i % 50) + 1))
    val df = rows.toDF("doc_id", "wt")
    val out = Sharding.epochShardsByWeight(df, "doc_id", col("wt"),
      numShards = 5).as[(Long, Long, Int)].collect()
    val wts = rows.toMap
    val total = wts.values.sum
    val byShard = out.groupBy(_._3).view
      .mapValues(_.map(r => wts(r._1)).sum).toMap
    assert(byShard.keySet === (0 until 5).toSet)
    // each shard's token mass within one max doc weight of total/S
    val ideal = total / 5.0
    byShard.values.foreach(w => assert(math.abs(w - ideal) <= 50.0,
      s"shard mass $w vs ideal $ideal"))
    // shards are contiguous along the epoch order
    val ordered = out.sortBy(_._2).map(_._3)
    assert(ordered.sameElements(ordered.sorted))
    // rank is the same permutation as the unweighted operator
    val plain = Sharding.epochShards(df.select("doc_id"), "doc_id", 5)
      .as[(Long, Long, Int)].collect().map(r => r._1 -> r._2).toMap
    out.foreach { case (id, rank, _) => assert(plain(id) === rank) }
  }

  test("zero-weight tail rows clamp into the last shard") {
    val df = Seq((1L, 5L), (2L, 0L), (3L, 7L), (4L, 0L))
      .toDF("doc_id", "wt")
    val out = Sharding.epochShardsByWeight(df, "doc_id", col("wt"), 3)
      .as[(Long, Long, Int)].collect()
    assert(out.map(_._3).forall(s => s >= 0 && s < 3))
    assert(out.map(_._2).sorted.toSeq === Seq(0L, 1L, 2L, 3L))
  }

  test("empty input yields an empty, well-typed frame") {
    val out = Sharding.epochShards(
      Seq.empty[Long].toDF("doc_id"), "doc_id", 3)
    assert(out.columns.toSeq === Seq("doc_id", "rank", "shard"))
    assert(out.count() === 0L)
  }
}

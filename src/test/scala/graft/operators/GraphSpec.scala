package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 3) =
    Graph.pagerank(edges.toDF("src", "dst"), iters)
      .select("node", "rank_units").as[(Long, Long)].collect().toMap

  test("symmetric ring: every node holds an equal share") {
    // 0→1→2→3→0 and the reverse direction: perfectly symmetric
    val fwd = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    val ring = fwd ++ fwd.map(_.swap)
    val r = ranks(ring)
    assert(r.values.toSet.size === 1) // identical units everywhere
    // ~1/4 of total mass each (integer truncation only)
    assert(math.abs(r(0L) - Graph.TotalMass / 4) < 100)
  }

  test("star: the hub outranks the spokes, spokes stay symmetric") {
    // spokes 1..4 all point at hub 0; hub points back at every spoke
    val star = (1L to 4L).flatMap(s => Seq((s, 0L), (0L, s)))
    val r = ranks(star)
    assert((1L to 4L).map(r).toSet.size === 1)
    assert(r(0L) > r(1L) * 2) // hub collects every spoke's full rank
  }

  test("dangling nodes keep the teleport base only") {
    // 1→2 and nothing out of 2: node 2's mass leaks each hop, so it
    // ends with base + damped share of 1's base
    val r = ranks(Seq((1L, 2L)))
    assert(r(1L) < r(2L))
    val base = ((Graph.TotalMass / 100) * 15) / 2
    assert(r(1L) === base) // nothing points at 1
  }

  test("deterministic under repartitioning and duplicate edges") {
    val edges = (1 to 200).map(i => ((i % 17).toLong, (i % 13).toLong))
      .filter(e => e._1 != e._2)
    val df = edges.toDF("src", "dst")
    def run(d: org.apache.spark.sql.DataFrame) =
      Graph.pagerank(d, iters = 3)
        .select("node", "rank_units").as[(Long, Long)].collect()
        .sortBy(_._1).toSeq
    assert(run(df) === run(df.repartition(11)))
    // parallel (duplicate) edges count once
    assert(run(df) === run(df.union(df)))
  }
}

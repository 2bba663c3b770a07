package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Iterative graph analytics over edge lists — the shapes a dedup /
  * link-analysis pipeline composes after candidate generation (the
  * near-dup graph's connected components live in
  * [[Dedup.clusterIds]]; this adds centrality).
  *
  * Determinism discipline: classic float PageRank folds double sums in
  * shuffle order — unverifiable across engines or even reruns. Here
  * rank mass is INTEGER units (parts per 10¹²): contributions are
  * integer DIV (truncation toward zero — identical in Spark's `DIV`
  * and DuckDB's `//` for the non-negative values used), sums are exact
  * BIGINT, so every iteration is bit-reproducible at any parallelism
  * and mirrors 1:1 into the SQL oracle. Truncation leaks ≤ outdeg−1
  * units per node per hop (≤ 10⁻⁹ of total mass here) — a
  * deterministic, documented bias, the price of exactness.
  *
  * Scale shape per iteration: one equi-join of edges to ranks on src
  * (broadcast-able while ranks ≪ edges; hash join otherwise, both
  * sides keyed identically) and one partial-aggregatable groupBy(dst)
  * — the standard distributed PageRank plan, all map-side combined.
  * Iterations unroll into one lineage; for many more rounds you would
  * checkpoint every few hops to cap plan depth.
  */
object Graph {

  val TotalMass: Long = 1000000000000L // 10^12 rank units

  /** PageRank over a directed edge list.
    *
    * @param edges (src, dst) rows; parallel edges count once
    * @param iters fixed iteration count (unrolled lineage)
    * @param dampingPct damping factor in percent (85 = the classic 0.85)
    * @return (node, rank_units, rank) — units are parts per 10¹²;
    *         dangling nodes keep receiving the teleport base and leak
    *         their own mass (the drop-dangling convention, documented)
    */
  def pagerank(edges: DataFrame, iters: Int, dampingPct: Int = 85,
               srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iters >= 1 && iters <= 10,
      s"iters must be in [1, 10] (unrolled lineage), got $iters")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0, 100], got $dampingPct")
    val e = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // n is one scalar — a broadcast-sized cross join keeps the whole
    // computation in the plan (no driver round-trip per iteration)
    val n = broadcast(nodes.agg(count(lit(1)).as("n")))
    val base = expr(s"(($TotalMass DIV 100) * ${100 - dampingPct}) DIV n")
    var ranks = nodes.crossJoin(n)
      .select(col("node"), expr(s"$TotalMass DIV n").as("r"))
    for (_ <- 0 until iters) {
      val contrib = e
        .join(ranks.select(col("node").as("src"), col("r")), "src")
        .join(outdeg, "src")
        .select(col("dst"), expr("r DIV deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
      ranks = nodes.crossJoin(n)
        .join(contrib.select(col("dst").as("node"), col("in_mass")),
          Seq("node"), "left")
        .select(col("node"),
          (base + expr(s"($dampingPct * coalesce(in_mass, 0)) DIV 100"))
            .cast(LongType).as("r"))
    }
    ranks.select(col("node"), col("r").as("rank_units"),
      (col("r").cast(DoubleType) / lit(TotalMass.toDouble)).as("rank"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007) — community
    * detection over an undirected edge list, made DETERMINISTIC: every
    * node starts labeled with itself; each round, every node
    * simultaneously adopts the most frequent label among its
    * NEIGHBORS, ties broken by the smallest label (count DESC, label
    * ASC — a total order, where the published algorithm breaks ties
    * randomly). Fixed `iters` rounds of unrolled lineage, like
    * [[pagerank]] — sync LP can oscillate on bipartite structure, so a
    * convergence loop would not even terminate; fixed-round semantics
    * are what an oracle can replay.
    *
    * Community detection is NOT connected components
    * (`Dedup.clusterIds`): label prop is density-sensitive — two
    * cliques joined by one bridge edge keep their own labels, where
    * components would merge them.
    *
    * Scale shape: each round is one equi-join of the edge list against
    * the label frame (both partitioned by the join key) + one
    * partial-aggregatable count + one per-node top-1 (WindowGroupLimit
    * keeps it a streaming rank, never a full sort of the count frame).
    * The edge list is persisted once and reused across rounds;
    * per-round state is one (node, label) row per node. At 1000
    * executors every round is 2 bounded shuffles of node-sized frames.
    */
  def labelPropagation(edges: DataFrame, iters: Int,
                       srcCol: String = "src", dstCol: String = "dst")
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(iters >= 1 && iters <= 6,
      s"iters must be in [1, 6] (unrolled lineage), got $iters")
    val e0 = edges.filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
    // symmetrize: every node appears as src, so src alone spans nodes
    val e = e0.union(e0.select(col("dst"), col("src")))
      .distinct().persist()
    val nodes = e.select(col("src").as("node")).distinct()
    var labels = nodes.select(col("node"), col("node").as("lbl"))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("ct").desc, col("lbl").asc)
    for (_ <- 0 until iters) {
      labels = e
        .join(labels.select(col("node").as("dst"), col("lbl")), "dst")
        .groupBy(col("src"), col("lbl")).agg(count(lit(1)).as("ct"))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select(col("src").as("node"), col("lbl"))
    }
    // e stays persisted for the plan's lifetime (it is read once per
    // round in the returned lineage — eager unpersist here would force
    // 4 recomputes at execution time; same convention as pagerank)
    labels.withColumnRenamed("lbl", "label")
  }
}

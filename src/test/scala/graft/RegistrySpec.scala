package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract is only as good as the registry: a query
  * without an oracle silently downgrades to a rows-only check, and an
  * oracle without a query is dead SQL the correctness report would
  * miscount. Keep them 1:1 by construction.
  */
class RegistrySpec extends AnyFunSuite {

  test("every driver query has an oracle and every oracle a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries missing oracles: ${q -- o}")
    assert((o -- q).isEmpty, s"oracles missing queries: ${o -- q}")
  }

  test("query names follow the family convention") {
    val pat = "^(q|r|d|m|s|t|v)\\d+[a-z]?(_[a-z0-9_]+)?$".r
    SparkEntry.queries.keys.foreach(k =>
      assert(pat.matches(k), s"unconventional query name: $k"))
  }

  test("no duplicate names across the family registries") {
    // Map concatenation silently keeps the last binding — a name
    // collision between two families would shadow a query and its
    // green row would lie about which operator passed
    val families = Seq(
      queries.Relational.queries, queries.RoutingOps.queries,
      queries.DedupOps.queries, queries.MultimodalOps.queries,
      queries.SeriesOps.queries, queries.TextOps.queries,
      queries.QcOps.queries, queries.VectorOps.queries,
      queries.CurateOps.queries)
    val all = families.flatMap(_.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(all.size === SparkEntry.queries.size)
  }
}

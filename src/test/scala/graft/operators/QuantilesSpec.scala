package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class QuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Plain-Scala percentile_disc: smallest element whose cumulative
    * count reaches ceil(q*n/1000).
    */
  private def disc(vs: Seq[Long], qPermille: Int): Long = {
    val sorted = vs.sorted
    val k = (qPermille.toLong * sorted.size + 999) / 1000
    sorted((k - 1).toInt.max(0))
  }

  // skewed, tie-heavy groups: a has heavy ties at 5, b is uniform,
  // c is a single value, d has two values split 9:1
  private val data: Seq[(String, Long)] =
    Seq.fill(7)(("a", 5L)) ++ Seq(("a", 1L), ("a", 9L), ("a", 9L)) ++
      (1L to 10L).map(v => ("b", v)) ++
      Seq(("c", 42L)) ++
      (Seq.fill(9)(("d", 100L)) :+ ("d", 1L))

  test("groupQuantiles matches the plain-Scala percentile_disc on every group") {
    val qs = Seq(1, 100, 250, 500, 750, 950, 1000)
    val got = Quantiles
      .groupQuantiles(data.toDF("g", "v"), "g", col("v"), qs)
      .collect().map(r => r.getString(0) -> r).toMap
    val byG = data.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    for ((g, vs) <- byG) {
      val row = got(g)
      assert(row.getLong(row.fieldIndex("n")) === vs.size.toLong)
      for (q <- qs)
        assert(row.getLong(row.fieldIndex(Quantiles.qName(q))) === disc(vs, q),
          s"group $g q=$q")
    }
  }

  test("q=1 permille selects the min, q=1000 the max") {
    val r = Quantiles
      .groupQuantiles(data.toDF("g", "v"), "g", col("v"), Seq(1, 1000))
      .filter(col("g") === "b").head()
    assert(r.getLong(r.fieldIndex("p1m")) === 1L)
    assert(r.getLong(r.fieldIndex("p100")) === 10L)
  }

  test("column naming: percent for multiples of 10 permille, else permille") {
    assert(Quantiles.qName(250) === "p25")
    assert(Quantiles.qName(1000) === "p100")
    assert(Quantiles.qName(995) === "p995m")
    assert(Quantiles.qName(1) === "p1m")
  }

  test("percentileGate keeps the boundary row and gates per group") {
    val out = Quantiles
      .percentileGate(data.toDF("g", "v"), "g", col("v"), qPermille = 500)
      .collect()
    val thrByG = Map("a" -> disc(data.filter(_._1 == "a").map(_._2), 500),
      "b" -> disc(data.filter(_._1 == "b").map(_._2), 500),
      "c" -> 42L, "d" -> 100L)
    for (r <- out) {
      val (g, v) = (r.getString(r.fieldIndex("g")), r.getLong(r.fieldIndex("v")))
      assert(r.getLong(r.fieldIndex("thr")) === thrByG(g))
      assert(r.getBoolean(r.fieldIndex("kept")) === (v >= thrByG(g)),
        s"row ($g, $v) thr=${thrByG(g)}")
    }
    // the boundary value itself is kept (>=, not >)
    val b5 = out.find(r => r.getString(0) == "b" && r.getLong(1) == 5L).get
    assert(b5.getBoolean(b5.fieldIndex("kept")))
  }

  test("weighted quantiles match a plain-Scala replica; weight=1 == unweighted") {
    // expand each (v, w) into w copies and take the discrete quantile
    def wdisc(vw: Seq[(Long, Long)], q: Int): Long =
      disc(vw.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }, q)
    val rows = Seq(("a", 10L, 3L), ("a", 20L, 1L), ("a", 30L, 6L),
      ("b", 1L, 1L), ("b", 2L, 0L), ("b", 5L, 9L))
    val got = Quantiles.groupQuantilesWeighted(
        rows.toDF("g", "v", "w"), "g", col("v"), col("w"), Seq(500, 950))
      .collect().map(r => r.getString(0) -> r).toMap
    for ((g, vw) <- rows.groupBy(_._1)) {
      val pairs = vw.map(t => (t._2, t._3))
      val row = got(g)
      assert(row.getLong(row.fieldIndex("n")) === pairs.map(_._2).sum)
      assert(row.getLong(row.fieldIndex("p50")) === wdisc(pairs, 500), s"$g p50")
      assert(row.getLong(row.fieldIndex("p95")) === wdisc(pairs, 950), s"$g p95")
    }
    // zero-weight value 2 in group b is never selected
    assert(got("b").getLong(got("b").fieldIndex("p50")) === 5L)
    // unit weights reproduce the unweighted operator exactly
    val uw = Quantiles.groupQuantilesWeighted(
        data.toDF("g", "v"), "g", col("v"), lit(1L), Seq(250, 750))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val plain = Quantiles.groupQuantiles(
        data.toDF("g", "v"), "g", col("v"), Seq(250, 750))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(uw === plain)
  }

  test("rejects empty, out-of-range, and duplicate fractions") {
    val df = data.toDF("g", "v")
    intercept[IllegalArgumentException](
      Quantiles.groupQuantiles(df, "g", col("v"), Seq.empty))
    intercept[IllegalArgumentException](
      Quantiles.groupQuantiles(df, "g", col("v"), Seq(0)))
    intercept[IllegalArgumentException](
      Quantiles.groupQuantiles(df, "g", col("v"), Seq(1001)))
    intercept[IllegalArgumentException](
      Quantiles.groupQuantiles(df, "g", col("v"), Seq(500, 500)))
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables
import graft.operators.Series

/** Time-series similarity over the `events` stream table: per-type
  * 2-hour volume segments → 4-segment PAA windows → grid-bucketed
  * similar-window pairs with exact integer L1 verify.
  */
object SeriesOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_series_similar" -> { (s, dir) =>
      Series.similarWindows(
        Series.volumeSketch(Tables.events(s, dir), keyCol = "event_type",
          tsCol = "ts", valueCol = "value"),
        widthCents = 10000L, maxL1Cents = 10000L)
    })

  // epoch_us // on non-negative longs ≡ Spark DIV; cents sums are
  // DECIMAL-exact; L1 is integer — bit-identical across engines
  def oracle: Map[String, String] = Map(
    "s1_series_similar" ->
      """WITH seg AS (
        |  SELECT event_type, epoch_us(ts)::BIGINT // 7200000000 AS seg,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |win AS (
        |  SELECT event_type, seg // 4 AS w,
        |    list(cents ORDER BY seg) AS v, count(*) AS n
        |  FROM seg GROUP BY 1, 2),
        |f AS (SELECT * FROM win WHERE n = 4)
        |SELECT a.event_type AS key_a, a.w AS w_a,
        |  b.event_type AS key_b, b.w AS w_b,
        |  abs(a.v[1]-b.v[1]) + abs(a.v[2]-b.v[2]) + abs(a.v[3]-b.v[3])
        |    + abs(a.v[4]-b.v[4]) AS l1
        |FROM f a JOIN f b
        |  ON a.v[1]//10000 = b.v[1]//10000 AND a.v[2]//10000 = b.v[2]//10000
        | AND a.v[3]//10000 = b.v[3]//10000 AND a.v[4]//10000 = b.v[4]//10000
        | AND (a.event_type < b.event_type
        |      OR (a.event_type = b.event_type AND a.w < b.w))
        |WHERE abs(a.v[1]-b.v[1]) + abs(a.v[2]-b.v[2]) + abs(a.v[3]-b.v[3])
        |    + abs(a.v[4]-b.v[4]) <= 10000""".stripMargin)
}

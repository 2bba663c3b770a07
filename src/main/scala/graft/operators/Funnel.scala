package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: for each key, the
  * earliest time each funnel stage was reached, where stage i counts
  * only at-or-after the key's stage-i−1 time (the product-analytics
  * "did the user view, then click, then purchase — and when" query;
  * the reference's payment funnel, `app/dwm/PaymentWideApp.java:77-85`,
  * is the 2-stage join special case of this).
  *
  * Relational formulation, not a per-key sort: stage 1 is a keyed MIN,
  * each later stage joins the (one-row-per-key) accumulator back to
  * that stage's events and takes a conditional MIN. Every join and
  * aggregate is keyed on the same column, so the whole chain runs in
  * one partitioning (AQE reuses the exchange); per-key cost is bounded
  * by that key's own event count, never a cross product. A
  * collect-and-sort-per-key formulation would bound state by the
  * noisiest key; this one partial-aggregates everything.
  *
  * A key missing stage 0 is absent from the output; a key stalling at
  * stage i carries nulls from stage i+1 on (`tus >= null` is null, so
  * the conditional MIN never fires — nulls propagate forward).
  */
object Funnel {

  /** @param stages event-type values in funnel order (≥ 1)
    * @return one row per key reaching stage 0: key, then one `<stage>_ts`
    *         µs-timestamp column per stage (null = never reached)
    */
  def firstReached(events: DataFrame, keyCol: String, tsCol: String,
                   typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size,
      s"funnel stages must be distinct (a repeated stage would emit " +
        s"duplicate <stage>_ts columns): $stages")
    val base = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("key"),
        expr(s"unix_micros(CAST($tsCol AS TIMESTAMP))").as("tus"),
        col(typeCol).as("typ"))
    var acc = base.filter(col("typ") === stages.head)
      .groupBy(col("key")).agg(min(col("tus")).as("t0"))
    stages.tail.zipWithIndex.foreach { case (stage, i) =>
      val prevCols = col("key") +: (0 to i).map(j => col(s"t$j"))
      val nxt = base.filter(col("typ") === stage)
        .select(col("key"), col("tus"))
      acc = acc.join(nxt, Seq("key"), "left")
        .groupBy(prevCols: _*)
        .agg(min(when(col("tus") >= col(s"t$i"), col("tus")))
          .as(s"t${i + 1}"))
    }
    acc.select(col("key").as(keyCol) +: stages.zipWithIndex.map {
      case (stage, i) => timestamp_micros(col(s"t$i")).as(s"${stage}_ts")
    }: _*)
  }
}

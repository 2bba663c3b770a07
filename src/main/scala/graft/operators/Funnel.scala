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
    val base = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("key"),
        expr(s"unix_micros(CAST($tsCol AS TIMESTAMP))").as("tus"),
        col(typeCol).as("typ"))
    stagedFold(base, Seq("key"), stages)
      .withColumnRenamed("key", keyCol)
  }

  /** Session-scoped funnel — the product-analytics refinement of
    * [[firstReached]]: conversion must complete WITHIN one session
    * (events closer than `gapMicros` per key), so a purchase three
    * weeks after the view no longer "converts". Sessionization is the
    * q18/q30 lag + running-sum pair over ONE (key) sort; the staged
    * fold then runs keyed by (key, session) — same exchange reuse, per
    *-session cost bounded by that session's events. Output: one row
    * per session reaching stage 0, with the 1-based session index
    * `sid` (deterministic, oracle-portable) and per-stage timestamps.
    */
  def sessionFunnel(events: DataFrame, keyCol: String, tsCol: String,
                    idCol: String, typeCol: String, stages: Seq[String],
                    gapMicros: Long = 14400000000L): DataFrame = {
    require(gapMicros > 0, s"gapMicros must be > 0, got $gapMicros")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("key")).orderBy(col("tus"), col("id"))
    val base = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("key"),
        expr(s"unix_micros(CAST($tsCol AS TIMESTAMP))").as("tus"),
        col(idCol).as("id"), col(typeCol).as("typ"))
      .withColumn("_ns",
        when(lag(col("tus"), 1).over(w).isNull ||
          col("tus") - lag(col("tus"), 1).over(w) >= gapMicros, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("_ns")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    stagedFold(base, Seq("key", "sid"), stages)
      .withColumnRenamed("key", keyCol)
  }

  /** The shared staged conditional-MIN fold, keyed by `keyCols`. */
  private def stagedFold(base: DataFrame, keyCols: Seq[String],
                         stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size,
      s"funnel stages must be distinct (a repeated stage would emit " +
        s"duplicate <stage>_ts columns): $stages")
    var acc = base.filter(col("typ") === stages.head)
      .groupBy(keyCols.map(col): _*).agg(min(col("tus")).as("t0"))
    stages.tail.zipWithIndex.foreach { case (stage, i) =>
      val prevCols = keyCols.map(col) ++ (0 to i).map(j => col(s"t$j"))
      val nxt = base.filter(col("typ") === stage)
        .select((keyCols :+ "tus").map(col): _*)
      acc = acc.join(nxt, keyCols, "left")
        .groupBy(prevCols: _*)
        .agg(min(when(col("tus") >= col(s"t$i"), col("tus")))
          .as(s"t${i + 1}"))
    }
    acc.select(keyCols.map(col) ++ stages.zipWithIndex.map {
      case (stage, i) => timestamp_micros(col(s"t$i")).as(s"${stage}_ts")
    }: _*)
  }
}

package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core session + IO helpers for the graft engine.
  *
  * Design notes (100 TB orientation):
  *  - All table access goes through [[Tables.load]] so the batch harness
  *    (parquet dirs) and a production deployment (catalog tables /
  *    streaming sources) share one entry point.
  *  - Sessions enable AQE (runtime re-plan, skew-join splitting) and a
  *    shuffle partition count sized for the local harness; on a real
  *    cluster `spark.sql.shuffle.partitions` scales with executor count
  *    and AQE coalesces small partitions.
  */
object Graft {

  /** Build the standard session for mains/tests. */
  def session(appName: String, cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Some testdata generations write events.parquet with
      // TIMESTAMP(NANOS), which Spark's reader rejects natively; this
      // flag reads such columns as nanos-since-epoch longs, and
      // Tables.events normalizes them (schema-dispatched, so µs-encoded
      // data is untouched).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Spread a compute-heavy fan-out's INPUT across the session's cores
    * when its scan is narrower than them (guide §2.5/§6 — r17).
    *
    * The pattern this fixes: a staged artifact is small ON DISK (one
    * parquet split), but the work built ON TOP of it — an exploding
    * Generate, a broadcast-join fan-out, a per-row vector fold — is
    * tens to thousands of times the scan bytes. Spark sizes the stage
    * by input splits, so the whole fan-out runs on one or two cores
    * while the rest idle. An explicit-N hash repartition on the key
    * moves the (tiny) input once and lets every downstream row of the
    * same stage run at full parallelism; explicit N keeps AQE's
    * byte-based coalescing (which cannot see the fan-out) from folding
    * the stage back together.
    *
    * Scale-adaptive by construction: N = `defaultParallelism` (total
    * executor cores on a cluster), and the repartition is SKIPPED
    * whenever the plan already has at least that many partitions — at
    * production scale the same artifact scan has hundreds of splits
    * and this is a no-op.
    *
    * Caveat: call it on exchange-free subtrees only (scans /
    * projections / generates over a staged table). `df.rdd` on such a
    * plan never triggers AQE stage execution, so partition counting
    * stays a pure planning step. Row content is untouched — only
    * placement changes, so any order-free downstream (joins, exact
    * aggregations) is bit-identical. ENFORCED structurally (r17
    * verdict #4): every optimized-plan node must be a narrow operator,
    * so a post-shuffle frame fails fast instead of eagerly
    * materializing AQE query stages and silently pinning a non-AQE
    * plan.
    */
  def fanout(df: DataFrame, keys: Column*): DataFrame =
    fanoutGauged(df, df, keys: _*)

  /** [[fanout]] with the partition probe taken from a separate `gauge`
    * frame — for inputs that already contain a broadcast join (probing
    * THEM would eagerly build the broadcast side during planning). A
    * broadcast join adds no exchange on the stream side, so gauging
    * the stream-side scan counts exactly the partitions the fan-out
    * stage will run with. `gauge` must be the exchange-free stream
    * subtree of `df`.
    */
  def fanoutGauged(df: DataFrame, gauge: DataFrame, keys: Column*)
      : DataFrame = {
    assertNarrow(gauge)
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (gauge.rdd.getNumPartitions >= par) df
    else if (keys.isEmpty) df.repartition(par)
    else df.repartition(par, keys: _*)
  }

  /** The fanout gauge contract: reject any plan that is not a chain of
    * narrow, shuffle-free operators over leaves. Planning-only (walks
    * the optimized logical plan, executes nothing).
    */
  private def assertNarrow(df: DataFrame): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical._
    df.queryExecution.optimizedPlan.foreach {
      case _: LeafNode | _: Project | _: Filter | _: Generate |
           _: Union | _: SubqueryAlias => ()
      case other => throw new IllegalArgumentException(
        "Graft.fanout gauge must be an exchange-free subtree " +
          s"(scan/project/filter/generate/union); found ${other.nodeName}" +
          " — probe the stream-side scan via fanoutGauged instead")
    }
  }

  /** Exact-decimal money column: cast a double to DECIMAL(18,2) so sums
    * are associative (order-independent) and hash-identical to the
    * DuckDB oracle regardless of partitioning / parallelism. The final
    * aggregate is cast back to double.
    */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-independent exact sum of a money column, surfaced as double. */
  def moneySum(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** FLOOR division of a BIGINT SQL expression by a positive constant
    * — all integer arithmetic, no double rounding anywhere. Spark's
    * `DIV` truncates toward zero while DuckDB's `//` floors, so a
    * plain `epoch DIV 86400000` day bucket diverges cross-engine for
    * pre-1970 timestamps (negative epochs); `(e − pmod(e, d)) DIV d`
    * floors on both (pmod is the non-negative remainder). Every
    * epoch→bucket site routes through this.
    *
    * Caveats: `e` must be DETERMINISTIC — it is interpolated twice
    * (once per side of the subtraction), so a nondeterministic
    * expression would evaluate to two different values. And the
    * subtraction overflows (aborting under Spark 4's ANSI default)
    * for `e` within `d` of Long.MinValue — unreachable for epoch
    * inputs (|epoch µs| < 2⁶³⁄10⁴), but not total over all longs.
    */
  def floorDivExpr(e: String, d: Long): Column = {
    require(d > 0, s"divisor must be positive, got $d")
    expr(s"(($e) - pmod(($e), ${d}L)) DIV ${d}L")
  }

  /** Castability guard: NaN/±Infinity AND finite values outside
    * DECIMAL(18,2)'s range (|x| ≥ 10¹⁶) → null BEFORE any decimal
    * cast. Under Spark 4's ANSI default the cast ABORTS on both
    * classes of input (it does not null them), so every operator
    * ingesting a raw double measurement routes through this — one
    * junk row must drop, not kill a 1000-executor job. Null input
    * stays null.
    */
  def finite(c: Column): Column =
    when(!isnan(c) && abs(c) < lit(1e16), c)

  /** HALF_UP integer cents of a raw double measurement, null for
    * null/non-finite input — the shared ingestion contract of the
    * series/drift/stats operators and their streaming twins.
    */
  def cents(c: Column): Column = (dec2(finite(c)) * 100).cast(LongType)
}

/** Uniform access to the harness tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Broadcast-sized dims: never a scan bottleneck, read directly. */
  private val dims = Set("region", "nation", "customer", "supplier", "part")

  /** Scan parallelism is bounded by parquet ROW GROUPS, and the
    * harness's landed files carry exactly one — so without
    * intervention every fact-table map phase (tokenize, shingle,
    * decode, hash) runs in a single task while 31 cores idle; a 600k-
    * row lineitem scan is one thread. Production fixes this once at
    * the bronze→silver boundary by rewriting landed files into
    * target-sized splittable files (the same layout step as
    * `Sinks.writeBucketed` / Z-order — see SCALING.md "Data layout");
    * here that rewrite is a content-keyed staged artifact: built once
    * per testdata generation, after which every query scans a
    * multi-file copy sized for local[32]. Dims skip it — they
    * broadcast whole.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val src = s"$dir/$name.parquet"
    if (dims(name)) spark.read.parquet(src)
    else Artifacts.table(spark,
      s"relayout|$name|p=32", Artifacts.fingerprint(dir))(
      spark.read.parquet(src).repartition(32))
  }

  /** The events stream table with `ts` normalized to a proper µs
    * timestamp, whichever physical encoding the parquet carries:
    *  - TIMESTAMP(MICROS): read natively, used as-is.
    *  - TIMESTAMP(NANOS): Spark's reader rejects it natively; with
    *    `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as a
    *    long of nanos-since-epoch, and `DIV 1000` truncates toward
    *    zero (all data is post-1970) — exactly DuckDB's ns→µs read
    *    behavior, so event-time comparisons hash-match the oracle.
    * Dispatching on the observed schema keeps every events consumer
    * working across testdata regenerations that flip the encoding.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      // TIMESTAMP_NTZ (isAdjustedToUTC=false) arrives as TimestampNTZType,
      // which unix_micros/window/etc. reject. The session timezone is
      // pinned to UTC, so casting reinterprets the same wall-clock as the
      // same instant — bit-identical µs, matching DuckDB's naive read.
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
}

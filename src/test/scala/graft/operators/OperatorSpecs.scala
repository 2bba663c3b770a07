package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextFunctions

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"),   // near dup of 1
    (4L, "completely different content about spark engines")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts under the min id") {
    val out = Dedup.exact(docs).as[(String, Long, Long)].collect()
      .map { case (_, keeper, ct) => (keeper, ct) }.toSet
    assert(out === Set((1L, 2L), (3L, 1L), (4L, 1L)))
  }

  test("normalized dedup unifies case/punct/whitespace variants only") {
    val df = Seq(
      (1L, "The quick,  brown FOX!"),
      (2L, "the quick brown fox"),      // normalized dup of 1
      (3L, "the  quick...brown --- fox"), // normalized dup of 1
      (4L, "the quick brown foxes"),    // NOT a dup (different token)
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Dedup.exactNormalized(df)
      .as[(String, Long, Long)].collect()
      .map { case (_, keeper, ct) => (keeper, ct) }.toSet
    // byte-exact dedup would find NO groups here
    assert(Dedup.exact(df).as[(String, Long, Long)].collect()
      .forall(_._3 == 1L))
    assert(out === Set((1L, 3L), (4L, 1L), (5L, 1L)))
  }

  test("LSH candidates include the exact pair; near pair found by jaccard") {
    val cand = Dedup.candidatePairs(docs).as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 2L)))
    val near = Dedup.nearDupPairs(docs, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(near.contains((1L, 2L)))
    assert(!near.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("maxBucket excludes degenerate buckets from candidate generation") {
    // 40 identical boilerplate docs form one giant bucket; two distinct
    // near-dup docs form a small one
    val degenerate = (10L to 49L).map(i => (i, "repeated boilerplate text block"))
    val all = (degenerate ++ Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"))).toDF("doc_id", "text")
    val uncapped = Dedup.candidatePairs(all).as[(Long, Long)].collect().toSet
    assert(uncapped.contains((1L, 2L)))
    assert(uncapped.count(p => p._1 >= 10L) === 40 * 39 / 2) // quadratic
    val capped = Dedup.candidatePairs(all, maxBucket = 10)
      .as[(Long, Long)].collect().toSet
    assert(capped === Set((1L, 2L))) // giant bucket dropped, small kept
  }

  test("streaming exact dedup drops within-watermark duplicates across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val base = 1620043200000L
    val input = MemoryStream[(Long, String, Long)]
    val stream = Dedup.exactStreaming(
      input.toDF().toDF("doc_id", "text", "ts")
        .withColumn("event_time", timestamp_millis(col("ts")))
        .withWatermark("event_time", "10 seconds"))
    val query = stream.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()
    try {
      input.addData((1L, "same text", base))
      query.processAllAvailable()
      // duplicate in a LATER batch, within the watermark delay → dropped
      input.addData((2L, "same text", base + 3000), (3L, "other", base + 3000))
      query.processAllAvailable()
      val out = spark.table("dedup_out").select("keeper_id")
        .as[Long].collect().toSet
      assert(out === Set(1L, 3L))
    } finally query.stop()
  }

  test("streaming near-dup finds cross-batch candidates via the bucket index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val indexDir = java.nio.file.Files
      .createTempDirectory("lsh_index").toString + "/idx"
    val found = scala.collection.mutable.Set[(Long, Long)]()
    val input = MemoryStream[(Long, String)]
    val query = Dedup.streamingCandidatePairs(
        input.toDF().toDF("doc_id", "text"), indexDir,
        (_, pairs) => found ++= pairs.as[(Long, Long)].collect())
      .start()
    try {
      input.addData((1L, "the quick brown fox jumps over the lazy dog"),
        (10L, "completely different content about spark engines"))
      query.processAllAvailable()
      assert(found.isEmpty) // nothing similar within batch 1
      // batch 2: exact text of doc 1 arrives → cross-batch candidate
      input.addData((2L, "the quick brown fox jumps over the lazy dog"))
      query.processAllAvailable()
      assert(found.toSet === Set((1L, 2L)))
    } finally query.stop()
  }

  test("index compaction folds committed batches, survives restart") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("lsh_compact").toString
    val indexDir = s"$base/idx"
    val ckpt = s"$base/ckpt"
    val found = scala.collection.mutable.Set[(Long, Long)]()
    val input = MemoryStream[(Long, String)]
    def startQuery() = Dedup.streamingCandidatePairs(
        input.toDF().toDF("doc_id", "text"), indexDir,
        (_, pairs) => found ++= pairs.as[(Long, Long)].collect())
      .option("checkpointLocation", ckpt).start()
    val q1 = startQuery()
    try {
      input.addData((1L, "the quick brown fox jumps over the lazy dog"))
      q1.processAllAvailable()
      input.addData((10L, "completely different content about spark engines"))
      q1.processAllAvailable()
      input.addData((2L, "the quick brown fox jumps over the lazy dog"))
      q1.processAllAvailable()
      assert(found.toSet === Set((1L, 2L)))
    } finally q1.stop()
    def batchDirs() = new java.io.File(indexDir).listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).sorted.toSeq
    assert(batchDirs() === Seq("batch_id=0", "batch_id=1", "batch_id=2"))
    // batches 0+1 fold into batch_id=1; newest stays replayable
    assert(Dedup.compactIndex(spark, indexDir) === 1L)
    assert(batchDirs() === Seq("batch_id=1", "batch_id=2"))
    // re-compacting with nothing to merge is a no-op
    assert(Dedup.compactIndex(spark, indexDir) === -1L)
    // restart from the same checkpoint: a dup of doc 1 must still see
    // the whole (now partly compacted) history
    found.clear()
    val q2 = startQuery()
    try {
      input.addData((3L, "the quick brown fox jumps over the lazy dog"))
      q2.processAllAvailable()
      assert(found.toSet === Set((1L, 3L), (2L, 3L)))
    } finally q2.stop()
  }

  test("kmv sketch estimates distinct counts within theory bounds") {
    // 2000 distinct values, k=64 → relative std error ≈ 1/sqrt(k-2) ≈ 13%
    val df = (1 to 4000).map(i => ("g", s"value_${i % 2000}"))
      .toDF("source", "text")
    val row = Dedup.kmvDistinct(df, "source", "text", k = 64)
      .select("distinct_le_k", "kmv_estimate").collect().head
    assert(row.getLong(0) === 64L) // sketch holds exactly k hashes
    val est = row.getDouble(1)
    assert(est > 2000 * 0.6 && est < 2000 * 1.4, s"estimate $est")
    // below k the sketch is exact
    val small = Dedup.kmvDistinct(
      (1 to 10).map(i => ("g", s"v$i")).toDF("source", "text"),
      "source", "text", k = 64)
      .select("distinct_le_k", "kmv_estimate").collect().head
    assert(small.getLong(0) === 10L && small.isNullAt(1))
  }

  test("jaccard is exact on shingle sets") {
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    val a = sh.filter($"doc_id" === 1).select($"sh".as("sh_a"))
    val b = sh.filter($"doc_id" === 3).select($"sh".as("sh_b"))
    val j = a.crossJoin(b)
      .select(Dedup.jaccard(col("sh_a"), col("sh_b"))).as[Double].head()
    // 9 words → 7 shingles each, 6 shared → 6/8
    assert(j === 0.75)
  }

  test("simhash of identical docs is identical, differs for unrelated docs") {
    val sig = Dedup.simhash16(docs).as[(Long, Int)].collect().toMap
    assert(sig(1L) === sig(2L))
    assert(sig(1L) !== sig(4L))
  }

  test("clusterIds labels every component with its min reachable id") {
    // chain 1-2-3-4 (propagation depth > 1 exercises pointer jumping),
    // separate pair 10-11; orientation of input pairs is mixed
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L)
    // default (in-core union-find) and forced-distributed paths agree
    val inCore = Dedup.clusterIds(pairs).as[(Long, Long)].collect().toMap
    val dist = Dedup.clusterIds(pairs, localEdgeThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(inCore === expect)
    assert(dist === expect)
  }

  test("clusterIds matches union-find on a random pair graph") {
    val rnd = new scala.util.Random(42)
    val pairs = (1 to 60)
      .map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2).distinct
    // in-memory union-find with union-by-min: each root stays the min
    // of its set, so find(x) is the expected cluster id
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(n => n -> find(n)).toMap
    // exercise the DISTRIBUTED pointer-jumping path on the random graph
    val out = Dedup.clusterIds(pairs.toDF("doc_a", "doc_b"),
        localEdgeThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(out === expect)
  }

  test("snapshotDiff keys presence on the row, not content-key nullness") {
    // null-text rows have a null content key but still EXIST in their
    // snapshot — they must classify by id presence like any other row
    val oldV = Seq((1L, "same"), (2L, null), (3L, "was"), (4L, null))
      .toDF("doc_id", "text")
    val newV = Seq((1L, "same"), (2L, "now text"), (4L, null), (5L, "new"))
      .toDF("doc_id", "text")
    val out = Dedup.snapshotDiff(oldV, newV)
      .as[(Long, String)].collect().toMap
    assert(out === Map(
      1L -> "unchanged",
      2L -> "changed",   // null -> text: the id was present, not 'added'
      3L -> "removed",
      4L -> "unchanged", // null on both sides: same (absent) content
      5L -> "added"))
  }

  test("incrementalNew anti-joins history hashes, keeps null-text rows") {
    val ref = Seq((1L, "seen before"), (2L, "also seen")).toDF("doc_id", "text")
    val fresh = Seq((10L, "seen before"),     // in history → dropped
      (11L, "brand new"), (12L, "brand new"), // new, dup within batch
      (13L, null.asInstanceOf[String]))       // null text → null hash kept
      .toDF("doc_id", "text")
    val out = Dedup.incrementalNew(fresh, ref)
      .collect().map(r => (Option(r.get(0)), r.getLong(1), r.getLong(2)))
      .toSet
    assert(out.exists(t => t._1.nonEmpty && t._2 == 11L && t._3 == 2L))
    assert(out.exists(t => t._1.isEmpty && t._2 == 13L && t._3 == 1L))
    assert(out.size === 2)
  }

  test("clusterIds of no pairs is empty") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.clusterIds(empty).count() === 0L)
  }

  test("sourceOverlap: hand matrix; pre-capped rows equal the inline cap") {
    // 3-word docs -> one shingle each; srcA {s1, s2}, srcB {s1}, srcC
    // {s1, s3}: s1 is in all 3 sources, so a cap of 2 kills it
    val df = Seq(
      ("srcA", "a b c"), ("srcA", "x y z"),
      ("srcB", "a b c"),
      ("srcC", "a b c"), ("srcC", "p q r")).toDF("source", "text")
    def mat(out: org.apache.spark.sql.DataFrame) =
      out.select(col("src_a"), col("src_b"), col("inter_ct"),
          col("size_a"), col("overlap"))
        .as[(String, String, Long, Long, Double)].collect().toSet
    val uncapped = mat(Dedup.sourceOverlap(df))
    // every ordered pair intersects on exactly {s1}; sizes 2/1/2
    assert(uncapped === Set(
      ("srcA", "srcB", 1L, 2L, 0.5), ("srcA", "srcC", 1L, 2L, 0.5),
      ("srcB", "srcA", 1L, 1L, 1.0), ("srcB", "srcC", 1L, 1L, 1.0),
      ("srcC", "srcA", 1L, 2L, 0.5), ("srcC", "srcB", 1L, 2L, 0.5)))
    // cap 2: s1 (source-freq 3) leaves counts AND sizes -> no pairs
    val inline = mat(Dedup.sourceOverlap(df, maxSourceFreq = 2L))
    assert(inline.isEmpty)
    // the d21 staging contract: capping the rows BEFORE the call
    // (the staged-artifact path) equals capping inline
    val rows = Dedup.shingleRows(df, "source").distinct()
    val capped = rows.join(
      rows.groupBy(col("shingle")).agg(count(lit(1)).as("_sf"))
        .filter(col("_sf") <= 2).select("shingle"), "shingle")
      .select(rows.columns.toIndexedSeq.map(col): _*)
    assert(mat(Dedup.sourceOverlap(df, rows = Some(capped))) === inline)
  }
}

class FrequencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("heavyHitters is exact vs brute force under eviction pressure") {
    // ~200 distinct tokens vs k=9 counters → the sketch constantly
    // evicts; heavy tokens a (~30%) and b (~15%) must survive with
    // EXACT counts, everything at/below 10% must be absent
    val rnd = new scala.util.Random(7)
    val toks = Seq.fill(2000)(rnd.nextInt(100)).map {
      case i if i < 30 => "a"
      case i if i < 45 => "b"
      case _ => s"t${rnd.nextInt(200)}"
    }
    val out = Frequency
      .heavyHitters(toks.toDF("token").repartition(8), "token",
        k = 9, num = 1L, den = 10L)
      .as[(String, Long)].collect().toMap
    val n = toks.size
    val expect = toks.groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
      .filter(_._2 * 10L > n)
    assert(out === expect)
    assert(out.contains("a") && out.contains("b"))
  }

  test("heavyHitters ignores nulls and rejects sub-guarantee thresholds") {
    val df = Seq("x", null, "x", "y").toDF("token")
    val out = Frequency.heavyHitters(df, "token", k = 4, num = 1L, den = 2L)
      .as[(String, Long)].collect().toMap
    assert(out === Map("x" -> 2L)) // 2 of 3 non-null > 1/2
    intercept[IllegalArgumentException] {
      Frequency.heavyHitters(df, "token", k = 5, num = 1L, den = 10L)
    }
  }

  test("windowedHeavyHitters is exact per window under eviction pressure") {
    // 3 windows × (~150 distinct fillers vs k=9) → per-window sketches
    // evict constantly; each window's heavy tokens must come back with
    // exact counts and nothing at/below the threshold may appear
    val rnd = new scala.util.Random(13)
    val rows = (0 until 3).flatMap { w =>
      Seq.fill(1000)(rnd.nextInt(100)).map {
        case i if i < 25 => (w.toLong, s"hot$w") // per-window heavy token
        case _ => (w.toLong, s"t${rnd.nextInt(150)}")
      }
    }
    val out = Frequency
      .windowedHeavyHitters(rows.toDF("w", "token").repartition(8),
        windowCol = col("w"), valueCol = "token",
        k = 9, num = 1L, den = 10L)
      .as[(Long, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val expect = rows.groupBy(identity)
      .map { case ((w, t), xs) => (w, t) -> xs.size.toLong }
      .filter { case ((w, _), ct) =>
        ct * 10L > rows.count(_._1 == w).toLong
      }
    assert(out === expect)
    (0 until 3).foreach(w => assert(out.contains((w.toLong, s"hot$w"))))
  }

  test("MG merge keeps every value above the n/(k+1) guarantee") {
    val mg = new Frequency.MisraGries(3)
    // two partitions' worth of skew, merged: 40×h + 30 distinct fillers
    val p1 = (Seq.fill(20)("h") ++ (1 to 15).map(i => s"f$i"))
      .foldLeft(mg.zero)(mg.reduce)
    val p2 = (Seq.fill(20)("h") ++ (16 to 30).map(i => s"f$i"))
      .foldLeft(mg.zero)(mg.reduce)
    val merged = mg.merge(p1, p2)
    assert(merged.size <= 3)
    assert(merged.contains("h")) // 40/70 ≫ n/(k+1) = 17.5
    // count is within the guaranteed error band
    assert(merged("h") <= 40L && merged("h") >= 40L - 70L / 4L)
  }

  test("collocations: hand-computed lift, doc-bounded bigrams, min count") {
    val docs = Seq(
      (1L, "a b a b"),   // bigrams: (a,b)×2, (b,a)×1
      (2L, "b a"),       // (b,a)×1
      (3L, "c"),         // ends doc 3 …
      (4L, "d d"))       // … and (c,d) must NOT appear (doc boundary)
      .toDF("doc_id", "text")
    val out = Frequency.collocations(docs, "doc_id", "text",
        minCount = 2L, topK = 10)
      .select("w1", "w2", "cxy", "cx", "cy", "lift")
      .as[(String, String, Long, Long, Long, Double)].collect()
    // N = 9 tokens (a:3 b:3 c:1 d:2); B = 5 bigrams
    // lift(a,b) = 2·81 / (5·9) = 3.6; lift(b,a) = 2·81 / 45 = 3.6;
    // (d,d) has cxy=1 < minCount; (c,d) must be absent entirely
    assert(out.toSet === Set(
      ("a", "b", 2L, 3L, 3L, 2.0 * 9 * 9 / (5.0 * 3 * 3)),
      ("b", "a", 2L, 3L, 3L, 2.0 * 9 * 9 / (5.0 * 3 * 3))))
    // equal lift ties break by bigram string order
    assert(out.map(r => (r._1, r._2)).toSeq === Seq(("a", "b"), ("b", "a")))
  }
}

class SeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: Seq[(String, Long, Double)]) =
    rows.map { case (k, sec, v) =>
      (k, new java.sql.Timestamp(sec * 1000L), v)
    }.toDF("event_type", "ts", "value")

  test("volumeSketch builds ordered fixed-length windows, drops gaps") {
    // segments of 10s, windows of 2: key A fills segs 0,1 and 2,3;
    // key B misses seg 1 → its window 0 is dropped
    val rows = Seq(("A", 1L, 1.5), ("A", 5L, 2.0), ("A", 12L, 4.0),
      ("A", 21L, 8.0), ("A", 35L, 16.0), ("B", 2L, 1.0))
    val out = Series.volumeSketch(ev(rows), "event_type", "ts", "value",
        segMicros = 10000000L, segsPerWindow = 2)
      .as[(String, Long, Seq[Long])].collect().toSet
    assert(out === Set(("A", 0L, Seq(350L, 400L)),
      ("A", 1L, Seq(800L, 1600L))))
  }

  test("similarWindows pairs same-cell windows under the L1 bound") {
    val sketch = Seq(
      ("A", 0L, Seq(100L, 200L)), ("A", 5L, Seq(120L, 210L)), // near
      ("B", 0L, Seq(130L, 250L)),                             // cell-mate, far
      ("C", 0L, Seq(900L, 900L)))                             // other cell
      .toDF("series_key", "w", "v")
    val out = Series.similarWindows(sketch, widthCents = 500L,
        maxL1Cents = 40L)
      .as[(String, Long, String, Long, Long)].collect().toSet
    // A0–A5: |100-120|+|200-210| = 30 ≤ 40; A–B pairs exceed 40; C alone
    assert(out === Set(("A", 0L, "A", 5L, 30L)))
  }

  test("multiprobe finds the boundary-straddling pair single-probe misses") {
    // D and E straddle the 500-cell boundary in dim 0 (495 vs 505,
    // cells 0 vs 1) and are L1 = 12 apart — single-probe's blind spot
    val sketch = Seq(
      ("D", 0L, Seq(495L, 200L)), ("E", 0L, Seq(505L, 202L)),
      ("F", 0L, Seq(900L, 900L)))
      .toDF("series_key", "w", "v")
    val single = Series.similarWindows(sketch, widthCents = 500L,
      maxL1Cents = 40L).collect()
    assert(single.isEmpty)
    val multi = Series.similarWindowsMultiprobe(sketch, widthCents = 500L,
        maxL1Cents = 40L, dims = 2)
      .as[(String, Long, String, Long, Long)].collect().toSet
    assert(multi === Set(("D", 0L, "E", 0L, 12L)))
  }

  test("multiprobe at width >= maxL1 equals brute-force all-pairs") {
    // random sketch; the exact-recall contract says the grid must not
    // lose (or duplicate) any qualifying pair vs the O(n^2) join
    val rnd = new scala.util.Random(7)
    val sketch = (1 to 120).map(i =>
        (s"k${i % 25}", (i / 25).toLong, Seq.fill(3)(rnd.nextLong(2000))))
      .toDF("series_key", "w", "v")
    val brute = sketch.as("a").crossJoin(sketch.as("b"))
      .filter(expr("a.series_key < b.series_key OR " +
        "(a.series_key = b.series_key AND a.w < b.w)"))
      .withColumn("l1", expr(
        "aggregate(zip_with(a.v, b.v, (x, y) -> abs(x - y)), 0L, (a, d) -> a + d)"))
      .filter(col("l1") <= 700L)
      .select(expr("a.series_key"), expr("a.w"), expr("b.series_key"),
        expr("b.w"), col("l1"))
      .as[(String, Long, String, Long, Long)].collect().toSet
    val multi = Series.similarWindowsMultiprobe(sketch, widthCents = 700L,
        maxL1Cents = 700L, dims = 3)
      .as[(String, Long, String, Long, Long)].collect()
    assert(multi.length === multi.toSet.size) // no duplicated pairs
    assert(multi.toSet === brute)
  }

  test("resample forward-fills the grid from the last observation") {
    // step = 10s; A observes at 3s/15s/27s → grid instants 10s, 20s
    val rows = Seq(("A", 3L, 1.0), ("A", 15L, 2.0), ("A", 27L, 3.0))
    val out = Series.resample(ev(rows), "event_type", "ts", "value",
        stepMicros = 10000000L)
      .selectExpr("event_type", "unix_micros(grid_ts) DIV 1000000",
        "value", "unix_micros(obs_ts) DIV 1000000")
      .as[(String, Long, Double, Long)].collect().toSet
    assert(out === Set(("A", 10L, 1.0, 3L), ("A", 20L, 2.0, 15L)))
  }

  test("resample: equal-instant observation is visible; sub-step keys vanish") {
    val rows = Seq(
      ("B", 10L, 5.0), ("B", 20L, 7.0), // obs exactly on grid instants
      ("C", 13L, 9.0))                  // span inside one step: no grid
    val out = Series.resample(ev(rows), "event_type", "ts", "value",
        stepMicros = 10000000L)
      .selectExpr("event_type", "unix_micros(grid_ts) DIV 1000000", "value")
      .as[(String, Long, Double)].collect().toSet
    assert(out === Set(("B", 10L, 5.0), ("B", 20L, 7.0)))
  }

  test("resample resolves same-microsecond ties to the max value") {
    val rows = Seq(("D", 10L, 4.0), ("D", 10L, 9.0), ("D", 20L, 1.0))
    val out = Series.resample(ev(rows), "event_type", "ts", "value",
        stepMicros = 10000000L)
      .selectExpr("unix_micros(grid_ts) DIV 1000000", "value")
      .as[(Long, Double)].collect().toSet
    assert(out === Set((10L, 9.0), (20L, 1.0)))
  }
}

class CusumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("window formulation equals the textbook sequential fold") {
    // P − min(0, running-min P) must reproduce S_i = max(0, S_{i-1}+x_i)
    val rnd = new scala.util.Random(23)
    val rows = (1L to 300L).map(i =>
      ("k" + (i % 3), i, new java.sql.Timestamp(i * 1000),
        math.round(rnd.nextDouble() * 2000) / 100.0))
    val df = rows.toDF("k", "id", "ts", "v").repartition(7)
    val got = graft.operators.Series
      .cusum(df, "k", "ts", "id", "v", driftCents = 0L)
      .select($"k", $"id", $"cusum").as[(String, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    // driver-side replica in exact cents, same n-scaling
    rows.groupBy(_._1).foreach { case (k, g) =>
      val cents = g.sortBy(r => (r._3.getTime, r._2))
        .map(r => (r._2, math.round(r._4 * 100)))
      val n = cents.size.toLong
      val tot = cents.map(_._2).sum
      var s = 0L
      cents.foreach { case (id, c) =>
        s = math.max(0L, s + (n * c - tot))
        if (s > 0L) // driftCents=0 flags every strictly-positive point
          assert(got((k, id)) === s.toDouble / (n * 100.0), s"$k/$id")
        else assert(!got.contains((k, id)), s"$k/$id")
      }
    }
  }

  test("cusum is deterministic under repartitioning") {
    val df = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Series
        .cusum(d, "user_id", "ts", "event_id", "value", driftCents = 10000L)
        .select($"event_id", $"cusum").as[(Long, Double)]
        .collect().sortBy(_._1).toSeq
    assert(run(df) === run(df.repartition(11)))
  }
}

class EwmaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, Long, Double)]) =
    rows.map { case (k, sec, id, v) =>
      (k, id, new java.sql.Timestamp(sec * 1000L), v)
    }.toDF("user_id", "event_id", "ts", "value")

  test("ewma matches the closed-form weighted sum, ramp-up renormalized") {
    // horizon 2, alpha 1/2: weights (2, 1) over (current, previous)
    val rows = Seq((1L, 1L, 1L, 1.0), (1L, 2L, 2L, 4.0), (1L, 3L, 3L, 10.0))
    val out = Series.ewma(ev(rows), keyCol = "user_id",
        idCol = "event_id", tsCol = "ts", valueCol = "value", horizon = 2)
      .select("id", "ewma").as[(Long, Double)].collect().toMap
    assert(out(1L) === 1.0)              // ramp-up: only itself
    assert(out(2L) === (2 * 4.0 + 1.0) / 3.0)
    assert(out(3L) === (2 * 10.0 + 4.0) / 3.0)
  }

  test("ewma is deterministic under repartitioning") {
    val rows = (1 to 300).map(i =>
      ((i % 5).toLong, i.toLong, i.toLong, i * 0.37))
    def run(d: org.apache.spark.sql.DataFrame) =
      Series.ewma(d, "user_id", "event_id", "ts", "value")
        .select("id", "ewma").as[(Long, Double)].collect()
        .sortBy(_._1).toSeq
    val df = ev(rows)
    assert(run(df) === run(df.repartition(17)))
  }

  test("ewma fails fast on magnitudes that would overflow the fold") {
    // |cents| above Long.MaxValue >> horizon would wrap in the
    // weighted sum — the guard must raise, not emit garbage
    // 1e13 dollars fits DECIMAL(18,2) (so the cast succeeds) but its
    // 1e15 cents exceed Long.MaxValue >> 16 ≈ 1.4e14 — the guard's zone
    val huge = Seq((1L, 1L, 1L, 1.0e13))
    val err = intercept[Exception] {
      Series.ewma(ev(huge), "user_id", "event_id", "ts", "value")
        .collect()
    }
    assert(err.getMessage.contains("ewma") ||
      err.getCause != null && err.getCause.getMessage.contains("ewma"))
  }

  test("ewma drops rows outside DECIMAL(18,2) range instead of aborting") {
    // 1e17 is finite but uncastable: under ANSI the raw cast would
    // abort; Graft.finite nulls it and the row must simply vanish
    val rows = Seq((1L, 1L, 1L, 1.0e17), (1L, 2L, 2L, 2.0))
    val out = Series.ewma(ev(rows), "user_id", "event_id", "ts", "value")
      .select("id", "ewma").as[(Long, Double)].collect().toMap
    assert(out === Map(2L -> 2.0))
  }

  test("ewma weights decay by halves across a full horizon") {
    // constant series: ewma == the constant at every row regardless of
    // how many lags are present (weights renormalize)
    val rows = (1 to 40).map(i => (9L, i.toLong, i.toLong, 2.5))
    val out = Series.ewma(ev(rows), "user_id", "event_id", "ts", "value")
      .select("ewma").as[Double].collect()
    assert(out.forall(_ === 2.5))
  }
}

class CorpusPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("curate annotates every stage's decision and packs only keepers") {
    val docs = Seq(
      (1L, "the cat is out of the bag and the dog is in the house today"),
      (2L, "the cat is out of the bag and the dog is in the house today"),
      (3L, "the cat is out of the bag and the dog is in the house today extra"),
      (4L, ""),
      (5L, "zz"),
      (6L, "a completely different note about the spark engine and the " +
        "catalyst optimizer running the plan of the day")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.curate(docs,
        CorpusPipeline.Config(minQuality = 0.3, jaccard = 0.5))
      .select("doc_id", "drop_reason", "cluster_id", "split", "chunk_id")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          Option(r.get(4)))).toMap
    assert(out(1)._1 === None)                 // cluster representative
    assert(out(2)._1 === Some("exact_dup"))    // identical text, higher id
    assert(out(3)._1 === Some("near_dup"))     // same cluster as 1
    assert(out(4)._1 === Some("empty"))
    assert(out(5)._1 === Some("quality"))
    assert(out(6)._1 === None)
    // kept rows carry split + chunk; dropped rows carry neither
    Seq(1L, 6L).foreach { id =>
      assert(out(id)._3.nonEmpty && out(id)._4.nonEmpty, s"doc $id")
    }
    Seq(2L, 3L, 4L, 5L).foreach { id =>
      assert(out(id)._3.isEmpty && out(id)._4.isEmpty, s"doc $id")
    }
    // docs 1 and 3 share a cluster labeled by the min id
    assert(out(1)._2 === Some(1L) && out(3)._2 === Some(1L))
  }

  test("attrition accounts for every row exactly once") {
    val docs = (1L to 40L).map(i => (i,
      if (i % 7 == 0) "short" else
        s"the quick document number $i is about the data of the day and " +
          "the state of the art")).toDF("doc_id", "text")
    val curated = CorpusPipeline.curate(docs)
    val att = CorpusPipeline.attrition(curated)
      .as[(String, Long, Long)].collect()
    assert(att.map(_._2).sum === 40L)
    assert(att.map(_._1).distinct.length === att.length)
  }

  test("optional QC gates annotate their own drop reasons") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),      // top bigram covers all
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "alpha beta gamma delta"),              // its 1 gram is shared
      (4L, "alpha beta gamma delta iota kappa lambda mu"), // 1 of 5 shared
      (5L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "quick brown fox jumps")).toDF("doc_id", "text")
    val out = CorpusPipeline.curate(docs, CorpusPipeline.Config(
        minQuality = 0.0, jaccard = 0.99,
        maxTopBigramFrac = Some(0.5), maxDupSpanFrac = Some(0.5),
        benchmark = Some(bench)))
      .select("doc_id", "drop_reason").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) === Some("repetition"))   // 5/5 bigram slots
    assert(out(2L) === Some("contaminated")) // shares the bench 4-gram
    assert(out(3L) === Some("dup_spans"))    // dup_frac 1.0 > 0.5
    assert(out(4L) === None)                 // dup_frac 0.2: kept
    assert(out(5L) === None)
    // helper flags never leak into the output schema
    val cols = CorpusPipeline.curate(docs).columns
    assert(!cols.exists(_.startsWith("_")))
  }

  test("span gate measures dedup survivors: one copy of a dup doc passes") {
    // docs 1/2 are exact duplicates; their grams appear nowhere else.
    // Measured pre-dedup both would see every gram in 2 docs
    // (dup_frac 1.0) and the whole cluster would drop as 'dup_spans' —
    // the keep-one-copy contract silently becoming keep-zero. Measured
    // over dedup survivors (RefinedWeb/Gopher ordering), doc 2 drops as
    // exact_dup and doc 1's grams are unique among survivors → kept.
    val docs = Seq(
      (1L, "epsilon zeta eta theta iota kappa lambda"),
      (2L, "epsilon zeta eta theta iota kappa lambda"),
      (3L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.curate(docs, CorpusPipeline.Config(
        minQuality = 0.0, jaccard = 0.99, maxDupSpanFrac = Some(0.5)))
      .select("doc_id", "drop_reason").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) === None)
    assert(out(2L) === Some("exact_dup"))
    assert(out(3L) === None)
  }

  test("round-12 gates: intradoc, NB, and ppl-tail fire in cascade order") {
    // doc 1: heavy within-doc chunk repetition (same 3-chunk 4×);
    // doc 2: pure negative-seed vocabulary (NB drops it);
    // doc 3: scrambled rare-word salad — highest bigram surprisal;
    // docs 4..9: seed-like filler so the model and the ppl quantile
    // have mass. Seed = ids >= 4 (the filler) plays the "target"
    // label, so docs 1-3 are the out-of-seed side.
    // rotations of one token cycle: distinct texts (no exact_dup),
    // near-identical bigram statistics (a flat ppl tier)
    val cyc = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    val filler = (4L to 9L).map { i =>
      val r = (i % 10).toInt
      (i, (cyc.drop(r) ++ cyc.take(r)).mkString(" "))
    }
    val docs = (Seq(
      (1L, "rep rep rep rep rep rep rep rep rep rep rep rep"),
      (2L, "junk spam junk spam junk spam junk spam junk spam"),
      (3L, "theta alpha zeta gamma beta delta eta epsilon beta alpha"))
      ++ filler).toDF("doc_id", "text")
    val out = CorpusPipeline.curate(docs, CorpusPipeline.Config(
        minQuality = 0.0,
        jaccard = 0.99, // the rotated fillers ARE near-dups at 0.5
        maxIntradocDupFrac = Some(0.5),
        nbSeed = Some(col("doc_id") >= 4L),
        minNbAvgBits = Some(-0.5),
        // 9 scored docs: ceil-rank p800 cuts at the 8th smallest ppm
        // (the filler tier), leaving only the salad doc above it —
        // p900 would select the max itself and nothing sits above
        pplTailCutPermille = Some(800)))
      .select("doc_id", "drop_reason").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) === Some("intradoc_rep")) // fires before nb/ppl
    assert(out(2L) === Some("nb_quality"))
    assert(out(3L) === Some("ppl_tail"))
    assert((4L to 9L).forall(out(_).isEmpty))
    // every gate off -> all kept (the t11 contract untouched)
    val off = CorpusPipeline.curate(docs,
        CorpusPipeline.Config(minQuality = 0.0, jaccard = 0.99))
      .filter(col("drop_reason").isNotNull).count()
    assert(off === 0L)
  }
}

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("packByBudget assigns exclusive-prefix-DIV-budget chunk ids") {
    // weights 600 each, budget 1000: exclusive prefixes 0,600,1200,
    // 1800,2400,3000 → chunks 0,0,1,1,2,3
    val df = (1L to 6L).map(i => (i, 600)).toDF("doc_id", "w")
    val out = Packing.packByBudget(df, "doc_id", col("w"), budget = 1000L)
      .select("doc_id", "chunk_id").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L,
      5L -> 2L, 6L -> 3L))
  }

  test("packByBudget matches the single-pass formulation on random data") {
    val rnd = new scala.util.Random(11)
    // sparse, non-contiguous ids; random weights incl. zeros and a null
    val rows = (1 to 500).map(i =>
      (i * 7L + rnd.nextInt(3), if (i == 250) null
      else Integer.valueOf(rnd.nextInt(200))))
      .distinctBy(_._1)
    val df = rows.toDF("doc_id", "w").repartition(13)
    val got = Packing
      .packByBudget(df, "doc_id", col("w"), budget = 1500L, shards = 17)
      .select("doc_id", "chunk_id").as[(Long, Long)].collect().toMap
    // in-memory reference: exclusive prefix over doc_id order
    var acc = 0L
    val expect = rows.sortBy(_._1).map { case (id, w) =>
      val c = acc / 1500L
      acc += Option(w).map(_.longValue).getOrElse(0L)
      id -> c
    }.toMap
    assert(got === expect)
  }

  test("packByBudget survives ids spanning the full Long range") {
    // hash-derived ids: span > Long.MaxValue would overflow a
    // (id - lo) / width scheme under ANSI; the shift sharding must not
    val rows = Seq((Long.MinValue + 5, 100), (-3L, 200), (0L, 300),
      (7L, 50), (Long.MaxValue - 11, 400))
    val got = Packing
      .packByBudget(rows.toDF("doc_id", "w"), "doc_id", col("w"),
        budget = 250L)
      .select("doc_id", "chunk_id").as[(Long, Long)].collect().toMap
    var acc = 0L
    val expect = rows.sortBy(_._1).map { case (id, w) =>
      val c = acc / 250L; acc += w; id -> c
    }.toMap
    assert(got === expect)
  }

  test("packByBudget null-id rows pass through with null chunk, no abort") {
    val mixed = Seq((java.lang.Long.valueOf(1L), 5),
      (null.asInstanceOf[java.lang.Long], 5),
      (java.lang.Long.valueOf(2L), 5)).toDF("doc_id", "w")
    val out = Packing.packByBudget(mixed, "doc_id", col("w"), 100L)
      .select("doc_id", "chunk_id")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    // null id → null chunk; its weight never shifts real rows' prefixes
    assert(out === Set((Some(1L), Some(0L)), (None, None),
      (Some(2L), Some(0L))))
    val empty = Seq.empty[(Long, Int)].toDF("doc_id", "w")
    assert(Packing.packByBudget(empty, "doc_id", col("w"), 100L)
      .count() === 0L)
  }
}

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f), 0),
    (2L, Array(0.0f, 1.0f), 1),
    (3L, Array(0.1f, 0.9f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("brute-force knn ranks by cosine") {
    val out = Similarity.bruteForceKnn(vecs, vecs.filter($"vec_id" === 0), k = 2)
      .select("n_id", "rnk").as[(Long, Int)].collect().toSet
    assert(out === Set((1L, 1), (3L, 2)))
  }

  test("mmr diversifies: the near-duplicate runner-up is demoted") {
    // query [1,0]; candidates: two near-copies of each other at high
    // relevance (1, 4) and one moderately relevant but diverse (5).
    // Plain top-2 = {1, 4}; at a diversity-weighted λ = 0.3 MMR's
    // step 2 must prefer the diverse 5 (score4 = .3·.9925 − .7·.9999
    // ≈ −.402 < score5 = .3·.7071 − .7·.7809 ≈ −.334)
    val vs = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f), 0),
      (4L, Array(0.89f, 0.11f), 0),
      (5L, Array(0.5f, 0.5f), 1)
    ).toDF("vec_id", "embedding", "label")
    val q = vs.filter($"vec_id" === 0)
    val plain = Similarity.bruteForceKnn(vs, q, k = 2)
      .select("n_id").as[Long].collect().toSet
    assert(plain === Set(1L, 4L))
    val mmr = Similarity.mmrSelect(vs, q, n = 3, k = 2, lambda = 0.3)
      .orderBy("step").select("step", "n_id").as[(Int, Long)].collect()
    assert(mmr.toSeq === Seq((1, 1L), (2, 5L)))
    // lambda = 1 degenerates to pure relevance = the plain top-k
    val rel = Similarity.mmrSelect(vs, q, n = 3, k = 2, lambda = 1.0)
      .select("n_id").as[Long].collect().toSet
    assert(rel === plain)
  }

  test("mmr emits exactly k steps per query, deterministically") {
    val out1 = Similarity.mmrSelect(vecs, vecs.filter($"vec_id" <= 1),
      n = 3, k = 3, lambda = 0.5).collect().map(_.toSeq).toSet
    val out2 = Similarity.mmrSelect(
      vecs.repartition(7), vecs.filter($"vec_id" <= 1),
      n = 3, k = 3, lambda = 0.5).collect().map(_.toSeq).toSet
    assert(out1 === out2)
    assert(out1.size === 6) // 2 queries x 3 steps
  }

  test("ivf knn only searches the query's cell") {
    val out = Similarity.ivfKnn(vecs, vecs.filter($"vec_id" === 0), k = 2)
      .select("n_id").as[Long].collect().toSet
    assert(out === Set(1L)) // only same-label candidates
  }

  test("lsh knn buckets by hyperplane signature and ranks within bucket") {
    // identical vectors always share a signature, so the near-copy of
    // vec 0 must surface; orthogonal vectors land elsewhere with high
    // probability but correctness only requires bucket-consistency
    val out = Similarity.lshKnn(vecs, vecs.filter($"vec_id" === 0),
        k = 2, dims = 2)
      .select("n_id", "rnk").as[(Long, Int)].collect().sortBy(_._2)
    assert(out.nonEmpty && out.head._1 === 1L) // nearest is the near-copy
    // signature determinism: same vector → same signature
    val planes = Similarity.hyperplanes(8, 2)
    val sigs = vecs.select(
      Similarity.lshSignature(col("embedding"), planes).as("s")).as[Long].collect()
    val sigs2 = vecs.select(
      Similarity.lshSignature(col("embedding"), planes).as("s")).as[Long].collect()
    assert(sigs.toSeq === sigs2.toSeq)
  }

  test("multiprobe ivf: probing every cell equals brute force; probe-1 can miss") {
    val centroids = vecs.filter($"vec_id".isin(0L, 2L))
    def run(nprobe: Int) =
      Similarity.ivfMultiprobeKnn(vecs, vecs.filter($"vec_id" === 1), centroids,
          k = 3, nprobe = nprobe)
        .select("n_id", "rnk").as[(Long, Int)].collect().toSet
    val brute = Similarity.bruteForceKnn(vecs, vecs.filter($"vec_id" === 1), k = 3)
      .select("n_id", "rnk").as[(Long, Int)].collect().toSet
    assert(run(2) === brute)
    // query 1 lives in cell 0: probe-1 sees only its cell-mates
    assert(run(1) === Set((0L, 1)))
  }

  test("probeCells: exactly nprobe distinct cells per query, top-1 = assignCells") {
    val centroids = vecs.filter($"vec_id".isin(0L, 2L))
    val p2 = Similarity.probeCells(vecs, centroids, nprobe = 2)
      .select("q_id", "q_cell").as[(Long, Long)].collect()
    assert(p2.groupBy(_._1).forall { case (_, rows) =>
      rows.length == 2 && rows.map(_._2).distinct.length == 2
    })
    // the probe-1 cell is the assignment cell for every vector
    val p1 = Similarity.probeCells(vecs, centroids, nprobe = 1)
      .select("q_id", "q_cell").as[(Long, Long)].collect().toMap
    val asg = Similarity.assignCells(vecs, centroids)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    assert(p1 === asg)
    intercept[IllegalArgumentException](
      Similarity.probeCells(vecs, centroids, nprobe = 0))
  }

  test("hard negatives are the nearest WRONG-label vectors, ranked") {
    // nearest overall to vec 0 is same-label vec 1 — it must be
    // excluded; the negatives are the other-label vectors by cosine
    val out = Similarity.hardNegatives(vecs, vecs.filter($"vec_id" === 0),
        k = 2)
      .select("n_id", "rnk").as[(Long, Int)].collect().toSet
    assert(out === Set((3L, 1), (2L, 2))) // (0.1,0.9) beats (0,1)
  }

  test("cell assignment picks the highest-cosine centroid, ties to lowest id") {
    val out = Similarity.assignCells(vecs, vecs.filter($"vec_id" < 2))
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    // centroid 0 = (1,0), centroid 1 = (0.9,0.1)
    assert(out(0L) === 0L) // exact self-match beats the near-copy
    assert(out(2L) === 1L) // (0,1) is closer to (0.9,0.1) than to (1,0)
    assert(out(3L) === 1L)
  }

  test("asof join takes the most recent right row at-or-before each left row") {
    val l = Seq((1L, "u1", 100L), (2L, "u1", 200L), (3L, "u1", 50L),
      (4L, "u2", 100L)).toDF("event_id", "user_id", "ts")
    val r = Seq(("u1", 100L, 7L), ("u1", 150L, 8L))
      .toDF("p_uid", "p_ts", "p_id")
    val out = Temporal.asofJoin(l, r, "user_id", "p_uid", "ts", "p_ts",
        Seq("p_id"))
      .select(col("event_id"), col("_asof.p_id"))
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(out(1L) === Some(7L)) // equal ts counts (at-or-before)
    assert(out(2L) === Some(8L)) // most recent of the two
    assert(out(3L) === None)     // nothing before → null
    assert(out(4L) === None)     // other key unaffected
  }

  test("asof join never matches null keys or null timestamps (SQL ASOF semantics)") {
    val l = Seq((1L, "u1", Some(100L)), (2L, "u1", None),
      (3L, null.asInstanceOf[String], Some(100L)))
      .toDF("event_id", "user_id", "opt_ts")
      .select(col("event_id"), col("user_id"), col("opt_ts").as("ts"))
    val r = Seq(("u1", Some(50L), 7L), ("u1", None, 8L),
      (null.asInstanceOf[String], Some(10L), 9L))
      .toDF("p_uid", "opt_ts", "p_id")
      .select(col("p_uid"), col("opt_ts").as("p_ts"), col("p_id"))
    val out = Temporal.asofJoin(l, r, "user_id", "p_uid", "ts", "p_ts",
        Seq("p_id"))
      .select(col("event_id"), col("_asof.p_id"))
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(out(1L) === Some(7L)) // the null-ts right row (id 8) is ignored
    assert(out(2L) === None)     // null left ts matches nothing
    assert(out(3L) === None)     // null left key matches nothing
  }

  test("range join matches containment exactly across bucket boundaries") {
    // build directly in micros via timestamp_micros for precision
    val p = Seq(1L, 999L, 1000L, 2500L, 9999L).toDF("us")
      .select(col("us"), timestamp_micros(col("us")).as("pt"))
    val iv = Seq((500L, 1500L, "a"), (2000L, 3000L, "b"))
      .toDF("s_us", "e_us", "tag")
      .select(col("tag"), timestamp_micros(col("s_us")).as("s"),
        timestamp_micros(col("e_us")).as("e"))
    // bucket width 1000µs: interval "a" [500,1500] spans two buckets
    val out = Temporal.rangeJoin(p, "pt", iv, "s", "e", bucketMicros = 1000L)
      .select(col("us"), col("tag")).as[(Long, String)].collect().toSet
    assert(out === Set((999L, "a"), (1000L, "a"), (2500L, "b")))
  }

  test("cosine of identical vectors is 1.0") {
    val c = vecs.filter($"vec_id" === 0)
      .select(Similarity.cosine(col("embedding"), col("embedding")))
      .as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("codegen VecDot is bit-identical to the HOF left-fold formulation") {
    val e = TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50)
    val hofDot = aggregate(
      zip_with(col("embedding"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val pairs = e.crossJoin(e.select(col("embedding").as("b")).limit(7))
    val diffs = pairs.select(
        (graft.functions.VecDot(col("embedding"), col("b")) - hofDot).as("d"))
      .filter(col("d") =!= 0.0).count()
    assert(diffs === 0)
  }

  test("native expressions are SQL-callable after extension registration") {
    // drive the REAL injection path (what spark.sql.extensions runs at
    // session build), not just the live-session temp registration
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftShim.applyInjectedFunctions(ext, spark)
    val r = spark.sql(
      """SELECT vec_dot(array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)),
        |               array(CAST(3.0 AS DOUBLE), CAST(4.0 AS DOUBLE))) AS d,
        |       rolling_hash('ab') AS h""".stripMargin)
      .as[(Double, Long)].head()
    assert(r._1 === 11.0)
    assert(r._2 === ('a'.toInt * 31L + 'b'.toInt) % 1000000007L)
    val r2 = spark.sql(
      """SELECT vec_sqdist(array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)),
        |                  array(CAST(3.0 AS DOUBLE), CAST(5.0 AS DOUBLE))) AS sq,
        |       veci8_dot(veci8_pack(array(1L, -2L, 3L)),
        |                 veci8_pack(array(4L, 5L, -6L))) AS qd""".stripMargin)
      .as[(Double, Long)].head()
    assert(r2._1 === 13.0)
    assert(r2._2 === (4L - 10L - 18L))
  }

  test("codegen RollingHash matches the HOF formulation incl. non-ASCII") {
    val docs = TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
      .union(Seq("", "héllo wörld", "汉字テスト", "mixed 汉 ascii").toDF("text"))
    val hof = aggregate(split(col("text"), ""), lit(0L),
      (acc, c) => (acc * lit(31L) + ascii(c)) % lit(1000000007L))
    val diffs = docs
      .select((graft.functions.RollingHash(col("text")) - hof).as("d"))
      .filter(col("d") =!= 0L).count()
    assert(diffs === 0)
  }
}

class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokenize drops empty tokens") {
    val out = Seq("a  b c").toDF("text")
      .select(TextFunctions.tokenize(col("text"))).as[Seq[String]].head()
    assert(out === Seq("a", "b", "c"))
  }

  test("langId picks the profile with most stopword hits") {
    val out = Seq(
      "the cat is out of the bag and gone",
      "el perro de la casa que ladra y los gatos",
      "zzz qqq www").toDF("text")
      .select(TextFunctions.langId(col("text"))).as[String].collect().toSeq
    assert(out === Seq("en", "es", "und"))
  }

  test("rolling fingerprint is deterministic and order-sensitive") {
    val fps = Seq("abc", "abc", "acb").toDF("text")
      .select(TextFunctions.rollingFingerprint(col("text"))).as[Long].collect()
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
    // hand-computed: ((0*31+97)*31+98)*31+99 % 1e9+7
    assert(fps(0) === ((97L * 31 + 98) * 31 + 99) % 1000000007L)
  }

  test("regex token count splits letter runs, digit runs, symbols") {
    val n = Seq("abc12 de-f!").toDF("text")
      .select(TextFunctions.regexTokenCount(col("text"))).as[Int].head()
    // abc, 12, de, -, f, ! → 6
    assert(n === 6)
  }

  test("stratifiedKeep honors rate edges and per-stratum rates") {
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "s")
    def kept(rates: Map[String, Int], default: Int): Long =
      df.filter(TextFunctions.stratifiedKeep(col("id"), col("s"),
        rates, default)).count()
    assert(kept(Map.empty, 0) === 0L)        // rate 0 drops all
    assert(kept(Map.empty, 10000) === 2000L) // rate 10000 keeps all
    // stratum a kept fully, b dropped fully
    val aOnly = df.filter(TextFunctions.stratifiedKeep(col("id"), col("s"),
      Map("a" -> 10000, "b" -> 0), 5000))
    assert(aOnly.select("s").distinct().as[String].collect().toSeq === Seq("a"))
    // ~half at 5000‱, within a loose binomial band
    val half = kept(Map.empty, 5000)
    assert(half > 850 && half < 1150, s"got $half")
  }

  test("stratifiedKeep is a pure function of (key, stratum)") {
    val df = (1L to 500L).toDF("id").withColumn("s", lit("x"))
    val pred = TextFunctions.stratifiedKeep(col("id"), col("s"),
      Map("x" -> 3000), 0)
    val once = df.filter(pred).as[(Long, String)].collect().toSet
    val again = df.repartition(7).filter(pred)
      .as[(Long, String)].collect().toSet
    assert(once === again)
  }
}

class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: Seq[(String, Long, String)]) =
    rows.map { case (k, sec, t) =>
      (k, new java.sql.Timestamp(sec * 1000L), t)
    }.toDF("user_id", "ts", "event_type")

  private def run(rows: Seq[(String, Long, String)]) =
    Funnel.firstReached(ev(rows), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .selectExpr("user_id", "unix_micros(view_ts) DIV 1000000",
        "unix_micros(click_ts) DIV 1000000",
        "unix_micros(purchase_ts) DIV 1000000")
      .as[(String, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("stages only count at-or-after the previous stage") {
    val out = run(Seq(
      ("A", 10L, "view"), ("A", 20L, "click"), ("A", 30L, "purchase"),
      // B's only click precedes its first view — funnel stalls
      ("B", 5L, "click"), ("B", 10L, "view"),
      // C's first purchase precedes its first qualifying click
      ("C", 10L, "view"), ("C", 15L, "purchase"), ("C", 20L, "click"),
      ("C", 25L, "purchase"),
      // D never views — absent from output
      ("D", 10L, "click")))
    assert(out === Map(
      "A" -> (Some(10L), Some(20L), Some(30L)),
      "B" -> (Some(10L), None, None),
      "C" -> (Some(10L), Some(20L), Some(25L))))
  }

  test("a stage at the exact same instant as the previous one counts") {
    val out = run(Seq(
      ("E", 10L, "view"), ("E", 10L, "click"), ("E", 10L, "purchase")))
    assert(out === Map("E" -> (Some(10L), Some(10L), Some(10L))))
  }

  test("earliest qualifying event wins within each stage") {
    val out = run(Seq(
      ("F", 10L, "view"), ("F", 40L, "click"), ("F", 20L, "click"),
      ("F", 30L, "purchase"), ("F", 50L, "purchase")))
    // first click >= 10 is 20; first purchase >= 20 is 30
    assert(out === Map("F" -> (Some(10L), Some(20L), Some(30L))))
  }

  test("sessionFunnel: conversion must complete within one session") {
    val rows = Seq(
      // session 1: full conversion inside the gap
      ("A", 1L, 10L, "view"), ("A", 2L, 20L, "click"),
      ("A", 3L, 30L, "purchase"),
      // session 2 (an hour later with a 60s gap): the purchase is in a
      // LATER session, so this view-click stalls where firstReached
      // would have converted it
      ("A", 4L, 4000L, "view"), ("A", 5L, 4010L, "click"),
      ("A", 6L, 8000L, "purchase"))
    val df = rows.map { case (k, id, sec, t) =>
      (k, id, new java.sql.Timestamp(sec * 1000L), t)
    }.toDF("user_id", "event_id", "ts", "event_type")
    val out = Funnel.sessionFunnel(df, "user_id", "ts", "event_id",
        "event_type", Seq("view", "click", "purchase"),
        gapMicros = 60000000L)
      .selectExpr("user_id", "sid", "unix_micros(view_ts) DIV 1000000",
        "unix_micros(click_ts) DIV 1000000",
        "unix_micros(purchase_ts) DIV 1000000")
      .as[(String, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out === Map(
      ("A", 1L) -> ((Some(10L), Some(20L), Some(30L))),
      ("A", 2L) -> ((Some(4000L), Some(4010L), None))))
    // session 3 (the lone purchase) has no view -> absent
    assert(!out.contains(("A", 3L)))
  }

  test("with an infinite gap, sessionFunnel degenerates to firstReached") {
    val rnd = new scala.util.Random(11)
    val types = Seq("view", "click", "purchase", "error")
    val rows = (1 to 120).map { i =>
      (s"u${rnd.nextInt(6)}", i.toLong, rnd.nextInt(100000).toLong * 1000,
        types(rnd.nextInt(types.size)))
    }
    val df = rows.map { case (k, id, ms, t) =>
      (k, id, new java.sql.Timestamp(ms), t)
    }.toDF("user_id", "event_id", "ts", "event_type")
    val stages = Seq("view", "click", "purchase")
    val sess = Funnel.sessionFunnel(df, "user_id", "ts", "event_id",
        "event_type", stages, gapMicros = Long.MaxValue / 4)
      .drop("sid")
      .as[(String, Option[java.sql.Timestamp], Option[java.sql.Timestamp],
        Option[java.sql.Timestamp])].collect().toSet
    val flat = Funnel.firstReached(df, "user_id", "ts", "event_type", stages)
      .as[(String, Option[java.sql.Timestamp], Option[java.sql.Timestamp],
        Option[java.sql.Timestamp])].collect().toSet
    assert(sess === flat)
  }
}

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join equals the plain join, including hot keys and misses") {
    val left = ((1 to 500).map(i => ("hot", i.toLong)) ++
      (1 to 10).map(i => (s"k$i", i.toLong))).toDF("key", "v")
    val right = Seq(("hot", "H"), ("k1", "A"), ("k99", "Z"))
      .toDF("key", "tag")
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.select("key", "v", "tag").as[(String, Long, String)]
        .collect().sorted.toSeq
    assert(sorted(Skew.saltedJoin(left, right, "key", salt = 8)) ===
      sorted(left.join(right, Seq("key"))))
  }

  test("a hot key's rows actually spread over multiple salts") {
    val left = (1 to 500).map(i => ("hot", i.toLong)).toDF("key", "v")
    val salts = left.select(
        pmod(xxhash64(struct(col("key"), col("v"))), lit(8L)).as("s"))
      .distinct().count()
    assert(salts > 4, s"only $salts salts used")
  }

  test("saltOn spreads byte-identical duplicate rows and keeps results") {
    // 400 byte-identical hot rows: the whole-row fingerprint sends all
    // of them to ONE salt (the documented no-op case); salting on a
    // distinct id column spreads them while the join result — with the
    // id column carried — is unchanged
    val dup = (1 to 400).map(i => ("hot", "payload", i.toLong))
      .toDF("key", "v", "row_id")
    val right = Seq(("hot", "H")).toDF("key", "tag")
    val wholeRowSalts = dup.drop("row_id").select(
        pmod(xxhash64(struct(col("key"), col("v"))), lit(8L)).as("s"))
      .distinct().count()
    assert(wholeRowSalts === 1)
    val onId = Skew.saltedJoin(dup, right, "key", salt = 8,
      saltOn = Some(col("row_id")))
    val idSalts = dup.select(
        pmod(xxhash64(col("row_id")), lit(8L)).as("s")).distinct().count()
    assert(idSalts > 4, s"only $idSalts salts used")
    assert(onId.count() === 400L)
    assert(onId.select("key", "v", "row_id", "tag")
      .as[(String, String, Long, String)].collect().sorted.toSeq ===
      dup.join(right, Seq("key")).select("key", "v", "row_id", "tag")
        .as[(String, String, Long, String)].collect().sorted.toSeq)
  }
}

class ChunkDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("first occurrence wins corpus-wide and docs reassemble in order") {
    val docs = Seq(
      (1L, "a b c d e f"),          // chunks: "a b c", "d e f"
      (2L, "a b c x y z"),          // "a b c" dup of doc 1's first chunk
      (3L, "d e f"),                // fully duplicated → empty survivor
      (4L, "a b c d e f")           // both chunks dups
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, n = 3)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === (("a b c d e f", 2L, 0L)))
    assert(out(2L) === (("x y z", 1L, 1L)))
    assert(out(3L) === (("", 0L, 1L)))
    assert(out(4L) === (("", 0L, 2L)))
  }

  test("within-doc repeats collapse to the first position") {
    val docs = Seq((1L, "a b c a b c d e f")).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, n = 3)
      .as[(Long, String, Long, Long)].collect().head
    assert(out === ((1L, "a b c d e f", 2L, 1L)))
  }

  test("short tail chunk is kept as its own unit") {
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text") // "a b c", "d"
    val out = Dedup.chunkDedup(docs, n = 3)
      .as[(Long, String, Long, Long)].collect().head
    assert(out === ((1L, "a b c d", 2L, 0L)))
  }
}

class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("quote containment fires where symmetric jaccard stays silent") {
    // doc 1 is fully quoted inside doc 2's much longer text
    val quote = "alpha beta gamma delta epsilon"
    val filler = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, quote),
      (2L, s"$filler $quote"),
      (3L, "totally unrelated words here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, threshold = 0.8)
      .select("doc_a", "doc_b", "containment")
      .as[(Long, Long, Double)].collect()
    // 1 ⊂ 2: every shingle of 1 appears in 2 → containment 1.0
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 === 1.0))
    // the reverse direction is diluted by the filler → below gate
    assert(!pairs.exists(p => p._1 == 2L && p._2 == 1L))
    // and symmetric jaccard would miss the pair entirely at 0.5
    val jac = Dedup.nearDupPairs(docs, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(!jac.contains((1L, 2L)) && !jac.contains((2L, 1L)))
  }

  test("maxDocFreq drops boilerplate shingles from score and candidates") {
    // "x y z" boilerplate appears in every doc; the informative quote
    // only in docs 1 and 2
    val docs = Seq(
      (1L, "alpha beta gamma delta x y z"),
      (2L, "alpha beta gamma delta other words here x y z"),
      (3L, "completely different content x y z"),
      (4L, "nothing shared at all with one x y z")
    ).toDF("doc_id", "text")
    // uncapped: every pair is a candidate via the shared boilerplate
    val un = Dedup.containmentPairs(docs, threshold = 0.0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(un.contains((3L, 4L)))
    // capped at 2: boilerplate (df=4) is out; only the quote pair
    // remains, scored over informative shingles alone
    val capped = Dedup.containmentPairs(docs, threshold = 0.5,
      maxDocFreq = 2L)
    val pairs = capped.select("doc_a", "doc_b", "containment")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._1 == 4L))
    assert(pairs.keySet.contains((1L, 2L)))
    // a high cap reduces to the exact operator
    val hi = Dedup.containmentPairs(docs, threshold = 0.0, maxDocFreq = 100L)
      .select("doc_a", "doc_b", "containment")
      .as[(Long, Long, Double)].collect().toSet
    val exact = Dedup.containmentPairs(docs, threshold = 0.0)
      .select("doc_a", "doc_b", "containment")
      .as[(Long, Long, Double)].collect().toSet
    assert(hi === exact)
  }
}

class HammingKnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("signBits packs sign comparisons, bit 63 wrapping to Long.MinValue") {
    val v64 = Array.tabulate(64)(i => if (i == 63 || i == 0) 1.0f else -1.0f)
    val sig = Seq(Tuple1(v64)).toDF("embedding")
      .select(Similarity.signBits(col("embedding"))).as[Long].collect().head
    assert(sig === (Long.MinValue | 1L))
    val zeros = Array.fill(4)(0.0f) // zero / negative dims set no bits
    val sigZ = Seq(Tuple1(zeros)).toDF("embedding")
      .select(Similarity.signBits(col("embedding"))).as[Long].collect().head
    assert(sigZ === 0L)
    // empty vectors must yield a NULL signature, not a fake all-zero
    // pack (the oracle's list_sum over [] is NULL)
    val empty = Array.empty[Float]
    val sigE = Seq(Tuple1(empty)).toDF("embedding")
      .select(Similarity.signBits(col("embedding")).as("s"))
    assert(sigE.filter(col("s").isNull).count() === 1)
    // wider than 64 dims must fail fast, not alias onto low bits
    val wide = Array.fill(65)(1.0f)
    val err = intercept[Exception] {
      Seq(Tuple1(wide)).toDF("embedding")
        .select(Similarity.signBits(col("embedding"))).collect()
    }
    assert(err.getMessage.contains("64") ||
      err.getCause != null && err.getCause.getMessage.contains("64"))
  }

  test("hamming scan finds sign-identical vectors; rerank orders by cosine") {
    // 0 and 1: same orthant (hamming 0), 1 closer in cosine than 2
    val vecs = Seq(
      (0L, Array(1.0f, 1.0f, -1.0f, -1.0f)),
      (1L, Array(0.9f, 1.1f, -0.9f, -1.1f)),
      (2L, Array(1.0f, -1.0f, 1.0f, -1.0f)),
      (3L, Array(-1.0f, -1.0f, 1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.hammingKnn(vecs, vecs.filter($"vec_id" === 0),
        k = 3, rerank = 3)
      .select("n_id", "rnk", "hamming")
      .as[(Long, Int, Int)].collect().sortBy(_._2)
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L)) // cosine order
    assert(out.head._3 === 0)       // same orthant → hamming 0
    assert(out.last._3 === 4)       // antipode → all bits differ
    // rerank cap excludes the hamming-farthest candidate
    val capped = Similarity.hammingKnn(vecs, vecs.filter($"vec_id" === 0),
        k = 3, rerank = 2)
      .select("n_id").as[Long].collect().toSet
    assert(capped === Set(1L, 2L))
  }
}

class Round10OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("unigramSurprisal: exact bit-length log2 against hand arithmetic") {
    // corpus of 8 tokens: a x4, b x2, c x1, d x1 → N=8
    // bits(a)=floor(log2(8/4))=1, b: log2(4)=2, c,d: log2(8)=3
    val docs = Seq(
      (1L, Seq("a", "a", "b", "c")), // 1+1+2+3 = 7 bits over 4 tokens
      (2L, Seq("a", "a", "b", "d"))  // 1+1+2+3 = 7
    ).toDF("doc_id", "toks")
    val out = Frequency.unigramSurprisal(docs, "doc_id", col("toks"))
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, n, bits, avg) => id -> ((n, bits, avg)) }.toMap
    assert(out(1L) === ((4L, 7L, 1.75)))
    assert(out(2L) === ((4L, 7L, 1.75)))
  }

  test("bigramSurprisal: conditional bits with unigram first-token fallback") {
    // corpus: doc1 = a b a b, doc2 = a b b a
    // unigrams: a x4, b x4, N=8; bigrams: (a,b) x3, (b,a) x2, (b,b) x1
    // doc1 tokens: a(first: 8//4=2 -> 1 bit), b|a (4//3=1 -> 0),
    //              a|b (4//2=2 -> 1), b|a (0) => 2 bits / 4 tokens
    // doc2: a(1), b|a(0), b|b (4//1=4 -> 2), a|b (1) => 4 bits
    val docs = Seq(
      (1L, Seq("a", "b", "a", "b")),
      (2L, Seq("a", "b", "b", "a"))
    ).toDF("doc_id", "toks")
    val out = Frequency.bigramSurprisal(docs, "doc_id", col("toks"))
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, n, bits, avg) => id -> ((n, bits, avg)) }.toMap
    assert(out(1L) === ((4L, 2L, 0.5)))
    assert(out(2L) === ((4L, 4L, 1.0)))
  }

  test("bigramSurprisal flags scrambled word order a unigram score misses") {
    // every word equally common; doc 20 scrambles the dominant order
    val fluent = Seq("the", "cat", "sat")
    val docs = (1L to 9L).map(i => (i, fluent)) :+ (20L, Seq("sat", "the", "cat"))
    val df = docs.toDF("doc_id", "toks")
    val uni = Frequency.unigramSurprisal(df, "doc_id", col("toks"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    val bi = Frequency.bigramSurprisal(df, "doc_id", col("toks"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    // unigram: identical scores (same words)
    assert(uni(20L) === uni(1L))
    // bigram: the scrambled doc scores strictly higher
    assert(bi(20L) > bi(1L), s"bi(20)=${bi(20L)} bi(1)=${bi(1L)}")
  }

  test("canonicalize: argmax by weight, ties to the lowest id") {
    val cl = Seq(
      (10L, 1L, 5), (11L, 1L, 9), (12L, 1L, 9), // tie at 9 → 11 wins
      (20L, 2L, 3)                              // singleton
    ).toDF("doc_id", "cluster_id", "w")
    val out = Dedup.canonicalize(cl, col("w"))
      .select("doc_id", "canonical_id", "is_canonical")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out === Set(
      (10L, 11L, false), (11L, 11L, true), (12L, 11L, false),
      (20L, 20L, true)))
  }

  test("keyProfile: hot-key shares and exact percentiles over key counts") {
    // key counts: hot=6, w1..w3=2 each, null rows dropped
    val rows = Seq.fill(6)("hot") ++ Seq("w1", "w1", "w2", "w2", "w3", "w3") ++
      Seq(null.asInstanceOf[String])
    val out = Skew.keyProfile(rows.toDF("k"), "k", topK = 2)
      .as[(String, Long, Double, Long, Long, Double, Double)]
      .collect().sortBy(-_._2).toSeq
    assert(out.map(r => (r._1, r._2)) === Seq(("hot", 6L), ("w1", 2L)))
    assert(out.head._3 === 0.5)           // 6 of 12
    assert(out.head._4 === 4L)            // n_keys
    assert(out.head._5 === 12L)           // total
    assert(out.head._6 === 2.0)           // p50 of (6,2,2,2)
    // p99 of (2,2,2,6) interpolated: index 2.97 → 2 + 0.97*(6-2)
    assert(math.abs(out.head._7 - 5.88) < 1e-9)
  }
}

class KmvRollupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("merged fine sketches equal the direct coarse sketch exactly") {
    // 3 days x overlapping user sets, enough distinct users (>= 200)
    // that the weekly sketch saturates k and the estimator branch runs
    val rows = for {
      day <- 0 to 2
      u <- 0 until 150
    } yield (day.toLong, s"u${(u * 7 + day * 50) % 220}")
    val df = rows.toDF("day", "uid")
    val direct = graft.operators.Dedup.kmvDistinct(
        df.withColumn("week", lit(0L)), "week", "uid", k = 64)
      .as[(Long, Long, Option[Long], Option[Double])].collect().toSet
    val merged = graft.operators.Dedup.kmvMerge(
        graft.operators.Dedup.kmvSketches(df, "day", "uid", k = 64)
          .withColumn("week", lit(0L)),
        "week", k = 64)
      .as[(Long, Long, Option[Long], Option[Double])].collect().toSet
    assert(merged === direct)
    assert(direct.head._2 === 64L) // saturated: the estimator branch
  }

  test("below k the merge stays exact (estimate null)") {
    val df = Seq((0L, "a"), (0L, "b"), (1L, "b"), (1L, "c")).toDF("day", "uid")
    val merged = graft.operators.Dedup.kmvMerge(
        graft.operators.Dedup.kmvSketches(df, "day", "uid", k = 64)
          .withColumn("g", lit(0L)), "g", k = 64)
      .as[(Long, Long, Option[Long], Option[Double])].collect().toSeq
    assert(merged === Seq((0L, 3L, None, None))) // a,b,c exact, no kth
  }
}

class ClassifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import graft.operators.Classify

  test("nbTrain: hand-computed bit-length log-odds, normalizers fold") {
    // pos "good good fine", neg "bad bad fine":
    // good ctp=2 ctn=0 -> bits(3)-bits(1)=1; fine 1/1 -> bits(2)-bits(2)=0;
    // bad 0/2 -> -1; np=nn=3, v=3 -> normalizers cancel
    val docs = Seq((1L, true, Seq("good", "good", "fine")),
      (2L, false, Seq("bad", "bad", "fine"))).toDF("doc_id", "pos", "toks")
    val m = Classify.nbTrain(docs, col("toks"), col("pos"))
      .as[(String, Long)].collect().toMap
    assert(m === Map("good" -> 1L, "fine" -> 0L, "bad" -> -1L))
  }

  test("nbScore: instance-weighted sums, balanced-prior verdicts") {
    val docs = Seq((1L, true, Seq("good", "good", "fine")),
      (2L, false, Seq("bad", "bad", "fine"))).toDF("doc_id", "pos", "toks")
    val m = Classify.nbTrain(docs, col("toks"), col("pos"))
    val out = Classify.nbScore(docs, "doc_id", col("toks"), m)
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._5))).toMap
    assert(out(1L) === ((3L, 2L, true)))   // 1+1+0
    assert(out(2L) === ((3L, -2L, false))) // -1-1+0
  }

  test("unseen tokens score the smoothed floor from the SAME totals") {
    // pos "a a a a" (np=4), neg "b" (nn=1), v=2:
    // unseen = bits(1+2) - bits(4+2) = 1 - 2 = -1
    val train = Seq((1L, true, Seq("a", "a", "a", "a")),
      (2L, false, Seq("b"))).toDF("doc_id", "pos", "toks")
    val unseen = Classify.unseenBits(train, col("toks"), col("pos"))
    val m = Classify.nbTrain(train, col("toks"), col("pos"))
    val fresh = Seq((9L, Seq("z", "z"))).toDF("doc_id", "toks")
    val out = Classify.nbScore(fresh, "doc_id", col("toks"), m, unseen)
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(out === Array((9L, 2L, -2L, -1.0, false)))
  }
}

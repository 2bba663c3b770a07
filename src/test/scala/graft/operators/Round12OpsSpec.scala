package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-12 session additions: prefix-filter exact similarity join,
  * nearest-event join, centroid quality gate, blocklist gate, and the
  * null-id sharding guard.
  */
class PrefixFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Plain-Scala truth: every pair with integer-rule Jaccard >= tau. */
  private def brute(docs: Seq[(Long, String)], n: Int,
                    tauPm: Long): Set[(Long, Long)] = {
    def sh(t: String): Set[String] = {
      val w = t.split(" ").toVector
      if (w.length < n) Set(w.mkString(" "))
      else w.sliding(n).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => id -> sh(t) }
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      if inter * 1000 >= tauPm * (sa.size + sb.size - inter)
    } yield (a, b)).toSet
  }

  test("prefix-filter join equals brute force on a mixed corpus") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val base = (1L to 20L).map { i =>
      (i, Vector.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // near-dups of the first five (one word changed) + one exact dup
    val variants = base.take(5).map { case (id, t) =>
      val w = t.split(" ").toVector
      (id + 100L, w.updated(3, "omega").mkString(" "))
    } :+ (200L, base.head._2)
    val docs = base ++ variants
    val got = Dedup.prefixFilterPairs(docs.toDF("doc_id", "text"),
        tauPermille = 500)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got === brute(docs, n = 3, tauPm = 500))
  }

  test("integer threshold rule: boundary pair at exactly tau kept") {
    // doc sets: A has 4 shingles, B has 4, inter 8/3... construct via
    // texts: 6-word docs -> 4 shingles; share exactly 2 -> J = 2/6 = 1/3
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d x y")).toDF("doc_id", "text")
    // shared shingles: "a b c","b c d" => inter=2, union=6, J=1/3
    val at333 = Dedup.prefixFilterPairs(docs, tauPermille = 333)
      .as[(Long, Long, Double)].collect()
    assert(at333.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    val at334 = Dedup.prefixFilterPairs(docs, tauPermille = 334)
    assert(at334.count() === 0)
  }

  test("tau=1000 finds only identical shingle sets") {
    val docs = Seq(
      (1L, "one two three four"),
      (2L, "one two three four"),
      (3L, "one two three five")).toDF("doc_id", "text")
    val got = Dedup.prefixFilterPairs(docs, tauPermille = 1000)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
  }

  test("staged-frame path (From / prefixIndex split) equals inline") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("red", "blue", "green", "cyan", "teal", "pink")
    val docs = ((1L to 15L).map { i =>
      (i, Vector.fill(10)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    } :+ (300L, "red blue green cyan teal pink red blue green cyan"))
      .toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val inline = pairs(Dedup.prefixFilterPairs(docs, tauPermille = 400))
    // the d15 staged recipe: sr + dfreq handed in from "artifact" frames
    val sr = Dedup.shingleRows(docs)
    val dfreq = sr.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    assert(pairs(Dedup.prefixFilterPairsFrom(
      sr, dfreq, docs, tauPermille = 400)) === inline)
    // the 100 TB split: a materialized prefix index served to the query
    val pref = Dedup.prefixIndex(sr, dfreq, tauPermille = 400)
    assert(pairs(Dedup.pairsFromPrefixIndex(
      pref, docs, tauPermille = 400)) === inline)
  }
}

class NearestJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val right = Seq(
    (1L, ts("2020-01-01 00:00:00"), 10L),
    (1L, ts("2020-01-01 00:01:00"), 11L),
    (2L, ts("2020-01-01 00:00:30"), 20L))
    .toDF("k", "rts", "rid")

  private def run(left: Seq[(Long, java.sql.Timestamp, Long)]) =
    Temporal.nearestJoin(left.toDF("k", "lts", "lid"), right,
        keyL = "k", keyR = "k", leftTs = "lts", rightTs = "rts",
        rightCarry = Seq("rid"))
      .select(col("lid"), col("_nearest.rid"))
      .as[(Long, Option[Long])].collect().toMap

  test("picks whichever side is closer, either direction") {
    val out = run(Seq(
      (1L, ts("2020-01-01 00:00:10"), 100L),   // prev at 10s, next at 50s
      (1L, ts("2020-01-01 00:00:50"), 101L)))  // prev at 50s, next at 10s
    assert(out(100L) === Some(10L))
    assert(out(101L) === Some(11L))
  }

  test("exact tie goes to the earlier right row") {
    val out = run(Seq((1L, ts("2020-01-01 00:00:30"), 100L)))
    assert(out(100L) === Some(10L))
  }

  test("equal-timestamp right row matches with gap zero") {
    val out = run(Seq((1L, ts("2020-01-01 00:01:00"), 100L)))
    assert(out(100L) === Some(11L))
  }

  test("no same-key right rows -> null; null left ts -> null") {
    val out = run(Seq(
      (9L, ts("2020-01-01 00:00:10"), 100L),
      (1L, null.asInstanceOf[java.sql.Timestamp], 101L)))
    assert(out(100L) === None)
    assert(out(101L) === None)
  }

  test("one-sided keys fall back to the only direction available") {
    val out = run(Seq(
      (2L, ts("2020-01-01 00:00:00"), 100L),   // only a LATER right row
      (2L, ts("2020-01-01 00:09:00"), 101L)))  // only an EARLIER right row
    assert(out(100L) === Some(20L))
    assert(out(101L) === Some(20L))
  }
}

class CentroidQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand arithmetic: centroid of seed, cosine gate on corpus") {
    val seed = Seq(
      (900L, Seq(1.0f, 0.0f)),
      (901L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Seq(1.0f, 1.0f)),    // cos vs [0.5,0.5] = 1.0
      (2L, Seq(1.0f, 0.0f)),    // cos = 1/sqrt(2) ~ 0.707
      (3L, Seq(-1.0f, -1.0f)),  // cos = -1
      (4L, Seq(0.0f, 0.0f)),    // zero vector: null cos, dropped
      (5L, Seq(1.0f, 2.0f, 3.0f)), // wrong width: excluded entirely
      (6L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val out = Similarity.centroidQuality(corpus, seed, dims = 2, tau = 0.7)
      .as[(Long, Option[Double], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L))
    assert(math.abs(out(1L)._1.get - 1.0) < 1e-9 && out(1L)._2)
    assert(math.abs(out(2L)._1.get - math.sqrt(0.5)) < 1e-9 && out(2L)._2)
    assert(out(3L)._1.get < 0 && !out(3L)._2)
    assert(out(4L)._1.isEmpty && !out(4L)._2)
  }

  test("empty seed raises a clear error") {
    val e = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val err = intercept[IllegalArgumentException] {
      Similarity.centroidQuality(e, e.limit(0), dims = 2, tau = 0.5)
    }
    assert(err.getMessage.contains("seed"))
  }
}

class BlocklistSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("total vs distinct counts, case-folded matching, keep verdict") {
    val docs = Seq(
      (1L, "Bad BAD worse fine"),
      (2L, "all clean words here"),
      (3L, null.asInstanceOf[String]),
      (4L, "")).toDF("doc_id", "text")
    val out = Redact.blocklistGate(docs, "doc_id", "text",
        blocklist = Seq("bad", "worse"))
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((3L, 2L, false)))
    assert(out(2L) === ((0L, 0L, true)))
    assert(out(3L) === ((0L, 0L, true)))
    assert(out(4L) === ((0L, 0L, true)))
  }
}

class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("learns the hand-computed merge sequence with tie-breaks") {
    // counts: "low" x3, "lower" x2, "newest" x1
    // round 0 pairs: (l,o)=5 (o,w)=5 (w,e)=2 (e,r)=2 (n,e)=1 (e,w)=1
    //   (w,s)... newest: n e w e s t -> (n,e)(e,w)(w,e)(e,s)(s,t)
    //   tie (l,o)=(o,w)=5 -> lexicographic: (l,o)
    // round 1: (lo,w)=5 wins
    // round 2: (low,e)=2 vs (e,r)=2 vs (w,e)=1... tie -> (e,r)
    val docs = Seq(
      (1L, "low low low lower lower newest")).toDF("doc_id", "text")
    val got = graft.functions.Bpe.train(docs, nMerges = 3)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (0, "l", "o", 5L),
      (1, "lo", "w", 5L),
      (2, "e", "r", 2L)))
  }

  test("left-to-right non-overlapping apply: aaa merges to [aa, a]") {
    // one word "aaa" x2: round 0 pair (a,a)=4 (two overlapping slots
    // per word); after merging, state is [aa, a] so round 1 sees
    // (aa,a)=2 — the apply rule, not a regex-overlap artifact
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val got = graft.functions.Bpe.train(docs, nMerges = 2)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((0, "a", "a", 4L), (1, "aa", "a", 2L)))
  }

  test("stops early below minCount") {
    val docs = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    // every pair has count 1 < minCount=2 -> zero merges learned
    assert(graft.functions.Bpe.train(docs, nMerges = 5).count() === 0L)
  }

  test("in-core and distributed paths learn identical merges and counts") {
    // localVocabThreshold = 0 forces the distributed incremental loop;
    // the default takes the in-core occurrence-indexed loop — the
    // merge SEQUENCE and the published pair counts must be
    // path-identical (same argmax total order, same apply rule)
    val docs = Seq(
      (1L, "low low low lower lower newest wider wide wide"),
      (2L, "aaa aab abab low newest newest")).toDF("doc_id", "text")
    def run(thr: Long) =
      graft.functions.Bpe.train(docs, nMerges = 6,
          localVocabThreshold = thr)
        .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(run(0L) === run(2000000L))
  }

  test("path identity holds on supplementary-plane tie-breaks") {
    // U+10000 (LINEAR B SYLLABLE, a surrogate PAIR in UTF-16) vs
    // U+E000 (private-use BMP): UTF-16 code-UNIT order puts the
    // surrogate lead (0xD800) BEFORE 0xE000, but code-point / UTF-8
    // order — Spark's UTF8String collation, the trainer's documented
    // total order — puts U+E000 first. Two pairs tied on count and
    // differing only in that character force the tie-break; both
    // paths must pick the U+E000 pair (code-point order).
    val e = "\uE000"; val sp = new String(Character.toChars(0x10000))
    val docs = Seq(
      (1L, s"${e}a ${e}a ${sp}a ${sp}a")).toDF("doc_id", "text")
    def run(thr: Long) =
      graft.functions.Bpe.train(docs, nMerges = 1,
          localVocabThreshold = thr)
        .as[(Int, String, String, Long)].collect().toSeq
    val local = run(2000000L)
    assert(local === run(0L))
    assert(local.head._2 === e, "tie must break by code point")
  }

  test("training on the harness corpus reproduces the frozen fixture prefix") {
    // the fixture was frozen from sf0.01 (sf0.001's Zipf order differs
    // in ranks 1-3 — merge order is corpus-specific, as it should be)
    val docs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
    val got = graft.functions.Bpe.train(docs, nMerges = 5)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
      .map(m => (m._2, m._3)).toSeq
    assert(got === graft.functions.Bpe.merges.take(5).toSeq)
  }
}

class AudioNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Plain-Scala replica of the 16-block amplitude hash over the
    * withWavPayload construction (chars 2i, 2i+1 → LE sample i).
    */
  private def expectedSig(text: String): Long = {
    val amps = (0 until 16).map { i =>
      val raw = text.charAt(2 * i).toInt + 256 * text.charAt(2 * i + 1).toInt
      math.abs(if (raw >= 32768) raw - 65536 else raw).toLong
    }
    val gm = amps.sum / 16
    amps.zipWithIndex.collect { case (a, j) if a >= gm => 1L << j }
      .foldLeft(0L)(_ | _)
  }

  private val t1 = "abcdefghijklmnopqrstuvwxyzABCDEF"
  private val t2 = "AAAAAAAAAAAAAAAAzzzzzzzzzzzzzzzz"

  test("decoded signature matches the plain-Scala replica") {
    val df = Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
    val sigs = Multimodal.audioPhash(Multimodal.withWavPayload(df))
      .as[(Long, Boolean, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(sigs(1L) === expectedSig(t1))
    assert(sigs(2L) === expectedSig(t2))
  }

  test("exact copies pair at distance 0; dissimilar envelopes do not pair") {
    val df = Seq((1L, t1), (2L, t1), (3L, t2)).toDF("doc_id", "text")
    val pairs = Multimodal.audioNearDup(Multimodal.withWavPayload(df))
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L, 0L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("signature survives a container rewrite the byte hash dies on") {
    // same PCM, but an extra ignorable LIST chunk before data
    def wav(extraChunk: Boolean): Array[Byte] = {
      val b = collection.mutable.ArrayBuffer[Byte]()
      def ascii(s: String) = b ++= s.getBytes("US-ASCII")
      def le32(v: Int) = b ++= Array[Byte]((v & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 24) & 0xff).toByte)
      def le16(v: Int) = b ++= Array[Byte]((v & 0xff).toByte,
        ((v >> 8) & 0xff).toByte)
      ascii("RIFF"); le32(0); ascii("WAVE")
      ascii("fmt "); le32(16); le16(1); le16(1); le32(8000)
      le32(16000); le16(2); le16(16)
      if (extraChunk) { ascii("LIST"); le32(4); ascii("INFO") }
      ascii("data"); le32(32)
      (0 until 16).foreach(i => le16(i * 100))
      val out = b.toArray
      // patch RIFF size
      val sz = out.length - 8
      out(4) = (sz & 0xff).toByte; out(5) = ((sz >> 8) & 0xff).toByte
      out(6) = ((sz >> 16) & 0xff).toByte; out(7) = ((sz >> 24) & 0xff).toByte
      out
    }
    val df = Seq((1L, wav(false)), (2L, wav(true)))
      .toDF("doc_id", "payload")
    val sigs = Multimodal.audioPhash(df)
      .as[(Long, Boolean, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    assert(sigs(1L) === sigs(2L))
    // the byte-level m7 hash sees different bytes
    val m7 = Multimodal.perceptualHash48(
        df.withColumn("payload", col("payload").cast("string")), "payload")
      .select(col("doc_id"), col("phash"))
      .as[(Long, Long)].collect().toMap
    assert(m7(1L) !== m7(2L))
  }
}

class SceneChangeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Plain-Scala replica of the per-frame aHash over ASCII payloads. */
  private def frameHash(text: String, n: Int, f: Int, w: Int = 16): Long = {
    val len = text.length
    val off = (f.toLong * len / n).toInt
    val bytes = (0 until w).map(j =>
      if (off + j + 1 <= len) text.charAt(off + j).toLong else 0L)
    val mn = bytes.sum / w
    bytes.zipWithIndex.collect { case (b, j) if b >= mn => 1L << j }
      .foldLeft(0L)(_ | _)
  }

  private def run(texts: (Long, String)*): Map[(Long, Int), (Long, Boolean)] =
    Multimodal.sceneChanges(
        Multimodal.withPayload(texts.toDF("doc_id", "text")), n = 8)
      .as[(Long, Int, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap

  test("hamming transitions match the plain-Scala replica") {
    val t = "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ!?"
    val got = run(1L -> t)
    (1 until 8).foreach { i =>
      val want = java.lang.Long.bitCount(
        frameHash(t, 8, i) ^ frameHash(t, 8, i - 1)).toLong
      assert(got((1L, i))._1 === want, s"frame $i")
    }
  }

  test("a mid-payload texture shift is the one detected boundary") {
    // frames 0-3 read constant bytes (hash 0xFFFF: every byte == mean);
    // frames 4-7 read a 2-cycle alternation ('A'=65 < mean 93 <= 'z'=122
    // -> hash 0xAAAA); the only >4-bit jump is the 0xFFFF->0xAAAA seam
    val t = "a" * 64 + "Az" * 32
    val got = run(1L -> t)
    assert((1 until 8).map(i => got((1L, i))._2) ===
      Seq(false, false, false, true, false, false, false))
    assert(got((1L, 4))._1 === 8L) // xor 0x5555
  }

  test("whole operator is shuffle-free: one projection + one generator") {
    val p = Multimodal.sceneChanges(
        Multimodal.withPayload(Seq((1L, "x" * 64)).toDF("doc_id", "text")),
        n = 8)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Exchange"), p.take(1200))
  }
}

class SeasonalDecomposeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 14 days, one type, counts with a weekly pattern + a step: the
  // plain-Scala replica recomputes the whole decomposition
  private val counts: Seq[Long] =
    Seq(10, 12, 11, 10, 30, 31, 9, 10, 12, 11, 10, 30, 31, 9).map(_.toLong)

  private def replica: Map[Long, (Long, Long, Long)] = {
    val n = counts.length
    val trend = (0 until n).map { i =>
      val lo = math.max(0, i - 3); val hi = math.min(n - 1, i + 3)
      val win = counts.slice(lo, hi + 1)
      math.floor(win.sum.toDouble / win.length).toLong
    }
    val det = counts.zip(trend).map { case (c, t) => c - t }
    val seas = (0 until n).groupBy(i => (i + 3) % 7).map { case (wd, is) =>
      wd.toLong ->
        math.floor(is.map(det).sum.toDouble / is.length).toLong
    }
    (0 until n).map { i =>
      i.toLong -> (trend(i), seas((i + 3) % 7), det(i) - seas((i + 3) % 7))
    }.toMap
  }

  test("decomposition matches the hand replica on a 14-day fixture") {
    // day d gets `counts(d)` events at noon of that epoch day
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (0L until c).map(k => ("click", new java.sql.Timestamp(
        d * 86400000L + 43200000L + k)))
    }
    val got = graft.operators.Series.seasonalDecompose(
        rows.toDF("event_type", "ts"), "event_type", "ts")
      .select(col("day"), col("ev_ct"), col("trend"), col("seasonal"),
        col("residual"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val want = replica
    (0 until counts.length).foreach { d =>
      val (tr, se, re) = want(d.toLong)
      assert(got(d.toLong) === ((counts(d), tr, se, re)), s"day $d")
    }
  }

  test("identity: ev_ct == trend + seasonal + residual on real data") {
    val dec = graft.operators.Series.seasonalDecompose(
      graft.core.Tables.events(spark, "/root/testdata/sf0.001"),
      "event_type", "ts")
    assert(dec.filter(
      col("ev_ct") =!= col("trend") + col("seasonal") + col("residual"))
      .count() === 0L)
    assert(dec.count() > 0L)
  }
}

class LabelPropagationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(iters: Int, edges: (Long, Long)*): Map[Long, Long] =
    graft.operators.Graph.labelPropagation(
        edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap

  test("two cliques over one bridge keep separate labels (3 rounds, hand-traced)") {
    // triangles {1,2,3} and {4,5,6}, bridge 3-4 — connected components
    // would merge everything to 1; density-sensitive LP must not
    val got = run(3, 1L -> 2L, 1L -> 3L, 2L -> 3L,
      4L -> 5L, 4L -> 6L, 5L -> 6L, 3L -> 4L)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("round 1 is the most-frequent-neighbor label with min tie-break") {
    // star: center 10 with leaves 2,3,4 — each leaf sees only {10};
    // the center sees {2,3,4} all once -> tie -> 2
    val got = run(1, 10L -> 2L, 10L -> 3L, 10L -> 4L)
    assert(got === Map(10L -> 2L, 2L -> 10L, 3L -> 10L, 4L -> 10L))
  }

  test("every node gets exactly one label drawn from the node set") {
    val got = run(2, 1L -> 2L, 2L -> 3L, 3L -> 4L, 5L -> 6L)
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(got.values.toSet.subsetOf(got.keySet))
  }
}

class SplitRepairSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("leaked val docs move to train; clean docs keep their split") {
    // pair (1,2) crosses: 1=train, 2=val -> 2 is the leaked side;
    // 3 (val) and 4 (train) are untouched; pair (3,5) is val-val in
    // the split below so it must NOT trigger a repair... use (4,5):
    // train-val crossing -> 5 moves
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c"), (5L, "c"))
      .toDF("doc_id", "text")
    val split = when(col("doc_id").isin(1L, 4L), "train").otherwise("val")
    val pairs = Seq((1L, 2L, 1.0), (4L, 5L, 1.0))
      .toDF("doc_a", "doc_b", "jaccard")
    val got = graft.operators.Dedup.splitRepair(docs, threshold = 0.5,
        split = split, pairs = Some(pairs))
      .as[(Long, String, String, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got === Map(
      1L -> (("train", "train", false)),
      2L -> (("val", "train", true)),
      3L -> (("val", "val", false)),
      4L -> (("train", "train", false)),
      5L -> (("val", "train", true))))
  }

  test("val-val near-dups are not leakage and repair nothing") {
    val docs = Seq((2L, "a"), (3L, "a")).toDF("doc_id", "text")
    val split = lit("val")
    val pairs = Seq((2L, 3L, 1.0)).toDF("doc_a", "doc_b", "jaccard")
    val got = graft.operators.Dedup.splitRepair(docs, 0.5, split,
        pairs = Some(pairs))
      .as[(Long, String, String, Boolean)].collect()
    assert(got.forall(r => r._3 == "val" && !r._4))
  }
}

class StateAsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // key A: insert@1, update@2, delete@3 | B: insert@2 | C: insert@5
  // D: delete@1 then re-insert@2
  private def feed = Seq(
    ("A", 1L, "insert", 10), ("A", 2L, "update", 11),
    ("A", 3L, "delete", 0),
    ("B", 2L, "insert", 20),
    ("C", 5L, "insert", 30),
    ("D", 1L, "delete", 0), ("D", 2L, "insert", 40))
    .toDF("k", "seq", "op", "v")

  test("state at cutoff=4: deleted keys absent, future keys not yet born") {
    val got = graft.sources.CdcRouter.stateAsOf(feed, Seq("k"),
        Seq("seq"), cutoff = lit(4L))
      .select(col("k"), col("v"))
      .as[(String, Int)].collect().toMap
    assert(got === Map("B" -> 20, "D" -> 40)) // A deleted, C unborn
  }

  test("state at cutoff=2 sees A's update; at cutoff=1 A's insert") {
    def at(c: Long) = graft.sources.CdcRouter.stateAsOf(feed, Seq("k"),
        Seq("seq"), cutoff = lit(c))
      .select(col("k"), col("v")).as[(String, Int)].collect().toMap
    assert(at(2L) === Map("A" -> 11, "B" -> 20, "D" -> 40))
    assert(at(1L) === Map("A" -> 10)) // D's delete@1 tombstones it
  }
}

class VocabGrowthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cumulative vocab/doc/token counts match a hand fixture") {
    // ids 0..3, bins=4 -> edges at id_le = 0,1,2,3
    val docs = Seq(
      (0L, "a b a"),        // vocab {a,b}, 3 tokens
      (1L, "b c"),          // +{c}, 2 tokens
      (2L, "a"),            // +{}, 1 token
      (3L, "d d B"))        // +{d} (B lowercases to b), 3 tokens
      .toDF("doc_id", "text")
    val got = graft.operators.Frequency.vocabGrowth(docs, bins = 4)
      .as[(Int, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got === Map(
      1 -> ((0L, 1L, 3L, 2L)),
      2 -> ((1L, 2L, 5L, 3L)),
      3 -> ((2L, 3L, 6L, 3L)),
      4 -> ((3L, 4L, 9L, 4L))))
  }

  test("vocab is first-occurrence based: permuting ids permutes the curve") {
    // same texts, reversed ids: word 'c' now first appears at id 2
    val docs = Seq((3L, "a b a"), (2L, "b c"), (1L, "a"), (0L, "d d B"))
      .toDF("doc_id", "text")
    val got = graft.operators.Frequency.vocabGrowth(docs, bins = 4)
      .as[(Int, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(got === Map(1 -> 2L, 2 -> 3L, 3 -> 4L, 4 -> 4L))
  }
}

class DecodeDispatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: (Long, Array[Byte])*)
      : Map[Long, (String, Boolean)] =
    Multimodal.decodeDispatch(rows.toDF("doc_id", "payload"))
      .select(col("doc_id"), col("kind"), col("ok"))
      .as[(Long, String, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("magic sniffing routes each payload to the right parser") {
    val ppm = ("P6 1 1 255\n" + "abc").getBytes("US-ASCII")
    val junk = Array[Byte](0, 1, 2, 3)
    val truncatedPpm = "P6 9 9 255\nxy".getBytes("US-ASCII") // claims 9x9
    val fakeRiff = "RIFFxxxxJUNK".getBytes("US-ASCII") // magic, no WAVE
    val got = run(1L -> ppm, 2L -> junk, 3L -> truncatedPpm, 4L -> fakeRiff)
    assert(got(1L) === (("ppm", true)))
    assert(got(2L) === (("unknown", false)))
    assert(got(3L) === (("ppm", false)))   // sniffed kind kept, parse fails
    assert(got(4L) === (("wav", false)))
  }

  test("dispatched stats equal the dedicated decoders' stats") {
    val texts = Seq((10L, "abcdefghijklmnopqrstuvwxyzABCDEF"))
      .toDF("doc_id", "text")
    val wav = Multimodal.withWavPayload(texts)
      .select(col("doc_id"), col("payload"))
    val viaDispatch = Multimodal.decodeDispatch(wav)
      .select(col("doc_id"), col("n_units"), col("stat1"), col("stat2"))
      .as[(Long, Long, Long, Long)].collect().head
    val viaDecoder = Multimodal.decodeWav(wav)
      .select(col("doc_id"), col("n_samples"), col("sum_amp"),
        col("peak_amp"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(viaDispatch === viaDecoder)
  }

  test("fuzz: arbitrary byte payloads never throw, always one row each") {
    val rnd = new scala.util.Random(42)
    val rows = (0L until 200L).map { i =>
      val len = rnd.nextInt(64)
      val b = new Array[Byte](len); rnd.nextBytes(b)
      // force magic prefixes on a third of them to stress the parsers
      if (i % 3 == 0 && len >= 2) { b(0) = 'P'; b(1) = '6' }
      if (i % 3 == 1 && len >= 4) {
        b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
      }
      (i, b)
    }
    val out = Multimodal.decodeDispatch(rows.toDF("doc_id", "payload"))
      .collect()
    assert(out.length === 200)
  }
}

class BackoffSurprisalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // train doc "a b c a b c": N=6; uni a/b/c=2; bi (a,b)=2 (b,c)=2
  // (c,a)=1; tri (a,b,c)=2 (b,c,a)=1 (c,a,b)=1
  private def run(valText: String) = {
    val docs = Seq((0L, "a b c a b c"), (1L, valText))
      .toDF("doc_id", "text")
    graft.operators.Frequency.backoffSurprisal(docs, "doc_id",
        graft.functions.TextFunctions.tokenize(lower(col("text"))),
        isTrain = col("doc_id") === 0L)
      .select(col("doc_id"), col("n_tokens"), col("bits_sum"),
        col("oov_ct"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
  }

  test("hand-traced backoff ladder on a val doc") {
    // "a b c d b": a=⌊lg 6/2⌋=1; (a,b)=⌊lg 2/2⌋=0; (a,b,c)=⌊lg 2/2⌋=0;
    // d: tri+bi miss, OOV → ⌊lg 6⌋+2 = 4; b after (c,d): tri+bi miss,
    // uni b → ⌊lg 6/2⌋+2 = 3. Σ=8, oov=1
    val got = run("a b c d b")
    assert(got(1L) === ((5L, 8L, 1L)))
    // the train doc against its own counts: 1,0,0,⌊lg 2/1⌋ wait —
    // (b,c,a): c2ctx(b,c)=2, c3=1 → 1; (c,a,b): c2ctx(c,a)=1, c3=1 → 0;
    // (a,b,c) → 0. Σ = 1+0+0+1+0+0 = 2
    assert(got(0L) === ((6L, 2L, 0L)))
  }

  test("an unseen bigram backs off at exactly one bit") {
    // "b a": b=1 bit; (b,a) unseen bigram (only (c,a) trains), uni
    // a=2 → ⌊lg(6/2)⌋ + 1 = 2. Σ=3, oov=0
    val got = run("b a")
    assert(got(1L) === ((2L, 3L, 0L)))
  }
}

class CompactChangelogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("one row per (key, bucket): the bucket's last change, tombstones kept") {
    // bucket = seq DIV 10
    val feed = Seq(
      ("A", 1L, "insert", 10), ("A", 2L, "update", 11), // bucket 0
      ("A", 13L, "update", 12),                         // bucket 1
      ("D", 1L, "delete", 0), ("D", 12L, "insert", 40)) // tombstone kept
      .toDF("k", "seq", "op", "v")
    val got = graft.sources.CdcRouter.compactChangelog(feed, Seq("k"),
        Seq("seq"), bucket = expr("seq DIV 10"), bucketName = "day")
      .select(col("k"), col("day"), col("seq"), col("op"), col("v"))
      .as[(String, Long, Long, String, Int)].collect().toSet
    assert(got === Set(
      ("A", 0L, 2L, "update", 11),
      ("A", 1L, 13L, "update", 12),
      ("D", 0L, 1L, "delete", 0),   // the tombstone row r5 would drop
      ("D", 1L, 12L, "insert", 40)))
  }

  test("replaying compacted buckets through latestState equals the full feed") {
    val feed = Seq(
      ("A", 1L, "insert", 10), ("A", 2L, "update", 11),
      ("A", 13L, "delete", 0),
      ("B", 3L, "insert", 20), ("B", 14L, "update", 21))
      .toDF("k", "seq", "op", "v")
    val compacted = graft.sources.CdcRouter.compactChangelog(feed,
      Seq("k"), Seq("seq"), bucket = expr("seq DIV 10"))
    def latest(df: org.apache.spark.sql.DataFrame) =
      graft.sources.CdcRouter.latestState(
          df.select(col("k"), col("seq"), col("op"), col("v")),
          Seq("k"), Seq("seq"))
        .select(col("k"), col("v")).as[(String, Int)].collect().toMap
    assert(latest(compacted) === latest(feed))
    assert(latest(feed) === Map("B" -> 21)) // A ends deleted
  }
}

class SeasonalOutliersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("flags exactly the days the plain-Scala replica flags") {
    // the SeasonalDecomposeSpec counts plus one injected anomaly day
    val counts: Seq[Long] =
      Seq(10, 12, 11, 10, 30, 31, 9, 10, 12, 200, 10, 30, 31, 9)
        .map(_.toLong)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (0L until c).map(k => ("click", new java.sql.Timestamp(
        d * 86400000L + 43200000L + k)))
    }
    val got = graft.operators.Series.seasonalOutliers(
        rows.toDF("event_type", "ts"), "event_type", "ts",
        kPermille = 2000L)
      .select(col("day")).as[Long].collect().toSet

    // replica: decomposition + median/MAD gate
    val n = counts.length
    val trend = (0 until n).map { i =>
      val win = counts.slice(math.max(0, i - 3), math.min(n - 1, i + 3) + 1)
      math.floor(win.sum.toDouble / win.length).toLong
    }
    val det = counts.zip(trend).map { case (c, t) => c - t }
    val seas = (0 until n).groupBy(i => (i + 3) % 7).map { case (wd, is) =>
      wd -> math.floor(is.map(det).sum.toDouble / is.length).toLong
    }
    val resid = (0 until n).map(i => (det(i) - seas((i + 3) % 7)).toDouble)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val med = median(resid)
    val mad = median(resid.map(r => math.abs(r - med)))
    val want = (0 until n).filter(i =>
      math.abs(resid(i) - med) * 1000 > 2000 * mad).map(_.toLong).toSet
    assert(got === want)
    assert(got.contains(9L)) // the injected 200-count day must alarm
  }
}

class LshPlanSpec extends AnyFunSuite {

  test("threshold 0.5 at width 8 picks the flatter (b=4, r=2) curve") {
    // the deployed d2 config (b=2, r=4) has its S-curve midpoint at
    // (1/b)^(1/r) ≈ 0.84 — it under-recalls at 0.5 and leans on the
    // d3 verify; the planner's (4, 2) midpoint ≈ 0.5 catches 3.3×
    // more of the above-threshold mass for ~2.3× the verify load
    val p = graft.operators.Dedup.lshPlan(threshold = 0.5,
      maxSignature = 8)
    assert((p.bands, p.rowsPerBand) === ((4, 2)))
    assert(p.fn < 0.05 && p.fp < 0.2)
  }

  test("higher thresholds pick steeper curves (more rows per band)") {
    val lo = graft.operators.Dedup.lshPlan(0.2, maxSignature = 16)
    val hi = graft.operators.Dedup.lshPlan(0.9, maxSignature = 16)
    assert(hi.rowsPerBand > lo.rowsPerBand)
  }

  test("a wider signature budget never yields a worse plan") {
    val w = 4.0
    val small = graft.operators.Dedup.lshPlan(0.5, maxSignature = 4, w)
    val big = graft.operators.Dedup.lshPlan(0.5, maxSignature = 16, w)
    assert(big.cost(w) <= small.cost(w))
  }

  test("empirical: the planner's curve recalls at least as many true pairs") {
    // the analytic claim checked on real data — the planner's (4, 2)
    // banding must catch >= the 0.5-threshold pairs the deployed
    // steeper (2, 4) curve catches on the sf0.001 corpus
    val spark = TestSpark.spark
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def caught(b: Int, r: Int): Long =
      graft.operators.Dedup.nearDupPairs(docs, threshold = 0.5,
        bands = b, rowsPerBand = r).count()
    val p = graft.operators.Dedup.lshPlan(0.5, maxSignature = 8)
    val planned = caught(p.bands, p.rowsPerBand)
    val deployed = caught(2, 4)
    assert(planned >= deployed, s"planned $planned < deployed $deployed")
    assert(planned > 0L)
  }
}

class ShardingNullIdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("null-id rows are excluded; survivors still rank contiguously") {
    val df = (Seq[java.lang.Long](1L, 2L, 3L, null, 4L, null))
      .toDF("id")
    val out = Sharding.epochShards(df, "id", numShards = 2)
      .as[(Long, Long, Int)].collect()
    assert(out.length === 4)
    assert(out.map(_._2).sorted.toSeq === Seq(0L, 1L, 2L, 3L))
    val w = Sharding.epochShardsByWeight(df, "id", lit(5L), numShards = 2)
      .as[(Long, Long, Int)].collect()
    assert(w.length === 4)
    assert(w.map(_._2).sorted.toSeq === Seq(0L, 1L, 2L, 3L))
  }
}

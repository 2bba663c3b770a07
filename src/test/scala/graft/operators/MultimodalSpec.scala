package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")

  test("metadata: byte length, sha, header from the payload bytes") {
    val row1 = Multimodal.withMetadata(Multimodal.withPayload(docs))
      .filter($"doc_id" === 1L)
      .select("byte_len", "sha", "header_hex").collect().head
    assert(row1.getInt(0) === 11)
    assert(row1.getString(1) ===
      "b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9")
    assert(row1.getString(2) === "68656C6C".toUpperCase) // 'hell'
  }

  test("harness documents corpus is pure ASCII (the m1–m4 oracle contract)") {
    // The multimodal oracles equate DuckDB's character math
    // (ord/substr/strlen) with the operators' UTF-8 byte math — valid
    // only while the stand-in corpus is ASCII. Regenerated fixtures
    // with real multi-byte text must fail HERE, not silently diverge
    // in three oracles at once.
    val nonAscii = TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(not(col("text").rlike("^[\\x00-\\x7F]*$"))).count()
    assert(nonAscii === 0L)
  }

  test("decode is batch-shape invariant: batchSize never changes results") {
    val many = (1L to 30L).map(i => (i, s"payload number $i")).toDF("doc_id", "text")
    val full = Multimodal.decode(Multimodal.withPayload(many), batchSize = 256)
      .select("doc_id", "width", "height").as[(Long, Int, Int)].collect().toSet
    val tiny = Multimodal.decode(Multimodal.withPayload(many), batchSize = 3)
      .select("doc_id", "width", "height").as[(Long, Int, Int)].collect().toSet
    assert(full === tiny && full.size === 30)
  }

  test("decode runs per-partition, is deterministic, handles empty payloads") {
    val out = Multimodal.decode(Multimodal.withPayload(docs))
      .select("doc_id", "width", "height", "channels")
      .as[(Long, Int, Int, Int)].collect()
      .map { case (id, w, h, c) => id -> ((w, h, c)) }.toMap
    val (w1, h1, _) = out(1L)
    assert(w1 === ('h'.toInt % 64) * 16 + 64)
    assert(h1 === ('e'.toInt % 64) * 16 + 64)
    assert(out(2L) === ((64, 64, 3))) // empty payload → defaults
    // determinism
    val again = Multimodal.decode(Multimodal.withPayload(docs))
      .select("doc_id", "width").as[(Long, Int)].collect().toMap
    assert(again(1L) === w1)
  }

  test("resize stamps target dims, scale factors, and rescales features") {
    val out = Multimodal.resize(
        Multimodal.decode(Multimodal.withPayload(docs)), 224, 224)
      .filter($"doc_id" === 1L)
      .select("width", "height", "scale_x", "scale_y", "features")
      .as[(Int, Int, Double, Double, Seq[Float])].collect().head
    val w0 = ('h'.toInt % 64) * 16 + 64
    val h0 = ('e'.toInt % 64) * 16 + 64
    assert(out._1 === 224 && out._2 === 224)
    assert(out._3 === w0.toDouble / 224 && out._4 === h0.toDouble / 224)
    val orig = Multimodal.decode(Multimodal.withPayload(docs))
      .filter($"doc_id" === 1L).select("features").as[Seq[Float]].head()
    val ratio = (w0.toDouble / 224) * (h0.toDouble / 224)
    assert(out._5 === orig.map(f => (f / ratio).toFloat))
  }

  test("frame sampling emits n digests per row") {
    val out = Multimodal.sampleFrames(Multimodal.withPayload(docs), n = 4)
      .filter($"doc_id" === 1L)
      .select("frame_digests").as[Seq[String]].head()
    assert(out.size === 4)
    // frame 0 of "hello world" is bytes [0,16) = the whole string
    assert(out.head === java.security.MessageDigest.getInstance("MD5")
      .digest("hello world".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString)
  }

  test("frame overlap pairs payloads sharing digests, never unrelated ones") {
    // 64-byte payloads: 1 and 2 identical (share all 4 frames); 3
    // shares only the first 16 bytes (frame 0); 4 disjoint
    val p1 = "A" * 16 + "B" * 16 + "C" * 16 + "D" * 16
    val p3 = "A" * 16 + "x" * 48
    val p4 = "z" * 64
    val df = Seq((1L, p1), (2L, p1), (3L, p3), (4L, p4))
      .toDF("doc_id", "text")
      .select($"doc_id", $"text".cast("binary").as("payload"))
    val out = Multimodal.frameOverlapPairs(df, n = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 2L, 4L), (1L, 3L, 1L), (2L, 3L, 1L)))
    // threshold: only the full-copy pair survives minShared = 2
    val strict = Multimodal.frameOverlapPairs(df, n = 4, minShared = 2L)
      .as[(Long, Long, Long)].collect().toSet
    assert(strict === Set((1L, 2L, 4L)))
  }

  test("degenerate digests shared by too many payloads are capped out") {
    // 5 payloads share frame 0; a disjoint near-pair must survive
    val common = "A" * 16
    val qr = "Q" * 16 + "R" * 16 + "S" * 16 + "T" * 16
    val rows = (1L to 5L).map(i => (i, common + i.toString * 48)) ++
      Seq((6L, qr), (7L, qr))
    val df = rows.toDF("doc_id", "text")
      .select($"doc_id", $"text".cast("binary").as("payload"))
    val capped = Multimodal.frameOverlapPairs(df, n = 4, maxBucket = 4L)
      .as[(Long, Long, Long)].collect().toSet
    assert(capped === Set((6L, 7L, 4L)))
  }

  /** Plain-Scala replica of perceptualHash48: sample 48 evenly spaced
    * bytes, integer mean, threshold bits.
    */
  private def phashRef(s: String): Long = {
    val bytes = s.getBytes("UTF-8")
    val samples = (0 until 48).map { i =>
      if (bytes.isEmpty) 0L
      else (bytes((i.toLong * bytes.length / 48).toInt) & 0xff).toLong
    }
    val mean = samples.sum / 48
    samples.zipWithIndex.map { case (v, i) =>
      if (v >= mean) 1L << i else 0L
    }.sum
  }

  test("perceptualHash48 matches the plain-Scala aHash replica") {
    val rows = Seq((1L, "the quick brown fox jumps over the lazy dog " * 3),
      (2L, "abcdefgh" * 12), (3L, "zzzz"), (4L, ""))
    val got = Multimodal.perceptualHash48(
        rows.toDF("doc_id", "text")
          .select($"doc_id", $"text".cast("binary").as("payload")))
      .select($"doc_id", $"phash").as[(Long, Long)].collect().toMap
    for ((id, s) <- rows) assert(got(id) === phashRef(s), s"doc $id")
  }

  test("perceptual near-dup: exact copies at distance 0, banding is exact") {
    // a and b are byte-identical -> distance 0; c differs in a couple
    // of sampled regions; d is unrelated noise
    val base = "spark engine row batch shuffle partition " * 4
    val rows = Seq((1L, base), (2L, base),
      (3L, base.replace("shuffle", "shuffIe")),
      (4L, "qqq www eee rrr ttt yyy uuu iii ooo ppp " * 4))
    val df = rows.toDF("doc_id", "text")
      .select($"doc_id", $"text".cast("binary").as("payload"))
    val got = Multimodal.perceptualNearDup(df, maxHamming = 7)
      .as[(Long, Long, Long)].collect().toSet
    // brute-force reference over the replica hashes
    val sigs = rows.map { case (id, s) => id -> phashRef(s) }
    val want = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      d = java.lang.Long.bitCount(sa ^ sb) if d <= 7
    } yield (a, b, d.toLong)).toSet
    assert(got === want)
    assert(want.contains((1L, 2L, 0L)), "exact copies must collide at 0")
  }

  test("hammingBandPairs rejects invalid band splits and sign-bit widths") {
    val sigs = Seq((1L, 5L)).toDF("doc_id", "sig")
    intercept[IllegalArgumentException](
      Dedup.hammingBandPairs(sigs, "doc_id", "sig", bits = 48, maxHamming = 4))
    intercept[IllegalArgumentException](
      Dedup.hammingBandPairs(sigs, "doc_id", "sig", bits = 64, maxHamming = 3))
  }

  test("hammingBandCandidates: pigeonhole guarantee and measured miss") {
    // 8-bit signatures, pairs at known Hamming distances
    val sigs = Seq(
      (1L, 0xF0L),            // 1111 0000
      (2L, 0xF1L),            // hamming(1,2) = 1
      (3L, 0x0FL),            // hamming(1,3) = 8
      (4L, 0xC3L))            // hamming(1,4) = 4 (2 per 4-bit half)
      .toDF("doc_id", "sig")
    def cand(bands: Int): Set[(Long, Long)] =
      Dedup.hammingBandCandidates(sigs, "doc_id", "sig",
          bits = 8, bands = bands)
        .as[(Long, Long)].collect().toSet
    // bands=2 (width 4): catches hamming<=1 by pigeonhole — (1,2)
    // shares the high nibble; (1,4) differs in BOTH nibbles -> missed
    val two = cand(2)
    assert(two.contains((1L, 2L)))
    assert(!two.contains((1L, 4L)), "both bands differ -> no candidate")
    // bands=4 (width 2): (1,4)'s diffs are 1 bit per nibble but 2 of
    // the 4 two-bit bands still agree -> candidate appears
    assert(cand(4).contains((1L, 4L)))
    // bands=1: whole-signature equality only
    assert(cand(1) === Set.empty)
    // bands must divide bits
    intercept[IllegalArgumentException](
      Dedup.hammingBandCandidates(sigs, "doc_id", "sig", bits = 8,
        bands = 3))
  }
}

class PpmDecodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ppm(header: String, pixels: Array[Byte]): Array[Byte] =
    header.getBytes("UTF-8") ++ pixels

  test("parsePpm reads a well-formed P6 exactly") {
    // 2x1 pixels: (10,20,30), (40,50,60)
    val bytes = ppm("P6\n2 1\n255\n",
      Array[Byte](10, 20, 30, 40, 50, 60))
    assert(Multimodal.parsePpm(bytes) === Some((2, 1, 255, 50L, 70L, 90L)))
  }

  test("parsePpm tolerates comments, extra whitespace, and high bytes") {
    val bytes = ppm("P6 # a comment\n # another\n 2\t1 \r\n200\n",
      Array[Byte](-1, 0, 127, 1, 2, 3)) // 0xff must read as 255
    assert(Multimodal.parsePpm(bytes) === Some((2, 1, 200, 256L, 2L, 130L)))
  }

  test("parsePpm rejects malformed containers") {
    // wrong magic
    assert(Multimodal.parsePpm("P5\n1 1\n255\n xyz".getBytes) === None)
    // truncated raster (header promises 2 pixels, data has 1)
    assert(Multimodal.parsePpm(
      ppm("P6\n2 1\n255\n", Array[Byte](1, 2, 3))) === None)
    // maxval out of the 1-byte range
    assert(Multimodal.parsePpm(
      ppm("P6\n1 1\n999\n", Array[Byte](1, 2, 3))) === None)
    // missing header int
    assert(Multimodal.parsePpm("P6\n2\n255\n".getBytes) === None)
    assert(Multimodal.parsePpm(null) === None)
    assert(Multimodal.parsePpm(Array.emptyByteArray) === None)
  }

  test("decodePpm inverts withPpmPayload; malformed rows surface ok=false") {
    val df = Seq(
      (1L, "abcdefghijklmnopqrstuvwxyz0123456789 abcdefghijk"), // 48 chars
      (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Multimodal.decodePpm(Multimodal.withPpmPayload(df))
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    val len = 48
    val w = 1 + len % 7 // 7
    val h = (len / 3) / w // 2
    assert(r1.getBoolean(1) === true)
    assert(r1.getInt(2) === w && r1.getInt(3) === h)
    assert(r1.getLong(5) === w.toLong * h)
    // channel means from the construction: pixel bytes are the first
    // w*h*3 chars, channel = index % 3
    val text = "abcdefghijklmnopqrstuvwxyz0123456789 abcdefghijk"
    val px = text.take(w * h * 3).getBytes("UTF-8")
    def mean(c: Int) = px.zipWithIndex.collect {
      case (b, i) if i % 3 == c => (b & 0xff).toLong
    }.sum / (w * h)
    assert(r1.getLong(6) === mean(0))
    assert(r1.getLong(7) === mean(1))
    assert(r1.getLong(8) === mean(2))
    // null payload → ok=false, null means
    val r2 = out(2L)
    assert(r2.getBoolean(1) === false && r2.isNullAt(6))
  }

  test("decodePpm is batch-shape invariant") {
    val many = (1L to 40L)
      .map(i => (i, ("word " * (10 + (i % 13)).toInt).trim))
      .toDF("doc_id", "text")
    def run(bs: Int) =
      Multimodal.decodePpm(Multimodal.withPpmPayload(many), batchSize = bs)
        .select("doc_id", "width", "height", "mean_r", "mean_g", "mean_b")
        .as[(Long, Int, Int, Option[Long], Option[Long], Option[Long])]
        .collect().toSet
    assert(run(256) === run(3))
  }
}

class WavDecodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def wav(samples: Seq[Int], rate: Int = 8000, ch: Int = 1,
                  extraChunk: Boolean = false): Array[Byte] = {
    val data = samples.flatMap(le16).toArray
    val junk = if (extraChunk) "JUNK".getBytes ++ le32(3) ++
      Array[Byte](1, 2, 3, 0) else Array.emptyByteArray // odd size + pad
    val body = junk ++ "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(ch) ++
      le32(rate) ++ le32(rate * 2 * ch) ++ le16((2 * ch)) ++ le16(16) ++
      "data".getBytes ++ le32(data.length) ++ data
    "RIFF".getBytes ++ le32(4 + body.length) ++ "WAVE".getBytes ++ body
  }

  test("parseWav reads fmt fields and signed sample stats exactly") {
    val out = Multimodal.parseWav(wav(Seq(100, -200, 32767, -32768, 0)))
    assert(out === Some((1, 8000, 16, 5L, 100L - 200L + 32767L - 32768L, 32768L)))
  }

  test("parseWav walks unknown chunks honoring the odd-size pad byte") {
    val out = Multimodal.parseWav(wav(Seq(5, -5), extraChunk = true))
    assert(out === Some((1, 8000, 16, 2L, 0L, 5L)))
  }

  test("parseWav rejects malformed containers") {
    assert(Multimodal.parseWav(null) === None)
    assert(Multimodal.parseWav("RIFX1234WAVE".getBytes) === None)
    // truncated data chunk (header promises 4 bytes, has 2)
    val good = wav(Seq(1, 2))
    assert(Multimodal.parseWav(good.dropRight(2)) === None)
    // non-PCM format code
    val nonPcm = good.clone()
    nonPcm(20) = 3 // fmt format field
    assert(Multimodal.parseWav(nonPcm) === None)
  }

  test("decodeWav inverts withWavPayload on ASCII text rows") {
    val text = "abcdefghijklmnopqrstuvwxyz0123456789" // 36 >= 32 chars
    val df = Seq((1L, text), (2L, "short")).toDF("doc_id", "text")
    val out = Multimodal.decodeWav(Multimodal.withWavPayload(df))
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getBoolean(1) === true)
    assert(r1.getInt(2) === 1 && r1.getInt(3) === 8000 && r1.getInt(4) === 16)
    assert(r1.getLong(5) === 16L)
    val samples = text.take(32).getBytes.grouped(2)
      .map { case Array(lo, hi) => (lo & 0xff) + 256 * (hi & 0xff) }.toSeq
    assert(r1.getLong(6) === samples.map(_.toLong).sum)
    assert(r1.getLong(7) === samples.max.toLong)
    // too-short text -> null payload -> ok=false
    assert(out(2L).getBoolean(1) === false && out(2L).isNullAt(6))
  }
}

class DecodedPhashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ppm(header: String, pixels: Array[Byte]): Array[Byte] =
    header.getBytes("UTF-8") ++ pixels

  test("ppmBlockHash: hand-computed block bits at blocks = 4") {
    // 2x2 pixels, lumas 0/30/60/90 -> gm = 45; blocks map 1:1 to
    // pixels -> bits at p2 (60) and p3 (90): sig = 0b1100 = 12
    val bytes = ppm("P6\n2 2\n255\n", Array[Byte](
      0, 0, 0, 10, 10, 10, 20, 20, 20, 30, 30, 30))
    assert(Multimodal.ppmBlockHash(bytes, 4) === Some((4L, 12L)))
  }

  test("decoded phash survives a header rewrite; byte phash does not") {
    val px = Array.tabulate[Byte](30)(i => (i * 7 % 101).toByte)
    val a = ppm("P6\n5 2\n255\n", px)
    val b = ppm("P6 # re-encoded\n# by another tool\n 5  2\n255\n", px)
    assert(a.toSeq !== b.toSeq)
    assert(Multimodal.ppmBlockHash(a, 48) === Multimodal.ppmBlockHash(b, 48))
    // the byte-level sampler sees the header noise
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "payload")
    val bytePh = Multimodal.perceptualHash48(df)
      .select("phash").as[Long].collect()
    assert(bytePh(0) !== bytePh(1))
  }

  test("malformed payloads surface ok=false; empty raster hashes 0") {
    val rows = Seq(
      (1L, "not a ppm".getBytes),
      (2L, ppm("P6\n0 5\n255\n", Array.empty[Byte])))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodedPhash(rows)
      .as[(Long, Boolean, Long, Long)].collect().sortBy(_._1)
    assert(out === Array((1L, false, 0L, 0L), (2L, true, 0L, 0L)))
  }

  test("decodedNearDup: banded pairs equal brute force; empties excluded") {
    val rnd = new scala.util.Random(7)
    def raster(seed: Int): Array[Byte] =
      Array.tabulate[Byte](48)(i => ((i * seed + seed) % 97).toByte)
    val payloads = (1L to 12L).map { i =>
      (i, ppm("P6\n4 4\n255\n", raster(rnd.nextInt(3) + 1)))
    } :+ (13L, ppm("P6\n0 3\n255\n", Array.empty[Byte])) :+
      (14L, ppm("P6\n0 3\n255\n", Array.empty[Byte]))
    val df = payloads.toDF("doc_id", "payload")
    val banded = Multimodal.decodedNearDup(df, maxHamming = 5)
      .as[(Long, Long, Long)].collect().toSet
    // brute force over the same signatures
    val sigs = payloads.flatMap { case (id, b) =>
      Multimodal.ppmBlockHash(b, 48).collect {
        case (n, s) if n > 0 => (id, s)
      }
    }
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 5
    } yield (ia, ib, h.toLong)).toSet
    assert(banded === brute)
    assert(brute.nonEmpty)
    // the two empty rasters never pair despite identical signatures
    assert(!banded.exists(p => p._1 == 13L || p._2 == 13L || p._2 == 14L))
  }
}

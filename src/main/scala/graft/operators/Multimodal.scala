package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * The Spark-side plumbing (schemas, batch-shaped partition iteration,
  * deterministic partitioning of large blobs) is real and tested; the
  * actual media decode is STUBBED with a deterministic fake — the
  * container has no image/audio codecs. Production swaps
  * [[decodeStub]] for a JNI/codec call with the identical signature;
  * nothing else changes.
  *
  * Scale notes: blobs never pass through a shuffle — metadata is
  * extracted map-side and only (id, small-struct) rows move. The
  * decode runs in `mapPartitions` so per-partition codec state
  * (decoder instances, model weights) is initialized once per task,
  * the same economics as a Pandas-UDF batch on PySpark.
  */
object Multimodal {

  /** Harness stand-in: materialize a binary payload column (UTF-8 of
    * the text) — real deployments read actual bytes
    * (`format("binaryFile")` or a blob-store table).
    */
  def withPayload(df: DataFrame, textCol: String = "text",
                  payloadCol: String = "payload"): DataFrame =
    df.withColumn(payloadCol, col(textCol).cast(BinaryType))

  /** Map-side metadata: byte length, content digest, leading bytes as
    * a hex "header" (magic-number sniffing shape).
    */
  def withMetadata(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("byte_len", length(col(payloadCol)))
      .withColumn("sha", sha2(col(payloadCol), 256))
      .withColumn("header_hex", upper(hex(substring(col(payloadCol), 1, 4))))

  /** Blob exact dedup — the tier-0 media dedup every multimodal
    * pipeline runs before any perceptual pass: group payloads by
    * content digest, keep the lowest id, count the copies. Bytes
    * never shuffle — only (digest, id) pairs cross the exchange, and
    * the digest is computed inside the scan projection (the d1 text
    * contract applied to binary columns).
    */
  def blobDedup(df: DataFrame, idCol: String = "doc_id",
                payloadCol: String = "payload"): DataFrame =
    df.groupBy(sha2(col(payloadCol), 256).as("sha"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("dup_ct"))

  /** Decoded-media row: what a real image decode would yield. */
  case class DecodedFrame(doc_id: Long, width: Int, height: Int,
      channels: Int, features: Array[Float])

  /** Deterministic fake decode of one payload: dims derived from the
    * first bytes, an 8-dim "feature vector" from a rolling byte hash.
    * Replace with a real codec in production — signature is the seam.
    */
  private[operators] def decodeStub(id: Long,
      bytesOrNull: Array[Byte]): DecodedFrame = {
    // null payloads (missing blobs) decode like empty ones instead of
    // NPE-ing the partition
    val bytes = if (bytesOrNull == null) Array.emptyByteArray else bytesOrNull
    val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
    val width = (b0 % 64) * 16 + 64
    val height = (b1 % 64) * 16 + 64
    val feats = new Array[Float](8)
    var acc = 17L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xff)) % 1000000007L
      feats(i % 8) = ((feats(i % 8) + acc % 997) % 997).toFloat
      i += 1
    }
    DecodedFrame(id, width, height, 3, feats)
  }

  /** Batch decode: one decoder per partition, rows streamed through —
    * the Scala analogue of `mapInPandas`.
    *
    * `batchSize` gives the decode the batch shape a vectorized codec
    * (or an inference runtime scoring the feature vectors) wants:
    * rows are grouped into fixed-size chunks inside the partition and
    * handed to the kernel as a batch, exactly a Pandas-UDF batch's
    * economics — per-batch amortized codec calls, per-partition
    * amortized init, still fully streamed (grouped iterators never
    * materialize the partition).
    */
  def decode(df: DataFrame, idCol: String = "doc_id",
             payloadCol: String = "payload",
             batchSize: Int = 256): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    // typed Dataset mapPartitions, not .rdd: rows stay in Tungsten
    // binary format end to end (no Row boxing round-trip) and the
    // surrounding stages keep whole-stage codegen
    import df.sparkSession.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .filter(col(idCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens here (decoder/codec state)
        it.grouped(batchSize).flatMap { batch =>
          // per-batch call boundary (vectorized codec seam)
          batch.map { case (id, bytes) => decodeStub(id, bytes) }
        }
      }
      .toDF()
  }

  /** Synthesize a VALID binary PPM (P6) payload from a text row: header
    * `P6\n<w> <h>\n255\n` + the first w·h·3 text bytes as raw RGB
    * data. Dims derive deterministically from the text length
    * (w = 1 + len % 7, h = (len DIV 3) DIV w), so the DuckDB oracle
    * can replay the exact construction — while the DECODER
    * ([[decodePpm]]) sees only bytes and must genuinely parse them.
    * The binary-media analogue of [[withPayload]].
    */
  def withPpmPayload(df: DataFrame, textCol: String = "text",
                     payloadCol: String = "payload"): DataFrame = {
    val len = length(col(textCol))
    val w = lit(1) + pmod(len, lit(7))
    val h = expr(s"(length($textCol) DIV 3) DIV (1 + length($textCol) % 7)")
    df.withColumn(payloadCol,
      when(col(textCol).isNotNull,
        concat(lit("P6\n"), w.cast(StringType), lit(" "),
          h.cast(StringType), lit("\n255\n"),
          col(textCol).substr(lit(1), w * h * 3))
        .cast(BinaryType)))
  }

  /** One really-decoded PPM frame: dims and maxval parsed from the
    * header, per-channel integer pixel sums from the raw data.
    * Integer means (`sum DIV n_pixels`) keep the features
    * engine-exact.
    */
  case class PpmFrame(doc_id: Long, ok: Boolean, width: Int, height: Int,
      maxval: Int, n_pixels: Long,
      mean_r: Option[Long], mean_g: Option[Long], mean_b: Option[Long])

  /** A REAL pure-JVM decoder for the P6 (binary PPM) container: parse
    * the magic, the whitespace/comment-separated header ints, the
    * single whitespace after maxval, then read w·h RGB triples.
    * Returns None for anything malformed (wrong magic, bad ints,
    * maxval outside 1..255, truncated pixel data) — the row surfaces
    * as ok=false rather than poisoning the partition.
    */
  private[operators] def parsePpm(bytes: Array[Byte])
      : Option[(Int, Int, Int, Long, Long, Long)] =
    parsePpmRaster(bytes).map { case (w, h, mv, off) =>
      val n = w.toLong * h
      var sr = 0L; var sg = 0L; var sb = 0L
      var p = 0L
      while (p < n) {
        val o = off + (p * 3).toInt
        sr += bytes(o) & 0xff
        sg += bytes(o + 1) & 0xff
        sb += bytes(o + 2) & 0xff
        p += 1
      }
      (w, h, mv, sr, sg, sb)
    }

  /** The shared P6 header walk: magic, whitespace/comment-separated
    * header ints, the single whitespace after maxval, raster-length
    * validation. Returns (w, h, maxval, rasterOffset) or None for
    * anything malformed. [[parsePpm]] and [[ppmBlockHash]] consume
    * the same walk so the two decoders can never disagree about what
    * parses.
    */
  private[operators] def parsePpmRaster(bytes: Array[Byte])
      : Option[(Int, Int, Int, Int)] = {
    if (bytes == null || bytes.length < 2 ||
        bytes(0) != 'P' || bytes(1) != '6') return None
    var i = 2
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    // whitespace + '#'-to-end-of-line comments between header tokens
    def skipWs(): Unit = {
      var go = true
      while (go && i < bytes.length) {
        if (isWs(bytes(i))) i += 1
        else if (bytes(i) == '#') {
          while (i < bytes.length && bytes(i) != '\n') i += 1
        } else go = false
      }
    }
    def readInt(): Option[Int] = {
      skipWs()
      var v = 0L
      var any = false
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); any = true; i += 1
        if (v > Int.MaxValue) return None
      }
      if (any) Some(v.toInt) else None
    }
    for {
      w <- readInt()
      h <- readInt()
      mv <- readInt()
      if w >= 0 && h >= 0 && mv >= 1 && mv <= 255
      // exactly ONE whitespace byte separates maxval from raster data
      if i < bytes.length && isWs(bytes(i))
      _ = { i += 1 }
      if bytes.length - i >= w.toLong * h * 3
    } yield (w, h, mv, i)
  }

  /** Block-mean luma aHash over the DECODED raster: split the pixel
    * sequence into `blocks` contiguous runs (pixel p → block
    * ⌊p·blocks/n⌋), mean each block's luma (r+g+b, integer DIV), set
    * bit j iff block j is non-empty and its mean is ≥ the global
    * integer mean. This is [[perceptualHash48]]'s contract moved from
    * encoded BYTES to decoded PIXELS — the signature survives header
    * rewrites, comment insertion, and any container-level change that
    * leaves the raster alone, which byte-sampling cannot. All-integer
    * arithmetic: bit-reproducible and oracle-replayable from the
    * construction math.
    */
  private[operators] def ppmBlockHash(bytes: Array[Byte],
                                      blocks: Int): Option[(Long, Long)] =
    parsePpmRaster(bytes).map { case (w, h, _, off) =>
      val n = w.toLong * h
      if (n == 0L) (0L, 0L)
      else {
        val bsum = new Array[Long](blocks)
        val bcnt = new Array[Long](blocks)
        var tot = 0L
        var p = 0L
        while (p < n) {
          val o = off + (p * 3).toInt
          val luma = (bytes(o) & 0xff) + (bytes(o + 1) & 0xff) +
            (bytes(o + 2) & 0xff)
          val j = (p * blocks / n).toInt
          bsum(j) += luma; bcnt(j) += 1; tot += luma
          p += 1
        }
        val gm = tot / n
        var sig = 0L
        var j = 0
        while (j < blocks) {
          if (bcnt(j) > 0 && bsum(j) / bcnt(j) >= gm) sig |= 1L << j
          j += 1
        }
        (n, sig)
      }
    }

  /** Batch PPM decode through the same mapPartitions seam as
    * [[decode]] — per-partition init, fixed-size batches, rows
    * streamed — but with [[parsePpm]] doing real byte-level work
    * where [[decodeStub]] fakes it. Null/malformed payloads emit
    * ok=false rows (zero dims, null means).
    */
  def decodePpm(df: DataFrame, idCol: String = "doc_id",
                payloadCol: String = "payload",
                batchSize: Int = 256): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    import df.sparkSession.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .filter(col(idCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            parsePpm(bytes) match {
              case Some((w, h, mv, sr, sg, sb)) =>
                val n = w.toLong * h
                def mean(s: Long) = if (n > 0) Some(s / n) else None
                PpmFrame(id, ok = true, w, h, mv, n,
                  mean(sr), mean(sg), mean(sb))
              case None =>
                PpmFrame(id, ok = false, 0, 0, 0, 0L, None, None, None)
            }
          }
        }
      }
      .toDF()
  }

  /** One decoded-raster perceptual signature row. */
  case class PpmHash(doc_id: Long, ok: Boolean, n_pixels: Long, phash: Long)

  /** Batch [[ppmBlockHash]] through the same mapPartitions seam as
    * [[decodePpm]]: (id, ok, n_pixels, phash) per payload, ok=false
    * for malformed bytes.
    */
  def decodedPhash(df: DataFrame, idCol: String = "doc_id",
                   payloadCol: String = "payload", blocks: Int = 48,
                   batchSize: Int = 256): DataFrame = {
    require(blocks >= 1 && blocks <= 62,
      s"blocks must be in [1, 62], got $blocks")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    import df.sparkSession.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .filter(col(idCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            ppmBlockHash(bytes, blocks) match {
              case Some((n, sig)) => PpmHash(id, ok = true, n, sig)
              case None => PpmHash(id, ok = false, 0L, 0L)
            }
          }
        }
      }
      .toDF()
  }

  /** Decoded-CONTENT near-duplicate pairs: [[decodedPhash]] signatures
    * within `maxHamming` bits via the shared pigeonhole-exact band
    * join — [[perceptualNearDup]] upgraded from byte texture to
    * decoded pixels. Empty rasters (n_pixels = 0, all signatures 0)
    * are excluded: they would form one degenerate all-pairs bucket
    * while sharing no content.
    */
  def decodedNearDup(df: DataFrame, maxHamming: Int = 5,
                     idCol: String = "doc_id",
                     payloadCol: String = "payload",
                     maxBucket: Int = Int.MaxValue): DataFrame =
    Dedup.hammingBandPairs(
      decodedPhash(df, idCol, payloadCol)
        .filter(col("ok") && col("n_pixels") > 0L)
        .select(col(idCol), col("phash")),
      idCol, "phash", bits = 48, maxHamming = maxHamming,
      maxBucket = maxBucket)

  /** Synthesize a VALID 16-bit mono PCM WAV payload from a text row:
    * a constant RIFF/WAVE header (PCM, 1 channel, 8 kHz, 16-bit,
    * 16 frames = 32 data bytes) + the first 32 text bytes as
    * little-endian samples. Header bytes ride `unhex` so every byte
    * is exact (a string literal would UTF-8-mangle 0x80+). The audio
    * tier of [[withPpmPayload]]'s contract: construction the oracle
    * replays, bytes the decoder must genuinely parse.
    */
  def withWavPayload(df: DataFrame, textCol: String = "text",
                     payloadCol: String = "payload"): DataFrame = {
    val headerHex =
      "52494646" + "44000000" + "57415645" + // RIFF <68> WAVE
        "666d7420" + "10000000" +            // fmt  <16>
        "0100" + "0100" +                    // PCM, 1 channel
        "401f0000" + "803e0000" +            // 8000 Hz, 16000 B/s
        "0200" + "1000" +                    // block align 2, 16 bit
        "64617461" + "20000000"              // data <32>
    df.withColumn(payloadCol,
      when(col(textCol).isNotNull && length(col(textCol)) >= 32,
        concat(unhex(lit(headerHex)),
          col(textCol).substr(1, 32).cast(BinaryType))))
  }

  /** One decoded PCM clip: fmt-chunk fields + integer sample stats
    * (sum and peak |amplitude| — no division, so values are
    * engine-exact even for negative samples).
    */
  case class WavClip(doc_id: Long, ok: Boolean, channels: Int,
      sample_rate: Int, bits_per_sample: Int, n_samples: Long,
      sum_amp: Option[Long], peak_amp: Option[Long])

  /** A REAL RIFF/WAVE parser: verify the RIFF magic and WAVE form,
    * WALK the chunk list (skipping unknown chunks, honoring RIFF's
    * odd-size pad byte), read the fmt chunk (must be integer PCM,
    * 16-bit), then fold the data chunk's little-endian signed
    * samples. None for anything malformed or truncated.
    */
  private[operators] def parseWav(bytes: Array[Byte])
      : Option[(Int, Int, Int, Long, Long, Long)] =
    wavPcmLayout(bytes).map { case (ch, rate, bits, off, size) =>
      def u8(i: Int) = bytes(i) & 0xff
      def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
      val n = size / 2 // samples across channels
      var sum = 0L
      var peak = 0L
      var k = 0
      while (k < n) {
        val v = le16(off + 2 * k).toShort.toLong // signed
        sum += v
        if (math.abs(v) > peak) peak = math.abs(v)
        k += 1
      }
      (ch, rate, bits, (n / ch).toLong, sum, peak)
    }

  /** The shared RIFF/WAVE chunk walk: verify magic and form, skip
    * unknown chunks (honoring RIFF's odd-size pad byte), read the fmt
    * chunk (must be integer PCM, 16-bit), locate the data chunk.
    * Returns (channels, rate, bits, dataOffset, dataSize) or None for
    * anything malformed or truncated. [[parseWav]] and
    * [[parseWavSamples]] both consume this walk, so the stats decoder
    * and the fingerprint decoder can never disagree about what parses.
    */
  private def wavPcmLayout(bytes: Array[Byte])
      : Option[(Int, Int, Int, Int, Int)] = {
    if (bytes == null || bytes.length < 12) return None
    def u8(i: Int) = bytes(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int) = new String(bytes, i, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    if (le32(4) + 8 > bytes.length) return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // format, ch, rate, bits
    var data: Option[(Int, Int)] = None          // offset, size
    while (i + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(i)
      val sz = le32(i + 4)
      if (sz < 0 || i + 8 + sz > bytes.length) return None
      val szi = sz.toInt
      if (id == "fmt ") {
        if (szi < 16) return None
        fmt = Some((le16(i + 8), le16(i + 10), le32(i + 12).toInt,
          le16(i + 22)))
      } else if (id == "data") {
        data = Some((i + 8, szi))
      }
      i += 8 + szi + (szi & 1) // RIFF pads odd chunks to even
    }
    for {
      (format, ch, rate, bits) <- fmt
      (off, size) <- data
      if format == 1 && bits == 16 && ch >= 1 && size % (2 * ch) == 0
    } yield (ch, rate, bits, off, size)
  }

  /** Batched WAV decode through the shared mapPartitions seam (the m2
    * economics; [[decodePpm]]'s audio sibling). Malformed/null
    * payloads emit ok=false rows.
    */
  def decodeWav(df: DataFrame, idCol: String = "doc_id",
                payloadCol: String = "payload",
                batchSize: Int = 256): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    import df.sparkSession.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .filter(col(idCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            parseWav(bytes) match {
              case Some((ch, rate, bits, n, sum, peak)) =>
                WavClip(id, ok = true, ch, rate, bits, n,
                  Some(sum), Some(peak))
              case None =>
                WavClip(id, ok = false, 0, 0, 0, 0L, None, None)
            }
          }
        }
      }
      .toDF()
  }

  /** Block-mean AMPLITUDE hash over decoded PCM — [[ppmBlockHash]]'s
    * audio sibling: split the sample stream into `blocks` contiguous
    * runs, mean each run's |amplitude| (integer DIV), set bit j iff
    * the run is non-empty and its mean is ≥ the global integer mean.
    * The coarse loudness-envelope fingerprint; survives any
    * container-level rewrite that leaves the PCM alone. All-integer,
    * oracle-replayable from construction math.
    */
  private[operators] def wavBlockHash(bytes: Array[Byte],
                                      blocks: Int): Option[(Long, Long)] =
    parseWavSamples(bytes).map { amps =>
      val n = amps.length.toLong
      if (n == 0L) (0L, 0L)
      else {
        val bsum = new Array[Long](blocks)
        val bcnt = new Array[Long](blocks)
        var tot = 0L
        var k = 0
        while (k < amps.length) {
          val j = (k.toLong * blocks / n).toInt
          bsum(j) += amps(k); bcnt(j) += 1; tot += amps(k)
          k += 1
        }
        val gm = tot / n
        var sig = 0L
        var j = 0
        while (j < blocks) {
          if (bcnt(j) > 0 && bsum(j) / bcnt(j) >= gm) sig |= 1L << j
          j += 1
        }
        (n, sig)
      }
    }

  /** The |amplitude| stream of a valid PCM16 WAV (all channels,
    * interleaved order) — the same [[wavPcmLayout]] walk as
    * [[parseWav]], so the two can never disagree about what parses.
    */
  private def parseWavSamples(bytes: Array[Byte]): Option[Array[Long]] =
    wavPcmLayout(bytes).map { case (_, _, _, off, size) =>
      def u8(i: Int) = bytes(i) & 0xff
      def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
      val n = size / 2
      val amps = new Array[Long](n)
      var k = 0
      while (k < n) {
        amps(k) = math.abs(le16(off + 2 * k).toShort.toLong)
        k += 1
      }
      amps
    }

  /** One decoded audio-fingerprint row. */
  case class WavHash(doc_id: Long, ok: Boolean, n_samples: Long, ahash: Long)

  /** Batch [[wavBlockHash]] through the shared mapPartitions seam. */
  def audioPhash(df: DataFrame, idCol: String = "doc_id",
                 payloadCol: String = "payload", blocks: Int = 16,
                 batchSize: Int = 256): DataFrame = {
    require(blocks >= 1 && blocks <= 62,
      s"blocks must be in [1, 62], got $blocks")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    import df.sparkSession.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .filter(col(idCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            wavBlockHash(bytes, blocks) match {
              case Some((n, sig)) => WavHash(id, ok = true, n, sig)
              case None => WavHash(id, ok = false, 0L, 0L)
            }
          }
        }
      }
      .toDF()
  }

  /** Audio near-duplicate pairs over decoded PCM: [[audioPhash]]
    * envelope signatures within `maxHamming` bits via the shared
    * pigeonhole-exact band join — [[decodedNearDup]]'s audio tier,
    * completing the multimodal dedup ladder (m6 exact bytes → m7
    * byte texture → m10 decoded pixels → this, decoded audio).
    * Empty clips excluded (degenerate all-zero bucket).
    */
  def audioNearDup(df: DataFrame, blocks: Int = 16, maxHamming: Int = 3,
                   idCol: String = "doc_id",
                   payloadCol: String = "payload",
                   maxBucket: Int = Int.MaxValue): DataFrame =
    Dedup.hammingBandPairs(
      audioPhash(df, idCol, payloadCol, blocks)
        .filter(col("ok") && col("n_samples") > 0L)
        .select(col(idCol), col("ahash")),
      idCol, "ahash", bits = blocks, maxHamming = maxHamming,
      maxBucket = maxBucket)

  /** Resize a decoded frame to target dimensions. The pixel resample is
    * the stubbed part (production: codec/SIMD resample behind the same
    * signature); the Spark-side contract is real — output schema keeps
    * the decoded shape with the new dims, per-axis scale factors, and
    * the feature vector rescaled by the area ratio (map-side HOF, no
    * shuffle).
    */
  def resize(decoded: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val sx = col("width").cast(DoubleType) / targetW
    val sy = col("height").cast(DoubleType) / targetH
    decoded
      .withColumn("scale_x", sx)
      .withColumn("scale_y", sy)
      .withColumn("features",
        transform(col("features"),
          f => (f.cast(DoubleType) / (col("scale_x") * col("scale_y")))
            .cast(FloatType)))
      .withColumn("width", lit(targetW))
      .withColumn("height", lit(targetH))
  }

  /** Deterministic frame sampling for "video" payloads: n byte-offsets
    * evenly spaced, each frame summarized by one digest. md5 (not
    * crc32) because it is portable across engines — the DuckDB oracle
    * computes the identical hex string.
    */
  def sampleFrames(df: DataFrame, n: Int, payloadCol: String = "payload"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n") // n=0: sequence(0,-1)
    val idx = sequence(lit(0), lit(n - 1))
    df.withColumn("frame_digests",
      transform(idx, i => {
        // LONG offset math: i and length() are both Int columns, and
        // frame index × a video-sized byte length clears Int.MaxValue
        // (2.2e9 at 35 MB × 64 frames) — an ANSI abort / wrapped
        // negative offset on real media, invisible on harness text
        val off = floor(i.cast(LongType) * length(col(payloadCol)) / n)
          .cast(IntegerType) // result <= length, Int-safe after the long multiply
        md5(col(payloadCol).substr(off + 1, lit(16)))
      }))
  }

  /** 48-bit perceptual average-hash (aHash) of a binary payload: 48
    * bytes sampled at evenly spaced offsets (the "downsample to a
    * fixed grid" step), bit i set iff sample i is at or above the
    * integer mean of the 48 samples — the classic aHash recipe
    * (downsample → mean → threshold) on the byte domain. Re-encodes,
    * crops and container-level rewrites that preserve most content
    * bytes land within a few bits of each other; exact copies collide
    * at distance 0. 48 bits (not pHash's 64) is the repo's
    * oracle-portability bound: every derived value stays a
    * non-negative BIGINT on both engines ([[graft.operators.Dedup.simhash48]]).
    *
    * All integer arithmetic (offsets via long floor-div, mean via
    * integer DIV), pure builtin expressions inside one projection —
    * no UDF, no shuffle; a production image pipeline swaps the byte
    * samples for decoded luma pixels behind the same column contract.
    */
  def perceptualHash48(df: DataFrame, payloadCol: String = "payload",
                       outCol: String = "phash"): DataFrame = {
    val n = 48
    val pay = col(payloadCol)
    // sample i lives at byte offset floor(i * len / n) (0-based); the
    // multiply is in LONG like sampleFrames — frame offsets on real
    // media sizes clear Int.MaxValue
    val samples = transform(sequence(lit(0), lit(n - 1)), i =>
      when(length(pay) > 0,
        conv(hex(pay.substr(
          (floor(i.cast(LongType) * length(pay) / n) + 1).cast(IntegerType),
          lit(1))), 16, 10).cast(LongType))
        .otherwise(lit(0L)))
    val mean = expr(s"aggregate(_ph_samples, 0L, (a, x) -> a + x) DIV $n")
    df.withColumn("_ph_samples", samples)
      .withColumn("_ph_mean", mean)
      .withColumn(outCol, expr(
        s"""aggregate(
           |  zip_with(_ph_samples, sequence(0, ${n - 1}),
           |    (s, i) -> IF(s >= _ph_mean, shiftleft(1L, i), 0L)),
           |  0L, (a, x) -> a + x)""".stripMargin))
      .drop("_ph_samples", "_ph_mean")
  }

  /** Perceptual near-duplicate pairs: payloads whose aHash-48
    * signatures are within `maxHamming` bits — the content-level tier
    * between [[blobDedup]] (exact bytes) and [[frameOverlapPairs]]
    * (shared exact frames): it catches payloads where EVERY frame
    * changed slightly (re-encode noise) so no digest matches, but the
    * overall byte texture is preserved. Candidates come from the
    * shared pigeonhole-exact Hamming band join
    * ([[graft.operators.Dedup.hammingBandPairs]]) — one 48-bit
    * signature per payload, band equi-join, popcount verify; never
    * all-pairs.
    */
  def perceptualNearDup(df: DataFrame, maxHamming: Int = 3,
                        idCol: String = "doc_id",
                        payloadCol: String = "payload",
                        maxBucket: Int = Int.MaxValue): DataFrame =
    Dedup.hammingBandPairs(
      perceptualHash48(df, payloadCol).select(col(idCol), col("phash")),
      idCol, "phash", bits = 48, maxHamming = maxHamming,
      maxBucket = maxBucket)

  /** Frame-overlap near-duplicate pairs: payloads sharing at least
    * `minShared` sampled-frame digests — how video/image dedup works
    * in practice (per-frame fingerprints; clips that share frames are
    * re-encodes, clips, or mirrors of each other even when their
    * container bytes differ entirely). Candidates come from an
    * equi-join on the digest, never an all-pairs product: a digest
    * shared by d payloads costs d rows pre-pair, and per-doc digests
    * are deduplicated first so a frame repeated within one payload
    * doesn't inflate the pair count.
    *
    * @param maxBucket drop digests shared by more than this many
    * payloads before pairing (black frames, test cards, silence — the
    * degenerate buckets that would otherwise go quadratic; same guard
    * as `Dedup.candidatePairs`).
    */
  def frameOverlapPairs(df: DataFrame, n: Int, minShared: Long = 1L,
                        maxBucket: Long = Long.MaxValue,
                        idCol: String = "doc_id",
                        payloadCol: String = "payload"): DataFrame = {
    val fd = sampleFrames(df, n, payloadCol)
      .select(col(idCol), explode(array_distinct(col("frame_digests")))
        .as("dg"))
    val ok = fd.groupBy(col("dg")).agg(count(lit(1)).as("_n"))
      .filter(col("_n") <= maxBucket)
      .select(col("dg"))
    val kept = fd.join(ok, "dg")
    val a = kept.select(col(idCol).as("doc_a"), col("dg"))
    val b = kept.select(col(idCol).as("doc_b"), col("dg").as("dg_b"))
    a.join(b, col("dg") === col("dg_b") && col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= minShared)
  }

  /** One dispatched-decode row: the container kind sniffed from the
    * payload's magic number, the matching real decoder's output in a
    * modality-unified shape (stat1/stat2 = the decoder's exact integer
    * summary stats: total channel sum + maxval for rasters, signed
    * sample sum + peak |amplitude| for PCM).
    */
  case class MediaRow(doc_id: Long, kind: String, ok: Boolean,
      width: Int, height: Int, channels: Int, sample_rate: Int,
      n_units: Long, stat1: Option[Long], stat2: Option[Long])

  /** Magic-number decode DISPATCH — what a real ingest pipeline runs
    * over a mixed blob column: sniff each payload's leading bytes
    * (`P6` → PPM raster, `RIFF` → WAVE PCM, else unknown) and run the
    * matching REAL parser ([[parsePpm]] / [[parseWav]]) in the same
    * mapPartitions batch; a payload that *claims* a container but
    * fails its parse keeps the sniffed kind with ok=false (the
    * corrupt-file row a quality report needs), unknown magic is
    * kind=unknown. One pass, per-partition decoder state, blobs never
    * shuffle — only (id, small-struct) rows leave the scan task.
    */
  def decodeDispatch(df: DataFrame, idCol: String = "doc_id",
                     payloadCol: String = "payload",
                     batchSize: Int = 256): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    import df.sparkSession.implicits._
    def m(b: Array[Byte], i: Int, c: Char) = b(i) == c.toByte
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .filter(col(idCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, b) =>
            if (b != null && b.length >= 2 && m(b, 0, 'P') && m(b, 1, '6'))
              parsePpm(b) match {
                case Some((w, h, mv, sr, sg, sb)) =>
                  MediaRow(id, "ppm", ok = true, w, h, 3, 0, w.toLong * h,
                    Some(sr + sg + sb), Some(mv.toLong))
                case None =>
                  MediaRow(id, "ppm", ok = false, 0, 0, 0, 0, 0L, None, None)
              }
            else if (b != null && b.length >= 4 && m(b, 0, 'R') &&
                m(b, 1, 'I') && m(b, 2, 'F') && m(b, 3, 'F'))
              parseWav(b) match {
                case Some((ch, rate, _, n, sum, peak)) =>
                  MediaRow(id, "wav", ok = true, 0, 0, ch, rate, n,
                    Some(sum), Some(peak))
                case None =>
                  MediaRow(id, "wav", ok = false, 0, 0, 0, 0, 0L, None, None)
              }
            else
              MediaRow(id, "unknown", ok = false, 0, 0, 0, 0, 0L, None, None)
          }
        }
      }
      .toDF()
  }

  /** Scene-change detection WITHIN one video: sample `n` frames
    * ([[sampleFrames]]'s evenly-spaced offset model), hash each frame's
    * first `bytesPerFrame` bytes with the aHash recipe (bit j iff byte
    * j ≥ the frame's integer mean — [[perceptualHash48]] applied
    * per-frame instead of per-payload), then mark a boundary wherever
    * consecutive frame hashes differ by more than `maxHamming` bits —
    * the classic shot-boundary histogram-difference method on the byte
    * domain. One transition row per (payload, frame i≥1).
    *
    * Scale shape: the ENTIRE operator is one projection + one
    * generator — frame hashes build inside a nested higher-order
    * expression (no per-frame rows until the final posexplode of n−1
    * small ints), so payload bytes are read exactly once in the scan
    * task that owns them and nothing but (id, idx, hamming) ever
    * crosses an exchange. Zero shuffles at any corpus size; a real
    * deployment swaps the byte window for decoded luma behind the same
    * column contract (the m2/m8 seam).
    *
    * All-integer math (LONG offset multiply like [[sampleFrames]],
    * integer-DIV mean), so every value is oracle-replayable. Bytes
    * past the end of a short payload read as 0, matching the oracle's
    * bounds CASE.
    */
  def sceneChanges(df: DataFrame, n: Int, bytesPerFrame: Int = 16,
                   maxHamming: Int = 4, idCol: String = "doc_id",
                   payloadCol: String = "payload"): DataFrame = {
    require(n >= 2, s"need >= 2 frames for transitions, got $n")
    require(bytesPerFrame >= 1 && bytesPerFrame <= 62,
      s"bytesPerFrame must be in [1, 62], got $bytesPerFrame")
    val w = bytesPerFrame
    val pay = col(payloadCol)
    // frame f's byte j (0-based): payload[floor(f*len/n) + j], 0 when
    // past the end — LONG multiply before the divide (sampleFrames)
    val frameBytes = transform(sequence(lit(0), lit(n - 1)), f => {
      val off = floor(f.cast(LongType) * length(pay) / n).cast(IntegerType)
      transform(sequence(lit(0), lit(w - 1)), j =>
        when(off + j + 1 <= length(pay),
          conv(hex(pay.substr(off + j + 1, lit(1))), 16, 10)
            .cast(LongType))
          .otherwise(lit(0L)))
    })
    // per-frame integer mean once, then the threshold fold — two
    // aligned higher-order passes instead of a quadratic inner mean
    val means = expr(
      s"transform(_fb, bs -> aggregate(bs, 0L, (a, x) -> a + x) DIV $w)")
    val hashes = expr(
      s"""zip_with(_fb, _fm, (bs, m) ->
         |  aggregate(
         |    zip_with(bs, sequence(0, ${w - 1}),
         |      (b, j) -> IF(b >= m, shiftleft(1L, j), 0L)),
         |    0L, (a, x) -> a + x))""".stripMargin)
    df.filter(pay.isNotNull)
      .withColumn("_fb", frameBytes)
      .withColumn("_fm", means)
      .withColumn("_fh", hashes)
      .select(col(idCol), posexplode(expr(
        s"""transform(sequence(1, ${n - 1}), i ->
           |  bit_count(element_at(_fh, i + 1) ^ element_at(_fh, i)))"""
          .stripMargin)))
      .select(col(idCol), (col("pos") + 1).cast(IntegerType).as("frame_idx"),
        col("col").cast(LongType).as("hamming"),
        (col("col") > maxHamming).as("new_scene"))
  }
}

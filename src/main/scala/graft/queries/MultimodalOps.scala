package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Multimodal

/** Multimodal-column operators over `documents` (text bytes stand in
  * for media blobs — the container has no codecs; see Multimodal).
  * All three have full SQL oracles: the deterministic decode stub's
  * header math and the md5 frame digests are SQL-expressible over the
  * ASCII stand-in payloads (the mapPartitions plumbing is what m2
  * actually exercises; the oracle checks its output, not its shape).
  */
object MultimodalOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- binary metadata extraction (map-side, shuffle-free) -------------
    "m1_binary_meta" -> { (s, dir) =>
      Multimodal.withMetadata(Multimodal.withPayload(docs(s, dir)))
        .select(col("doc_id"), col("byte_len"), col("sha"), col("header_hex"))
    },

    // ---- tier-0 blob dedup: exact byte-digest groups ---------------------
    "m6_blob_dedup" -> { (s, dir) =>
      Multimodal.blobDedup(Multimodal.withPayload(docs(s, dir)))
    },

    // ---- stubbed decode via mapPartitions --------------------------------
    "m2_decode_features" -> { (s, dir) =>
      Multimodal.decode(Multimodal.withPayload(docs(s, dir)))
        .select(col("doc_id"), col("width"), col("height"), col("channels"))
    },

    // ---- resize: decoded frames → target dims + scale factors ------------
    // (features stay array-typed in the library op; the query exposes
    // the scalar surface the driver can hash)
    "m4_resize" -> { (s, dir) =>
      Multimodal.resize(
          Multimodal.decode(Multimodal.withPayload(docs(s, dir))), 224, 224)
        .select(col("doc_id"), col("width"), col("height"),
          col("scale_x"), col("scale_y"))
    },

    // ---- deterministic frame sampling ------------------------------------
    // posexplode to scalar rows: array columns can't be sorted/hashed
    // by the driver's compare, and exploded rows are the shape a
    // downstream per-frame pipeline wants anyway
    "m3_frame_sample" -> { (s, dir) =>
      Multimodal.sampleFrames(Multimodal.withPayload(docs(s, dir)), n = 4)
        .select(col("doc_id"), posexplode(col("frame_digests")))
        .select(col("doc_id"), col("pos").cast("int").as("frame_idx"),
          col("col").as("frame_digest"))
    },

    // ---- frame-overlap near-dup (video/image dedup shape) ----------------
    // payload pairs sharing >= 1 sampled-frame digest; candidates are
    // a digest equi-join, never all-pairs
    "m5_frame_overlap" -> { (s, dir) =>
      Multimodal.frameOverlapPairs(
        Multimodal.withPayload(docs(s, dir)), n = 4, minShared = 1L)
    },

    // ---- perceptual (aHash) near-dup: content-texture tier ---------------
    // 48-bit average-hash per payload, pairs within Hamming 7 via the
    // shared pigeonhole-exact band join (8 bands x 6 bits); maxHamming
    // = 7 is where the synthetic corpus yields a meaty pair set (227
    // pairs at sf0.01) — the oracle replays sample/mean/threshold
    // bit-for-bit and verifies with an all-pairs popcount
    "m7_phash_neardup" -> { (s, dir) =>
      Multimodal.perceptualNearDup(
        Multimodal.withPayload(docs(s, dir)), maxHamming = 7)
    },

    // ---- REAL container decode: P6 (binary PPM) --------------------------
    // the m2 seam with an actual decoder in it: a valid PPM payload is
    // synthesized per doc (header + text bytes as raw RGB), and
    // decodePpm PARSES the bytes — magic, comment-tolerant header
    // ints, raster triples — emitting dims + integer per-channel
    // means. The oracle replays the CONSTRUCTION math (it never sees
    // the bytes), so a green row proves the parser inverted the
    // encoder exactly
    "m8_decode_real" -> { (s, dir) =>
      Multimodal.decodePpm(
          Multimodal.withPpmPayload(
            docs(s, dir).filter(col("text").isNotNull)))
        .select(col("doc_id"), col("ok"), col("width"), col("height"),
          col("maxval"), col("n_pixels"),
          col("mean_r"), col("mean_g"), col("mean_b"))
    },

    // ---- REAL container decode, audio tier: RIFF/WAVE PCM ----------------
    // the m8 contract on a second modality: a valid 16-bit mono WAV is
    // synthesized per doc (constant header + 16 LE samples from text
    // bytes) and decodeWav WALKS THE CHUNK LIST — magic, fmt fields,
    // pad rules, truncation checks — emitting integer sample stats
    // (sum + peak |amplitude|, no division). Oracle replays the
    // construction math only
    "m9_decode_wav" -> { (s, dir) =>
      Multimodal.decodeWav(
          Multimodal.withWavPayload(
            docs(s, dir).filter(col("text").isNotNull &&
              length(col("text")) >= 32)))
        .select(col("doc_id"), col("ok"), col("channels"),
          col("sample_rate"), col("bits_per_sample"), col("n_samples"),
          col("sum_amp"), col("peak_amp"))
    },

    // ---- decoded-CONTENT near-dup: m7's contract on real pixels ----------
    // block-mean luma aHash over the DECODED raster (through the m8
    // parser), paired by the shared Hamming band join (6 bands x 8
    // bits at maxHamming = 5 -> 16 pairs at sf0.01: 7 exact copies at
    // distance 0 plus 9 near misses). Byte-level m7 dies on a header
    // rewrite; this survives anything that leaves the raster alone
    "m10_decoded_neardup" -> { (s, dir) =>
      Multimodal.decodedNearDup(
        Multimodal.withPpmPayload(
          docs(s, dir).filter(col("text").isNotNull)),
        maxHamming = 5)
    },

    // ---- decoded-AUDIO near-dup: the m10 contract on PCM samples ---------
    // block-mean amplitude-envelope hash over decoded PCM16 (through
    // the m9 chunk walk), paired by the shared Hamming band join
    // (4 bands x 4 bits at maxHamming = 3). Completes the multimodal
    // dedup ladder: m6 exact bytes -> m7 byte texture -> m10 decoded
    // pixels -> m11 decoded audio
    "m11_audio_neardup" -> { (s, dir) =>
      Multimodal.audioNearDup(
        Multimodal.withWavPayload(docs(s, dir)),
        blocks = 16, maxHamming = 3)
    },

    // ---- magic-number decode DISPATCH over a MIXED blob column -----------
    // doc_id % 3 routes each doc to a PPM payload, a WAV payload, or
    // junk bytes (0x00-prefixed, guaranteed non-magic); the one-pass
    // dispatcher sniffs the magic and runs the matching real parser.
    // WAV-leg docs with text < 32 chars get a NULL payload -> unknown
    "m13_decode_dispatch" -> { (s, dir) =>
      val d = docs(s, dir).filter(col("text").isNotNull)
      val ppm = Multimodal.withPpmPayload(d.filter(col("doc_id") % 3 === 0))
      val wav = Multimodal.withWavPayload(d.filter(col("doc_id") % 3 === 1))
      val raw = d.filter(col("doc_id") % 3 === 2)
        .withColumn("payload",
          concat(unhex(lit("00")), col("text").cast("binary")))
      Multimodal.decodeDispatch(
        ppm.select(col("doc_id"), col("payload"))
          .unionByName(wav.select(col("doc_id"), col("payload")))
          .unionByName(raw.select(col("doc_id"), col("payload"))))
    },

    // ---- scene-change detection WITHIN a video ---------------------------
    // 8 sampled frames, 16-byte per-frame aHash, boundary where
    // consecutive hashes differ by > 4 bits — the shot-boundary
    // histogram-difference method; one projection + one generator,
    // zero shuffles at any corpus size
    "m12_scene_change" -> { (s, dir) =>
      Multimodal.sceneChanges(
        Multimodal.withPayload(docs(s, dir).filter(col("text").isNotNull)),
        n = 8, bytesPerFrame = 16, maxHamming = 4)
    })

  def oracle: Map[String, String] = Map(
    // construction math only: w = 1 + len % 7, h = (len//3)//w, pixel
    // i's byte = ord of text char i, channel = (i-1) % 3; integer
    // means via //. ASCII text → byte == ord
    "m8_decode_real" ->
      """WITH m AS (
        |  SELECT doc_id, 1 + strlen(text) % 7 AS w,
        |    (strlen(text) // 3) // (1 + strlen(text) % 7) AS h
        |  FROM documents WHERE text IS NOT NULL),
        |px AS (
        |  SELECT m.doc_id,
        |    unnest(range(1, w * h * 3 + 1)) AS i, w, h
        |  FROM m),
        |v AS (
        |  SELECT px.doc_id, (i - 1) % 3 AS ch,
        |    ord(substr(d.text, CAST(i AS INT), 1)) AS b
        |  FROM px JOIN documents d USING (doc_id)),
        |sums AS (
        |  SELECT doc_id,
        |    SUM(CASE WHEN ch = 0 THEN b ELSE 0 END) AS sr,
        |    SUM(CASE WHEN ch = 1 THEN b ELSE 0 END) AS sg,
        |    SUM(CASE WHEN ch = 2 THEN b ELSE 0 END) AS sb
        |  FROM v GROUP BY doc_id)
        |SELECT m.doc_id, TRUE AS ok,
        |  CAST(m.w AS INT) AS width, CAST(m.h AS INT) AS height,
        |  CAST(255 AS INT) AS maxval,
        |  CAST(m.w * m.h AS BIGINT) AS n_pixels,
        |  CAST(s.sr // nullif(m.w * m.h, 0) AS BIGINT) AS mean_r,
        |  CAST(s.sg // nullif(m.w * m.h, 0) AS BIGINT) AS mean_g,
        |  CAST(s.sb // nullif(m.w * m.h, 0) AS BIGINT) AS mean_b
        |FROM m LEFT JOIN sums s USING (doc_id)""".stripMargin,

    // construction math: sample i (0-based) = ord(char 2i+1) +
    // 256·ord(char 2i+2), sign-folded at 32768 (ASCII data never
    // trips it — the spec covers negative samples with crafted bytes)
    "m9_decode_wav" ->
      """WITH s AS (
        |  SELECT doc_id, unnest(range(0, 16)) AS i FROM documents
        |  WHERE text IS NOT NULL AND strlen(text) >= 32),
        |v AS (
        |  SELECT s.doc_id,
        |    ord(substr(d.text, CAST(2 * i + 1 AS INT), 1))
        |      + 256 * ord(substr(d.text, CAST(2 * i + 2 AS INT), 1)) AS raw
        |  FROM s JOIN documents d USING (doc_id)),
        |sv AS (
        |  SELECT doc_id,
        |    CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS v
        |  FROM v)
        |SELECT doc_id, TRUE AS ok, CAST(1 AS INT) AS channels,
        |  CAST(8000 AS INT) AS sample_rate,
        |  CAST(16 AS INT) AS bits_per_sample,
        |  CAST(16 AS BIGINT) AS n_samples,
        |  CAST(SUM(v) AS BIGINT) AS sum_amp,
        |  CAST(MAX(abs(v)) AS BIGINT) AS peak_amp
        |FROM sv GROUP BY doc_id""".stripMargin,

    "m6_blob_dedup" ->
      """SELECT sha256(text) AS sha, MIN(doc_id) AS keeper_id,
        |  COUNT(*) AS dup_ct
        |FROM documents GROUP BY 1""".stripMargin,

    // text is ASCII → byte length == char length; sha256/hex portable
    "m1_binary_meta" ->
      """SELECT doc_id,
        | CAST(strlen(text) AS INT) AS byte_len,
        | sha256(text) AS sha,
        | upper(hex(substr(text, 1, 4))) AS header_hex
        |FROM documents""".stripMargin,

    // decodeStub header math over ASCII bytes: b0/b1 = first two chars
    "m2_decode_features" ->
      """SELECT doc_id,
        | CAST((CASE WHEN strlen(text) >= 1 THEN ord(substr(text, 1, 1)) ELSE 0 END % 64) * 16 + 64 AS INT) AS width,
        | CAST((CASE WHEN strlen(text) >= 2 THEN ord(substr(text, 2, 1)) ELSE 0 END % 64) * 16 + 64 AS INT) AS height,
        | CAST(3 AS INT) AS channels
        |FROM documents""".stripMargin,

    // width/height from the m2 header math; scales are exact int/int
    // divisions in double, bit-reproducible on both engines
    "m4_resize" ->
      """WITH m AS (
        |  SELECT doc_id,
        |   (CASE WHEN strlen(text) >= 1 THEN ord(substr(text, 1, 1)) ELSE 0 END % 64) * 16 + 64 AS w0,
        |   (CASE WHEN strlen(text) >= 2 THEN ord(substr(text, 2, 1)) ELSE 0 END % 64) * 16 + 64 AS h0
        |  FROM documents)
        |SELECT doc_id, CAST(224 AS INT) AS width, CAST(224 AS INT) AS height,
        | CAST(w0 AS DOUBLE) / 224 AS scale_x,
        | CAST(h0 AS DOUBLE) / 224 AS scale_y
        |FROM m""".stripMargin,

    "m3_frame_sample" ->
      """SELECT d.doc_id,
        | CAST(g.i AS INT) AS frame_idx,
        | md5(substr(d.text, CAST(floor(g.i * strlen(d.text) / 4) AS INT) + 1, 16)) AS frame_digest
        |FROM documents d
        |CROSS JOIN generate_series(0, 3) AS g(i)""".stripMargin,

    // per-doc digests dedup before pairing (DISTINCT ≡ the Spark
    // side's array_distinct + explode)
    "m5_frame_overlap" ->
      """WITH fr AS (
        |  SELECT d.doc_id,
        |    md5(substr(d.text, CAST(floor(g.i * strlen(d.text) / 4) AS INT) + 1, 16)) AS dg
        |  FROM documents d CROSS JOIN generate_series(0, 3) AS g(i)),
        |fd AS (SELECT DISTINCT doc_id, dg FROM fr)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  COUNT(*) AS shared_frames
        |FROM fd a JOIN fd b ON a.dg = b.dg AND a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |HAVING COUNT(*) >= 1""".stripMargin,

    // the aHash recipe replayed literally (integer offsets // 48,
    // integer mean, << bit fold), then an all-pairs popcount — the
    // oracle may brute-force what the Spark side bands
    // construction -> pixel lumas -> block/global integer means ->
    // 48-bit signature -> all-pairs popcount (band join is
    // pigeonhole-exact, so brute force IS the contract)
    "m10_decoded_neardup" ->
      """WITH m AS (
        |  SELECT doc_id, text, 1 + strlen(text) % 7 AS w,
        |    (strlen(text) // 3) // (1 + strlen(text) % 7) AS h
        |  FROM documents WHERE text IS NOT NULL),
        |d AS (SELECT doc_id, text, w * h AS n FROM m WHERE w * h > 0),
        |px AS (SELECT doc_id, n, unnest(range(n)) AS p, text FROM d),
        |lu AS (
        |  SELECT doc_id, n, (p * 48) // n AS j,
        |    ord(substr(text, CAST(3 * p + 1 AS INT), 1))
        |    + ord(substr(text, CAST(3 * p + 2 AS INT), 1))
        |    + ord(substr(text, CAST(3 * p + 3 AS INT), 1)) AS luma
        |  FROM px),
        |blk AS (
        |  SELECT doc_id, j, SUM(luma) // COUNT(*) AS bm
        |  FROM lu GROUP BY 1, 2),
        |gm AS (SELECT doc_id, SUM(luma) // MAX(n) AS g FROM lu GROUP BY 1),
        |sig AS (
        |  SELECT blk.doc_id,
        |    CAST(SUM(CASE WHEN blk.bm >= gm.g
        |      THEN CAST(1 AS BIGINT) << CAST(blk.j AS INT)
        |      ELSE 0 END) AS BIGINT) AS ph
        |  FROM blk JOIN gm USING (doc_id) GROUP BY 1)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.ph, b.ph)) <= 5""".stripMargin,

    // construction math through the m9 sample derivation (raw =
    // little-endian char pair, sign-folded then |·|); blocks = n = 16
    // so block j holds exactly sample j — bit j iff amp_j >= the
    // integer global mean; pairs at hamming <= 3 over the 16-bit sigs
    "m11_audio_neardup" ->
      """WITH s AS (
        |  SELECT doc_id, unnest(range(0, 16)) AS i, text FROM documents
        |  WHERE text IS NOT NULL AND strlen(text) >= 32),
        |v AS (
        |  SELECT doc_id, i,
        |    ord(substr(text, CAST(2 * i + 1 AS INT), 1))
        |      + 256 * ord(substr(text, CAST(2 * i + 2 AS INT), 1)) AS raw
        |  FROM s),
        |a AS (
        |  SELECT doc_id, i,
        |    CASE WHEN raw >= 32768 THEN abs(raw - 65536) ELSE raw END AS amp
        |  FROM v),
        |g AS (SELECT doc_id, SUM(amp) // 16 AS gm FROM a GROUP BY 1),
        |sig AS (
        |  SELECT a.doc_id,
        |    CAST(SUM(CASE WHEN amp >= gm
        |      THEN CAST(1 AS BIGINT) << CAST(i AS INT)
        |      ELSE 0 END) AS BIGINT) AS ah
        |  FROM a JOIN g USING (doc_id) GROUP BY 1)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.ah, b.ah)) AS BIGINT) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.ah, b.ah)) <= 3""".stripMargin,

    // three construction replays unioned by the id-mod route: the m8
    // raster math (stat1 = total channel sum, stat2 = maxval), the m9
    // PCM math (stat1 = signed sample sum, stat2 = peak |amplitude|),
    // and the unknown rows (junk leg + short-text WAV leg)
    "m13_decode_dispatch" ->
      """WITH base AS (
        |  SELECT doc_id, text, strlen(text) AS len FROM documents
        |  WHERE text IS NOT NULL),
        |pm AS (
        |  SELECT doc_id, len, 1 + len % 7 AS w,
        |    (len // 3) // (1 + len % 7) AS h
        |  FROM base WHERE doc_id % 3 = 0),
        |px AS (SELECT pm.doc_id, unnest(range(1, w * h * 3 + 1)) AS i
        |       FROM pm),
        |ps AS (
        |  SELECT px.doc_id,
        |    SUM(ord(substr(b.text, CAST(i AS INT), 1))) AS s
        |  FROM px JOIN base b USING (doc_id) GROUP BY 1),
        |ppm AS (
        |  SELECT pm.doc_id, 'ppm' AS kind, TRUE AS ok,
        |    CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |    CAST(3 AS INT) AS channels, CAST(0 AS INT) AS sample_rate,
        |    CAST(w * h AS BIGINT) AS n_units,
        |    CAST(COALESCE(ps.s, 0) AS BIGINT) AS stat1,
        |    CAST(255 AS BIGINT) AS stat2
        |  FROM pm LEFT JOIN ps USING (doc_id)),
        |wi AS (
        |  SELECT doc_id, unnest(range(0, 16)) AS i, text FROM base
        |  WHERE doc_id % 3 = 1 AND len >= 32),
        |wsv AS (
        |  SELECT doc_id,
        |    CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS v
        |  FROM (SELECT doc_id,
        |      ord(substr(text, CAST(2 * i + 1 AS INT), 1))
        |        + 256 * ord(substr(text, CAST(2 * i + 2 AS INT), 1)) AS raw
        |    FROM wi)),
        |wav AS (
        |  SELECT doc_id, 'wav' AS kind, TRUE AS ok,
        |    CAST(0 AS INT) AS width, CAST(0 AS INT) AS height,
        |    CAST(1 AS INT) AS channels, CAST(8000 AS INT) AS sample_rate,
        |    CAST(16 AS BIGINT) AS n_units,
        |    CAST(SUM(v) AS BIGINT) AS stat1,
        |    CAST(MAX(abs(v)) AS BIGINT) AS stat2
        |  FROM wsv GROUP BY doc_id),
        |unk AS (
        |  SELECT doc_id, 'unknown' AS kind, FALSE AS ok,
        |    CAST(0 AS INT) AS width, CAST(0 AS INT) AS height,
        |    CAST(0 AS INT) AS channels, CAST(0 AS INT) AS sample_rate,
        |    CAST(0 AS BIGINT) AS n_units,
        |    CAST(NULL AS BIGINT) AS stat1, CAST(NULL AS BIGINT) AS stat2
        |  FROM base
        |  WHERE doc_id % 3 = 2 OR (doc_id % 3 = 1 AND len < 32))
        |SELECT * FROM ppm UNION ALL SELECT * FROM wav
        |UNION ALL SELECT * FROM unk""".stripMargin,

    // construction math replay: frame f's byte j sits at 1-based
    // position (f*len)//8 + j + 1 (0 past the end); per-frame integer
    // mean, bit j iff byte >= mean, transitions pair frame i with i-1
    "m12_scene_change" ->
      """WITH b AS (
        |  SELECT d.doc_id, f.i AS fi, j.i AS j,
        |    CASE WHEN (f.i * strlen(d.text)) // 8 + j.i + 1 <= strlen(d.text)
        |      THEN ord(substr(d.text,
        |        CAST((f.i * strlen(d.text)) // 8 + j.i + 1 AS INT), 1))
        |      ELSE 0 END AS v
        |  FROM documents d
        |  CROSS JOIN generate_series(0, 7) AS f(i)
        |  CROSS JOIN generate_series(0, 15) AS j(i)
        |  WHERE d.text IS NOT NULL),
        |m AS (SELECT doc_id, fi, SUM(v) // 16 AS mn FROM b GROUP BY 1, 2),
        |h AS (
        |  SELECT b.doc_id, b.fi,
        |    SUM(CASE WHEN v >= mn THEN CAST(1 AS BIGINT) << CAST(j AS INT)
        |      ELSE 0 END) AS fh
        |  FROM b JOIN m USING (doc_id, fi) GROUP BY 1, 2)
        |SELECT a.doc_id, CAST(t.fi AS INT) AS frame_idx,
        |  CAST(bit_count(xor(a.fh, t.fh)) AS BIGINT) AS hamming,
        |  bit_count(xor(a.fh, t.fh)) > 4 AS new_scene
        |FROM h a JOIN h t ON a.doc_id = t.doc_id AND t.fi = a.fi + 1"""
        .stripMargin,

    "m7_phash_neardup" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    list_transform(range(48), i -> CASE WHEN strlen(text) = 0 THEN 0
        |      ELSE ord(substr(text, CAST(i * strlen(text) // 48 AS INT) + 1, 1)) END) AS sm
        |  FROM documents),
        |h AS (SELECT doc_id, list_sum(sm) // 48 AS mean, sm FROM s),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(48),
        |      i -> CASE WHEN sm[i+1] >= mean THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS ph
        |  FROM h)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.ph, b.ph)) <= 7""".stripMargin
  )
}

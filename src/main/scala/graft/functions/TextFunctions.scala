package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis column functions for the document pipeline.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (higher-order array functions, regexp, md5) — no Scala UDFs — so the
  * expressions stay inside whole-stage codegen and scale linearly with
  * input size. Equivalent to the reference's keyword tokenizer surface
  * (reference `gmall-realtime/src/main/java/com/atguigu/utils/KeywordUtil.java:13-35`)
  * plus the training-data-pipeline text operators (language ID, quality
  * scoring, token counting, fingerprinting).
  */
object TextFunctions {

  /** Whitespace tokenizer (the reference's IK segmenter becomes a
    * dictionary-free split for the Latin-alphabet harness corpus; the
    * API seam is the same: text → array of keywords).
    */
  def tokenize(text: Column): Column =
    filter(split(text, " "), w => length(w) > 0)

  /** Distinct lowercase token set — basis for lang-ID / dedup ops. */
  def tokenSet(text: Column): Column =
    array_distinct(tokenize(lower(text)))

  /** Script-aware tokenizer: CJK text goes through the dictionary
    * segmenter (the reference's IK-analyzer role), everything else
    * through the codegen'd whitespace split — so the UDF only runs
    * where it must.
    */
  def tokenizeSmart(text: Column): Column =
    // the gate mirrors CjkSegmenter.isCjk exactly (unified + Ext-A +
    // compatibility ideographs) — a narrower gate would route Ext-A
    // text to the whitespace tokenizer and emit whole runs as one token
    when(text.rlike("[\\u3400-\\u4dbf\\u4e00-\\u9fff\\uf900-\\ufaff]"),
        CjkSegmenter.tokenizeCjk(text))
      .otherwise(tokenize(text))

  /** Tiny per-language stopword profiles for the n-gram-free heuristic
    * language ID. Deterministic and portable to the SQL oracle.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "of", "and", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "une"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我"))

  /** Score of one language profile = #distinct tokens ∩ profile. */
  def langScore(text: Column, profile: Seq[String]): Column =
    size(array_intersect(tokenSet(text), lit(profile.toArray)))

  /** Heuristic language ID: argmax profile score, first-wins tie-break
    * in `langProfiles` order, "und" when no profile matches at all.
    */
  def langId(text: Column): Column = {
    val scores = langProfiles.map { case (l, p) => l -> langScore(text, p) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), elseCol) =>
      when(s === best && s > 0, lit(l)).otherwise(elseCol)
    }
  }

  /** Quality metrics (length / punctuation / stopword ratios). All
    * ratios are integer-count ÷ integer-count in double — deterministic
    * across engines.
    */
  def nTokens(text: Column): Column = size(tokenize(text))

  def punctCount(text: Column): Column =
    regexp_count(text, lit("[^a-zA-Z0-9 ]"))

  /** nTokens with 0 mapped to null, so ratio denominators yield null
    * for empty docs instead of a fatal ANSI DIVIDE_BY_ZERO.
    */
  private def nTokensDenom(text: Column): Column = nullif(nTokens(text), lit(0))

  def stopwordRatio(text: Column): Column = {
    val stops = lit(langProfiles.flatMap(_._2).distinct.toArray)
    size(filter(tokenize(lower(text)), w => array_contains(stops, w)))
      .cast(DoubleType) / nTokensDenom(text)
  }

  def avgTokenLen(text: Column): Column =
    (length(text) - (nTokens(text) - lit(1))).cast(DoubleType) /
      nTokensDenom(text)

  /** Composite quality score in [0,1]-ish: favors mid-length docs with
    * a natural stopword ratio and low punctuation noise. Null (not an
    * error) for empty/whitespace-only docs.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(nTokens(text).cast(DoubleType) / lit(100.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * lit(4.0), lit(1.0))
    val punctPenalty =
      least(punctCount(text).cast(DoubleType) / nTokensDenom(text), lit(1.0))
    // the zero-token null must be EXPLICIT: least() SKIPS null
    // arguments (least(null, 1.0) = 1.0), so without this gate a
    // whitespace-only doc scores 0.4 and sails through the curation
    // pipeline's >= 0.3 quality gate instead of dropping
    when(nTokens(text) > 0,
      lenScore * lit(0.4) + stopScore * lit(0.4) +
        (lit(1.0) - punctPenalty) * lit(0.2))
  }

  /** BPE-ish regex token count: runs of letters, runs of digits, or a
    * single non-alphanumeric symbol each count as one token.
    */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"))

  /** Polynomial rolling hash over the document's characters
    * (base 31, mod 1e9+7), fully inside codegen via
    * `aggregate(split(text,''))`. The fold is sequential left-to-right,
    * so the value is engine-portable (DuckDB `list_reduce` mirrors it).
    */
  /** Codegen'd native expression (see [[RollingHash]]); the equivalent
    * HOF — `aggregate(split(text, ""), 0L, (a,c) => (a*31 + ascii(c))
    * % 1000000007)` — is bit-identical but interpreted per character.
    */
  def rollingFingerprint(text: Column): Column = RollingHash(text)

  /** Stable 32-char content fingerprint for exact dedup. */
  def contentHash(text: Column): Column = md5(text)

  /** Canonical text for "fuzzy-exact" dedup: casefold, collapse every
    * non-alphanumeric run (punctuation, whitespace, any non-ASCII) to
    * one space, trim. Pure codegen'd string ops; the DuckDB oracle
    * replays it with the same regex (with the 'g' flag — DuckDB
    * replaces first-match by default where Spark replaces all).
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Deterministic dataset-split assignment: a document's split is a
    * pure function of its key's md5 (first 4 hex digits as a uniform
    * 0..65535 value), so train/val membership is stable across runs,
    * engines, and repartitioning — the property a training pipeline
    * needs to never leak validation docs into training when data is
    * re-processed. `trainPermille`/1000 of keys go to "train".
    */
  def stableSplit(key: Column, trainPermille: Int = 900): Column = {
    // empty salt ≡ md5 of the bare key — ONE definition of the bucket
    // expression (hashBucket) keeps the documented independence between
    // split and salted sampling from silently diverging under refactors
    val bucket = hashBucket(key, salt = "")
    when(bucket * 1000 < trainPermille * 65536, "train").otherwise("val")
  }

  /** Uniform 0..65535 bucket from a salted md5 of the key. The salt
    * decorrelates independent uses — sampling with the default salt is
    * statistically independent of [[stableSplit]]'s unsalted hash, so a
    * downsampled corpus never skews the train/val boundary.
    */
  def hashBucket(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), key.cast(StringType))), 1, 4), 16, 10)
      .cast(IntegerType)

  /** Deterministic per-stratum sampling predicate: keep a row iff its
    * key's salted hash bucket falls under the stratum's rate (in
    * permyriad, ‱ — 10000 = keep all, 0 = drop all). Pure function of
    * (key, stratum), so the sample is stable across runs, engines, and
    * repartitioning — re-processing 100 TB yields the SAME sample, the
    * property `df.sample()` (seeded per-partition RNG) cannot give
    * once partitioning changes. The rate lookup is a literal when-chain
    * (strata maps are small), fully codegen'd — no join, no UDF.
    */
  def stratifiedKeep(key: Column, stratum: Column,
                     ratesPermyriad: Map[String, Int],
                     defaultPermyriad: Int,
                     salt: String = "s:"): Column = {
    require((defaultPermyriad +: ratesPermyriad.values.toSeq)
      .forall(r => r >= 0 && r <= 10000),
      s"rates must be in [0, 10000] permyriad")
    val rate = ratesPermyriad.foldLeft(lit(defaultPermyriad): Column) {
      case (acc, (s, r)) => when(stratum === s, lit(r)).otherwise(acc)
    }
    // int arithmetic only: 65535 * 10000 < 2^31, exact on any engine
    hashBucket(key, salt) * 10000 < rate * lit(65536)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based pattern redaction for training corpora: replace PII-like
  * spans (emails, phone numbers, IPs, …) with typed placeholder tokens
  * and report how often each rule fired — the scrubbing pass a corpus
  * runs before leaving the trust boundary. Pure per-row
  * `regexp_replace`/`regexp_count` (codegen'd, no UDF, no shuffle).
  *
  * Patterns are deliberately kept in the RE2 ∩ java.util.regex dialect
  * (no backreferences, no lookaround) so the same rule set runs
  * identically on Spark, the DuckDB oracle, and any RE2-based scrubber
  * a downstream team might use.
  *
  * Semantics: `<name>_ct` counts matches in the ORIGINAL text per rule
  * (so counts are rule-order-independent and auditable against the
  * input); the redacted text applies the rules sequentially in list
  * order (so an earlier rule's placeholder is visible to later rules —
  * order the specific before the general).
  */
object Redact {

  final case class Rule(name: String, pattern: String, replacement: String)

  /** Default PII rule set. Conservative recall-oriented shapes — a
    * production scrubber would add locale variants; the operator takes
    * any rule list. Specific before general: ssn and ipv4 run before
    * phone, whose digits-and-separators shape would otherwise swallow
    * them.
    */
  val piiRules: Seq[Rule] = Seq(
    Rule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    Rule("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    Rule("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    Rule("phone", "\\+?[0-9][0-9()\\-. ]{7,}[0-9]", "<PHONE>"))

  /** C4-style bad-words blocklist gate (Raffel et al. 2020 §2.2 drop
    * any page containing a blocklisted word): per-doc total and
    * distinct occurrence counts of blocklisted tokens (case-folded
    * whitespace tokens, the same unit every other text op counts) and
    * the keep verdict `hit_ct == 0`.
    *
    * Scale shape: pure map — the blocklist rides as an array literal
    * (real blocklists are a few hundred words; the lambda probe is
    * CodegenFallback but the row stays in one stage and nothing
    * shuffles). A corpus-sized blocklist would instead explode tokens
    * and broadcast-join the list — the t13 decontam shape — but for
    * the published use case the literal is the right plan at any
    * corpus size.
    */
  def blocklistGate(docs: DataFrame, idCol: String, textCol: String,
                    blocklist: Seq[String]): DataFrame = {
    require(blocklist.nonEmpty, "need at least one blocklisted word")
    val bl = lit(blocklist.map(_.toLowerCase).distinct.toArray)
    val toks = graft.functions.TextFunctions.tokenize(lower(col(textCol)))
    val hits = filter(toks, t => array_contains(bl, t))
    docs.select(col(idCol),
      coalesce(size(hits), lit(0)).cast("long").as("hit_ct"),
      coalesce(size(array_distinct(hits)), lit(0)).cast("long")
        .as("distinct_hit_ct"),
      coalesce(size(hits) === 0, lit(true)).as("kept"))
  }

  /** Adds one `<name>_ct` column per rule plus `redacted`. */
  def redact(docs: DataFrame, textCol: String,
             rules: Seq[Rule] = piiRules): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "rule names must be unique")
    val counted = rules.foldLeft(docs) { (df, r) =>
      df.withColumn(s"${r.name}_ct",
        regexp_count(col(textCol), lit(r.pattern)))
    }
    counted.withColumn("redacted",
      rules.foldLeft(col(textCol)) { (c, r) =>
        regexp_replace(c, r.pattern, r.replacement)
      })
  }

  /** Card-number candidate shape: 13–19 digits with optional single
    * space/dash separators, on word boundaries — RE2 ∩ java.util.regex
    * like every [[piiRules]] pattern.
    */
  val CardCandidate: String = "\\b(?:[0-9][ -]?){12,18}[0-9]\\b"

  /** Luhn checksum over a candidate's digits (ISO/IEC 7812 mod-10:
    * from the rightmost digit, double every second one, subtract 9
    * above 9, sum ≡ 0). Pure higher-order column functions —
    * codegen-friendly, no UDF — so VALIDATION runs in the same stage
    * as extraction.
    */
  def luhnValid(s: Column): Column = {
    val ds = regexp_extract_all(s, lit("[0-9]"), lit(0))
    val n = size(ds)
    val summed = aggregate(
      zip_with(ds, sequence(lit(1), n), (c, i) => {
        val v = c.cast("int")
        when(((n - i) % 2) === 1,
          when(v * 2 > 9, v * 2 - 9).otherwise(v * 2)).otherwise(v)
      }),
      lit(0), (acc, x) => acc + x)
    n >= 13 && n <= 19 && summed % 10 === 0
  }

  /** Deterministic card-bearing payload over the documents table —
    * replayed literally by the SQL oracle. Four id-keyed cases: a
    * Luhn-VALID number with space separators, an invalid one (last
    * digit off), a valid-dashed + invalid pair in one doc (pins
    * multi-candidate extraction and partial redaction), and a bare
    * valid one; plus a short `total N` number that must never match
    * the 13–19-digit candidate shape.
    */
  def withCardPayload(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val id = col(idCol)
    val card = when(id % 4 === 0, lit("4539 1488 0343 6467"))
      .when(id % 4 === 1, lit("4539148803436468"))
      .when(id % 4 === 2,
        lit("6011-0009-9013-9424 and 1234567812345678"))
      .otherwise(lit("5500005555555559"))
    docs.filter(col(textCol).isNotNull)
      .withColumn("page_text", concat(
        lit("order ref "), card,
        lit(" total "), (id % 97).cast("string"),
        lit(" "), col(textCol)))
  }

  /** VALIDATION-CONDITIONAL redaction — the step plain
    * pattern-replace ([[redact]]) can't take: a 16-digit string is
    * only a card number if its Luhn checksum holds, so only
    * checksum-valid candidates are replaced (a phone-length invoice
    * number survives; real PAN leaks die). Per doc: candidates
    * extracted once, each validated in-stage, valid ones folded into
    * the text via literal replaces (longest first, so a candidate
    * containing another as a prefix can't be half-replaced), plus
    * audit counts. Pure map — no shuffle, no UDF.
    */
  def redactCardNumbers(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val cands = regexp_extract_all(col(textCol), lit(CardCandidate),
      lit(0))
    val valid = array_sort(
      filter(cands, c => luhnValid(c)),
      (a, b) => when(length(a) > length(b), -1)
        .when(length(a) < length(b), 1)
        .when(a < b, -1).when(a > b, 1).otherwise(0))
    docs.filter(col(textCol).isNotNull)
      .withColumn("_v", valid)
      .select(col(idCol),
        aggregate(col("_v"), col(textCol),
          (acc, c) => replace(acc, c, lit("<CARD>"))).as("clean_text"),
        coalesce(size(col("_v")), lit(0)).cast("long").as("n_cards"),
        (coalesce(size(cands), lit(0)) -
          coalesce(size(col("_v")), lit(0))).cast("long")
          .as("n_rejected"))
  }
}

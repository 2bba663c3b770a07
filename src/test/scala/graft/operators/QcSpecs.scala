package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Unit specs for the corpus-QC operators (repetition, decontamination,
  * redaction, domain mixing) behind the t12–t15 driver queries.
  */
class RepetitionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("report matches hand-computed counts and fractions") {
    val df = Seq((1L, "a b a b a b"), (2L, "x y z"), (3L, "w"))
      .toDF("doc_id", "text")
    val r = Repetition.report(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    // doc 1: 6 words, 2 distinct; bigrams = [a b, b a, a b, b a, a b]
    assert(r(0).getInt(1) === 6 && r(0).getInt(2) === 2)
    assert(r(0).getInt(3) === 3) // "a b" ×3
    assert(r(0).getDouble(4) === 1.0 - 2.0 / 6.0)
    assert(r(0).getDouble(5) === 3.0 / 5.0)
    // doc 2: all distinct, every bigram unique
    assert(r(1).getInt(3) === 1 && r(1).getDouble(4) === 0.0)
    // doc 3: one word -> no bigrams, null top fraction
    assert(r(2).getInt(3) === 0 && r(2).isNullAt(5))
  }

  test("empty and whitespace-only docs yield zero counts and null ratios") {
    val r = Repetition.report(
      Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text"), "text", "doc_id")
      .collect()
    r.foreach { row =>
      assert(row.getInt(1) === 0 && row.getInt(3) === 0)
      assert(row.isNullAt(4) && row.isNullAt(5))
    }
  }

  test("top bigram count is invariant under token-order rotation of ties") {
    // two different bigrams with equal max count: count is well-defined
    // (the argmax bigram itself is deliberately not exposed)
    val r = Repetition.report(
      Seq((1L, "a b a b c d c d")).toDF("doc_id", "text"), "text", "doc_id")
      .collect()(0)
    assert(r.getInt(3) === 2)
  }

  test("dedupWithin keeps first chunk occurrence, preserves order") {
    // n=3 chunks of doc 1: [a b c, d e f, a b c, g] -> drop the repeat
    val df = Seq(
      (1L, "a b c d e f a b c g"),
      (2L, "x y z"),
      (3L, "p p p p p p")) // chunks [p p p, p p p] -> one survives
      .toDF("doc_id", "text")
    val r = Repetition.dedupWithin(df)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(r(0) === ((1L, "a b c d e f g", 3L, 1L)))
    assert(r(1) === ((2L, "x y z", 1L, 0L)))
    assert(r(2) === ((3L, "p p p", 1L, 1L)))
  }

  test("dedupWithin is local: cross-doc repeats are untouched") {
    val df = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val r = Repetition.dedupWithin(df)
      .select("clean_text").as[String].collect()
    assert(r.toSeq === Seq("a b c", "a b c"))
  }

  test("dedupWithin: null text dropped, trailing partial chunk distinct") {
    // "a b c a b" -> chunks [a b c, a b]: partial tail is NOT the
    // same chunk as the full one
    val df = Seq((1L, "a b c a b"), (2L, null)).toDF("doc_id", "text")
    val r = Repetition.dedupWithin(df)
      .as[(Long, String, Long, Long)].collect()
    assert(r.toSeq === Seq((1L, "a b c a b", 2L, 0L)))
  }
}

class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("wordNgrams slides over tokens; short docs yield empty") {
    val df = Seq(("a b c d", 4), ("a b", 2)).toDF("text", "k")
    val g3 = df.filter($"k" === 4)
      .select(Decontaminate.wordNgrams($"text", 3)).as[Seq[String]].head()
    assert(g3 === Seq("a b c", "b c d"))
    val gShort = df.filter($"k" === 2)
      .select(Decontaminate.wordNgrams($"text", 3)).as[Seq[String]].head()
    assert(gShort === Seq.empty)
  }

  test("report counts DISTINCT overlapping grams per doc, sparsely") {
    val bench = Seq((100L, "p q r s")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "p q r s t"),       // grams p-q-r and q-r-s overlap (2)
      (2L, "p q r p q r"),     // p-q-r twice, distinct -> 1
      (3L, "x y z w")          // no overlap -> absent
    ).toDF("doc_id", "text")
    val r = Decontaminate
      .contaminationReport(corpus, bench, "doc_id", "text", n = 3)
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(r === Array((1L, 2L), (2L, 1L)))
  }

  test("a doc is not contaminated by itself being in the corpus only") {
    val bench = Seq((9L, "a b c")).toDF("doc_id", "text")
    val corpus = Seq((1L, "a b c")).toDF("doc_id", "text")
    val hits = Decontaminate
      .contaminationReport(corpus, bench, "doc_id", "text", n = 3)
      .as[(Long, Long)].collect()
    assert(hits === Array((1L, 1L)))
  }

  test("bloom-prefiltered report equals the exact report") {
    val rnd = new scala.util.Random(11)
    def sentence(): String =
      Seq.fill(8)(s"w${rnd.nextInt(40)}").mkString(" ")
    val bench = (100L to 119L).map(i => (i, sentence())).toDF("doc_id", "text")
    val corpus = ((1L to 60L).map(i => (i, sentence())) ++
      // guaranteed overlap: a few corpus docs quote bench text
      Seq((61L, bench.as[(Long, String)].collect()(3)._2),
          (62L, "quoted " + bench.as[(Long, String)].collect()(7)._2)))
      .toDF("doc_id", "text")
    val exact = Decontaminate
      .contaminationReport(corpus, bench, "doc_id", "text", n = 3)
      .as[(Long, Long)].collect().toSet
    val bloom = Decontaminate
      .contaminationReportBloom(corpus, bench, "doc_id", "text", n = 3)
      .as[(Long, Long)].collect().toSet
    assert(bloom === exact)
    // a deliberately tiny, saturated filter (2^6 bits, 2 probes):
    // plenty of REAL false positives now reach the verify join — and
    // must all die there, leaving output still equal to exact
    val tiny = Decontaminate
      .contaminationReportBloom(corpus, bench, "doc_id", "text", n = 3,
        bitsLog2 = 6, k = 2)
      .as[(Long, Long)].collect().toSet
    assert(tiny === exact)
  }

  test("overlapDecontam: dense fractional verdict, zero-gram docs keep") {
    val bench = Seq((100L, "p q r s")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "p q r s t"),   // 3 distinct 3-grams, 2 hit -> 2/3 > 0.5: drop
      (2L, "p q r x y z"), // 4 distinct, 1 hit -> 0.25 <= 0.5: keep
      (3L, "x y z w"),     // 2 distinct, 0 hit -> 0.0: keep
      (4L, "a b")          // too short: 0 grams, frac 0.0, keep
    ).toDF("doc_id", "text")
    val r = Decontaminate
      .overlapDecontam(corpus, bench, "doc_id", "text", n = 3,
        maxFrac = 0.5)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(r === Array(
      (1L, 3L, 2L, 2.0 / 3.0, false),
      (2L, 4L, 1L, 0.25, true),
      (3L, 2L, 0L, 0.0, true),
      (4L, 0L, 0L, 0.0, true)))
  }

  test("overlapDecontam at maxFrac = 0 is the any-collision rule") {
    val bench = Seq((100L, "p q r")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "p q r t"), (2L, "t u v w")).toDF("doc_id", "text")
    val keep = Decontaminate
      .overlapDecontam(corpus, bench, "doc_id", "text", n = 3,
        maxFrac = 0.0)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(keep === Map(1L -> false, 2L -> true))
  }
}

class RedactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("default PII rules scrub crafted fixtures with correct counts") {
    val df = Seq(
      (1L, "mail bob@example.com and alice@test.org, call +1 (555) 123-4567"),
      (2L, "server 10.0.0.1 ssn 123-45-6789"),
      (3L, "nothing sensitive here")).toDF("doc_id", "text")
    val r = Redact.redact(df, "text").orderBy("doc_id").collect()
    assert(r(0).getAs[Int]("email_ct") === 2)
    assert(r(0).getAs[Int]("phone_ct") === 1)
    val red1 = r(0).getAs[String]("redacted")
    assert(red1.contains("<EMAIL>") && red1.contains("<PHONE>"))
    assert(!red1.contains("example.com") && !red1.contains("555"))
    assert(r(1).getAs[Int]("ipv4_ct") === 1 && r(1).getAs[Int]("ssn_ct") === 1)
    val red2 = r(1).getAs[String]("redacted")
    assert(red2 === "server <IP> ssn <SSN>")
    assert(r(2).getAs[String]("redacted") === "nothing sensitive here")
    assert(r(2).getAs[Int]("email_ct") === 0)
  }

  test("counts are measured on the original text, not intermediate output") {
    // rule 1 rewrites 'aa' to 'b'; rule 2 counts 'b' — must see only the
    // original single 'b', not the two introduced by rule 1
    val rules = Seq(Redact.Rule("r1", "aa", "b"), Redact.Rule("r2", "b", "c"))
    val r = Redact.redact(Seq((1L, "aa aa b")).toDF("doc_id", "text"),
      "text", rules).collect()(0)
    assert(r.getAs[Int]("r1_ct") === 2)
    assert(r.getAs[Int]("r2_ct") === 1)
    assert(r.getAs[String]("redacted") === "c c c") // sequential application
  }

  test("duplicate rule names are rejected") {
    intercept[IllegalArgumentException] {
      Redact.redact(Seq((1L, "x")).toDF("doc_id", "text"), "text",
        Seq(Redact.Rule("a", "x", "y"), Redact.Rule("a", "y", "z")))
    }
  }

  test("Luhn validation: known valid/invalid, separators, length bounds") {
    val got = Seq(
      "4539148803436467",    // valid
      "4539148803436468",    // checksum off by one
      "4539 1488 0343 6467", // valid with spaces
      "6011-0009-9013-9424", // valid with dashes
      "123456789012",        // 12 digits: below the PAN range
      "0000000000000")       // 13 zeros: sum 0 -> technically valid
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
      .select(col("id"), Redact.luhnValid(col("s")).as("v"))
      .as[(Long, Boolean)].collect().toMap
    assert(got === Map(0L -> true, 1L -> false, 2L -> true,
      3L -> true, 4L -> false, 5L -> true))
  }

  test("card redaction: only checksum-valid candidates die; counts audit both") {
    val df = Seq(
      (1L, "pay 4539 1488 0343 6467 ref 1234567812345678 end"),
      (2L, "invoice 4539148803436468 total 12"),
      (3L, "clean")).toDF("doc_id", "text")
    val r = Redact.redactCardNumbers(df, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // doc 1: the valid spaced number dies, the invalid 16-digit
    // neighbor survives verbatim
    assert(r(1L) === (("pay <CARD> ref 1234567812345678 end", 1L, 1L)))
    assert(r(2L) === (("invoice 4539148803436468 total 12", 0L, 1L)))
    assert(r(3L) === (("clean", 0L, 0L)))
  }
}

class MixingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("kept set fills but never undershoots the budget (overshoot ≤ 1 doc)") {
    val mixed = Mixing.mixByTokenBudget(docs, "source", "doc_id",
      graft.functions.TextFunctions.nTokens(col("text")),
      Map.empty, defaultBudget = 500L)
    val perDomain = mixed.filter($"kept")
      .groupBy($"source")
      .agg(sum(graft.functions.TextFunctions.nTokens(col("text"))).as("tok"),
        max($"tok_prefix").as("max_pre"))
      .collect()
    perDomain.foreach { r =>
      val tok = r.getLong(1)
      val maxPre = r.getLong(2)
      assert(maxPre < 500L, s"${r.getString(0)}: a kept doc started past budget")
      // every kept doc's exclusive prefix < budget and the last one
      // starts before 500, so total < 500 + one doc length
      assert(tok >= math.min(500L, tok)) // non-vacuous only with the next check
      val dropped = Mixing.mixByTokenBudget(docs, "source", "doc_id",
        graft.functions.TextFunctions.nTokens(col("text")),
        Map.empty, defaultBudget = 500L)
        .filter(!$"kept" && $"source" === r.getString(0)).count()
      if (dropped > 0) assert(tok >= 500L, "undershoot with drops remaining")
    }
  }

  test("selection is deterministic under repartitioning") {
    def keptIds(df: org.apache.spark.sql.DataFrame) =
      Mixing.mixByTokenBudget(df, "source", "doc_id",
        graft.functions.TextFunctions.nTokens(col("text")),
        Map("src0" -> 200L), defaultBudget = 400L)
        .filter($"kept").select("doc_id").as[Long].collect().sorted.toSeq
    assert(keptIds(docs) === keptIds(docs.repartition(13)))
  }

  test("two-phase scan equals the single-window formulation") {
    import org.apache.spark.sql.expressions.Window
    val tf = graft.functions.TextFunctions
    val single = docs
      .withColumn("_pr", tf.hashBucket(col("doc_id"), "m:"))
      .withColumn("pre_ref",
        coalesce(sum(tf.nTokens(col("text")))
          .over(Window.partitionBy($"source").orderBy($"_pr", $"doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"doc_id", $"pre_ref")
    val twoPhase = Mixing.mixByTokenBudget(docs, "source", "doc_id",
      tf.nTokens(col("text")), Map.empty, defaultBudget = Long.MaxValue,
      buckets = 8)
      .select($"doc_id", $"tok_prefix")
    val diff = twoPhase.join(single, "doc_id")
      .filter($"tok_prefix" =!= $"pre_ref").count()
    assert(diff === 0)
  }

  test("null ids pass through unkept; zero budget keeps nothing") {
    val df = Seq((Some(1L), "s", "a b"), (None, "s", "c d"))
      .toDF("doc_id", "source", "text")
    val r = Mixing.mixByTokenBudget(df, "source", "doc_id",
      graft.functions.TextFunctions.nTokens(col("text")),
      Map.empty, defaultBudget = 100L)
    assert(r.count() === 2)
    val nullRow = r.filter($"doc_id".isNull).collect()(0)
    assert(!nullRow.getAs[Boolean]("kept"))
    val zero = Mixing.mixByTokenBudget(df.filter($"doc_id".isNotNull),
      "source", "doc_id",
      graft.functions.TextFunctions.nTokens(col("text")),
      Map.empty, defaultBudget = 0L)
    assert(zero.filter($"kept").count() === 0)
  }

  test("prioritySample: exact k per stratum, repartition-stable") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      Mixing.prioritySample(df, "source", "doc_id",
        graft.functions.TextFunctions.nTokens(col("text")), k = 3)
        .select("doc_id").as[Long].collect().sorted.toSeq
    val a = ids(docs)
    assert(a === ids(docs.repartition(13)))
    val perSource = Mixing.prioritySample(docs, "source", "doc_id",
        graft.functions.TextFunctions.nTokens(col("text")), k = 3)
      .groupBy("source").count().as[(String, Long)].collect()
    perSource.foreach { case (s, n) => assert(n === 3L, s) }
  }

  test("prioritySample inclusion tracks weight (heavier wins on ties of u)") {
    // one stratum, two weight classes with identical id-hash
    // distribution: the heavy class must be over-represented roughly
    // ∝ weight (10×) — a loose statistical check on the u/w rule
    val rows = (1L to 2000L).map(i => (i, "s", if (i % 2 == 0) 10.0 else 1.0))
    val df = rows.toDF("doc_id", "source", "w")
    val kept = Mixing.prioritySample(df, "source", "doc_id", col("w"), k = 200)
      .select("doc_id").as[Long].collect()
    val heavy = kept.count(_ % 2 == 0)
    assert(heavy > 150, s"heavy class underrepresented: $heavy of 200")
    // and zero/null weights are never sampled
    val z = Seq((1L, "s", 0.0), (2L, "s", 5.0)).toDF("doc_id", "source", "w")
    assert(Mixing.prioritySample(z, "source", "doc_id", col("w"), k = 5)
      .select("doc_id").as[Long].collect().toSeq === Seq(2L))
  }

  test("thresholded two-pass sample equals the one-pass rank bit-for-bit") {
    val tf = graft.functions.TextFunctions
    def ids(f: (org.apache.spark.sql.DataFrame, String, String,
        org.apache.spark.sql.Column, Int) => org.apache.spark.sql.DataFrame,
        df: org.apache.spark.sql.DataFrame, k: Int) =
      f(df, "source", "doc_id", tf.nTokens(col("text")), k)
        .select("doc_id").as[Long].collect().sorted.toSeq
    // small k (heavy pruning), k larger than some strata (keep-all
    // path), and a skewed-weight frame (octaves spread wide)
    for (k <- Seq(1, 5, 1000)) {
      assert(ids(Mixing.prioritySampleThresholded, docs, k) ===
        ids(Mixing.prioritySample, docs, k), s"k=$k")
    }
    val skewed = (1L to 500L)
      .map(i => (i, s"s${i % 3}", math.pow(10.0, (i % 7).toDouble)))
      .toDF("doc_id", "source", "w")
    val a = Mixing.prioritySampleThresholded(skewed, "source", "doc_id",
      col("w"), 7).select("doc_id").as[Long].collect().sorted.toSeq
    val b = Mixing.prioritySample(skewed, "source", "doc_id",
      col("w"), 7).select("doc_id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("thresholded sample: null strata group together; tiny strata kept whole") {
    val df = Seq((Some("x"), 1L), (None, 2L), (None, 3L), (None, 4L))
      .map { case (s, i) => (i, s.orNull, 1.0) }
      .toDF("doc_id", "source", "w")
    val out = Mixing.prioritySampleThresholded(df, "source", "doc_id",
      col("w"), k = 2)
    // the x-stratum has 1 row (< k: kept whole); nulls form one
    // stratum and yield exactly k
    assert(out.filter($"source".isNull).count() === 2L)
    assert(out.filter($"source" === "x").count() === 1L)
  }
}

class DupSpansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("grams shared across docs are flagged; per-doc counts are exact") {
    val df = Seq(
      (1L, "p q r s t"),         // grams: "p q r s", "q r s t"
      (2L, "p q r s"),           // gram:  "p q r s"
      (3L, "x y z w p q r s"),   // 5 grams, one shared
      (4L, "a b c"))             // too short for a 4-gram
      .toDF("doc_id", "text")
    val r = DupSpans.report(df, "doc_id", "text", n = 4)
      .orderBy("doc_id").collect()
    assert(r(0).getLong(1) === 2 && r(0).getLong(2) === 1)
    assert(r(0).getDouble(3) === 0.5)
    assert(r(1).getLong(1) === 1 && r(1).getLong(2) === 1)
    assert(r(1).getDouble(3) === 1.0)
    assert(r(2).getLong(1) === 5 && r(2).getLong(2) === 1)
    assert(r(2).getDouble(3) === 0.2)
    // no gram slots -> zero counts, null fraction (no signal)
    assert(r(3).getLong(1) === 0 && r(3).getLong(2) === 0)
    assert(r(3).isNullAt(3))
  }

  test("multiplicity counts: repeating a shared span raises dup_grams") {
    val df = Seq(
      (1L, "p q r s p q r s"),   // "p q r s" x2 of 5 grams
      (2L, "p q r s"))
      .toDF("doc_id", "text")
    val r = DupSpans.report(df, "doc_id", "text", n = 4)
      .orderBy("doc_id").collect()
    assert(r(0).getLong(1) === 5 && r(0).getLong(2) === 2)
  }

  test("intra-doc repeats alone are not cross-doc duplication") {
    val df = Seq(
      (1L, "m n o p m n o p"),
      (2L, "completely different words here"))
      .toDF("doc_id", "text")
    val r = DupSpans.report(df, "doc_id", "text", n = 4)
      .orderBy("doc_id").collect()
    assert(r(0).getLong(2) === 0 && r(1).getLong(2) === 0)
  }

  test("removal cuts exactly the tokens covered by cross-doc 4-grams") {
    val df = Seq(
      (1L, "a b p q r s c d"),   // shares "p q r s" with doc 2
      (2L, "zz p q r s yy"),
      (3L, "a b c"),             // too short: untouched
      (4L, "m n o w m n o w"))   // intra-doc repeat only: untouched
      .toDF("doc_id", "text")
    val out = DupSpans.removeDupSpans(df, "doc_id", "text", n = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) === ((1L, 8L, 4L, "a b c d")))
    assert(out(1) === ((2L, 6L, 4L, "zz yy")))
    assert(out(2) === ((3L, 3L, 0L, "a b c")))
    assert(out(3) === ((4L, 8L, 0L, "m n o w m n o w")))
    // consistency: n_removed == n_tokens - tokens(cleaned)
    out.foreach { case (_, n, rm, txt) =>
      assert(n - rm === txt.split(" ").count(_.nonEmpty).toLong)
    }
  }

  test("removal: overlapping dup grams erase the union of their spans") {
    // docs share "p q r s" AND "q r s t": doc 1's covered region is
    // positions 1..5 (the union), leaving only the tail
    val df = Seq(
      (1L, "p q r s t end"),
      (2L, "p q r s"),
      (3L, "q r s t"))
      .toDF("doc_id", "text")
    val out = DupSpans.removeDupSpans(df, "doc_id", "text", n = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) === ((1L, 6L, 5L, "end")))
    assert(out(1) === ((2L, 4L, 4L, "")))
    assert(out(2) === ((3L, 4L, 4L, "")))
  }

  private def spans(df: org.apache.spark.sql.DataFrame, minLen: Int) =
    DupSpans.exactSubstrings(df, "doc_id", "text", minLen)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

  test("exactSubstrings: >= minLen shared runs found, shorter untouched") {
    val df = Seq(
      (1L, "x1 x2 a b c d e f y1 y2"), // shared 6-run at tokens 3..8
      (2L, "z1 a b c d e f z2"),       // same run at tokens 2..7
      (3L, "p q r s completely other stuff here"), // 4-token overlap only
      (4L, "p q r s different tail words now"))
      .toDF("doc_id", "text")
    val out = spans(df, minLen = 5)
    // overlapping windows (starts 3,4 / 2,3) merge into ONE maximal
    // span of 6 tokens per doc; the 4-token "p q r s" overlap is
    // below the threshold and reports nothing
    assert(out === Seq(
      (1L, 3L, 8L, 6L, 2L),
      (2L, 2L, 7L, 6L, 2L)))
  }

  test("exactSubstrings: touching ranges merge, gapped ranges split") {
    val df = Seq(
      (7L, "a b c d e f g h i j"),     // runs adjacent: one 10-token span
      (8L, "a b c d e X f g h i j"))   // same runs split by X: two spans
      .toDF("doc_id", "text")
    val out = spans(df, minLen = 5)
    assert(out === Seq(
      (7L, 1L, 10L, 10L, 2L),          // starts {1,6}: 6 <= 1+5 -> merged
      (8L, 1L, 5L, 5L, 1L),            // starts {1,7}: 7 > 1+5 -> split
      (8L, 7L, 11L, 5L, 1L)))
  }

  test("exactSubstrings: intra-doc repeats alone are not duplication") {
    val df = Seq(
      (9L, "a b c d e a b c d e"),     // window repeats within ONE doc
      (10L, "totally unrelated words with no overlap at all ok"))
      .toDF("doc_id", "text")
    assert(spans(df, minLen = 5).isEmpty)
  }

  test("exactSubstrings: a doc shorter than minLen can never report") {
    val df = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    assert(spans(df, minLen = 5).isEmpty)
    // at minLen = 3 the same pair IS an exact duplicate
    assert(spans(df, minLen = 3) === Seq(
      (1L, 1L, 3L, 3L, 1L), (2L, 1L, 3L, 3L, 1L)))
  }

  test("removeExactSubstrings: keep-first — the lowest-id copy survives") {
    val df = Seq(
      (1L, "a b c d e tail1 x"),   // canonical holder of "a b c d e"
      (2L, "pre a b c d e post"),  // duplicate: run cut
      (3L, "a b c d e"))           // duplicate: whole doc cut
      .toDF("doc_id", "text")
    val out = DupSpans.removeExactSubstrings(df, "doc_id", "text", minLen = 5)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, 7L, 0L, "a b c d e tail1 x"), // keeper untouched
      (2L, 7L, 5L, "pre post"),
      (3L, 5L, 5L, "")))
  }

  test("removeExactSubstrings: shorter-than-minLen overlaps untouched") {
    val df = Seq(
      (1L, "p q r s one two three"),
      (2L, "p q r s four five six"))  // only a 4-token overlap
      .toDF("doc_id", "text")
    val out = DupSpans.removeExactSubstrings(df, "doc_id", "text", minLen = 5)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out.forall(_._3 == 0L), out.toString)
  }
}

class ChunkingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(text: String, window: Int, stride: Int) =
    Chunking.slidingChunks(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", window, stride)
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk_text", "n_tokens")
      .as[(Int, String, Int)].collect().toSeq

  test("overlapping windows cover every token; tail chunk is short") {
    val out = run("a b c d e", window = 4, stride = 2)
    assert(out === Seq((0, "a b c d", 4), (1, "c d e", 3)))
  }

  test("a doc at or under the window is one chunk; empty docs vanish") {
    assert(run("a b c", 4, 2) === Seq((0, "a b c", 3)))
    assert(run("a b c d", 4, 2) === Seq((0, "a b c d", 4)))
    assert(run("   ", 4, 2).isEmpty)
  }

  test("stride == window tiles without overlap and without gaps") {
    val out = run((1 to 10).map(i => s"t$i").mkString(" "), 4, 4)
    assert(out.map(_._2) === Seq("t1 t2 t3 t4", "t5 t6 t7 t8", "t9 t10"))
    assert(out.map(_._3) === Seq(4, 4, 2))
  }
}

class ReviewRegressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("thresholded sampler keeps underfull strata whole, incl. +Inf/NaN priorities") {
    import org.apache.spark.sql.functions.col
    // stratum "a": 3 rows, k = 5 (underfull -> +Inf cutoff); one
    // subnormal weight overflows priority to +Inf, one NaN weight
    // yields a NaN priority — both must survive, as the exact sampler
    // keeps them
    val docs = Seq(
      ("a", 1L, 1.0), ("a", 2L, java.lang.Double.MIN_VALUE),
      ("a", 3L, Double.NaN),
      ("b", 10L, 1.0), ("b", 11L, 2.0)
    ).toDF("source", "doc_id", "w")
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id").as[Long].collect().toSet
    val exact = Mixing.prioritySample(docs, "source", "doc_id", col("w"), k = 5)
    val twoPass = Mixing.prioritySampleThresholded(
      docs, "source", "doc_id", col("w"), k = 5)
    assert(ids(exact) === ids(twoPass))
    assert(ids(twoPass).intersect(Set(2L, 3L)) === Set(2L, 3L))
  }

  test("rangeJoin drops inverted intervals and raises on sentinel-width ones") {
    import org.apache.spark.sql.functions.col
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val points = Seq((1L, ts(100))).toDF("pid", "pts")
    // inverted interval (corrupt row): silently contributes nothing
    val inverted = Seq((ts(500), ts(100), "inv"), (ts(50), ts(150), "ok"))
      .toDF("s", "e", "tag")
    val out = Temporal.rangeJoin(points, "pts", inverted, "s", "e",
        bucketMicros = 60000000L)
      .select("tag").as[String].collect().toSeq
    assert(out === Seq("ok"))
    // an open-ended sentinel at a fine bucket must raise, not allocate
    val sentinel = Seq((ts(0), java.sql.Timestamp.valueOf("9999-12-31 00:00:00"),
      "open")).toDF("s", "e", "tag")
    val err = intercept[Exception] {
      Temporal.rangeJoin(points, "pts", sentinel, "s", "e",
        bucketMicros = 60000000L).collect()
    }
    assert(err.getMessage.contains("rangeJoin") ||
      (err.getCause != null && err.getCause.getMessage.contains("rangeJoin")))
  }

  test("funnel rejects repeated stage names") {
    val e = intercept[IllegalArgumentException] {
      Funnel.firstReached(
        Seq(("u", new java.sql.Timestamp(0L), "view")).toDF("k", "ts", "t"),
        "k", "ts", "t", Seq("view", "click", "view"))
    }
    assert(e.getMessage.contains("distinct"))
  }

  test("mixByTokenBudget treats null and empty domains as ONE budgeted group") {
    import org.apache.spark.sql.functions.col
    // budget for "" = 60 tokens; null-domain rows fold into the same
    // group and must draw from the SAME budget, not defaultBudget
    val docs = (1 to 20).map(i =>
      (if (i % 2 == 0) null else "", i.toLong, 10L))
      .toDF("dom", "doc_id", "w")
    val out = Mixing.mixByTokenBudget(docs, "dom", "doc_id", col("w"),
      budgets = Map("" -> 60L), defaultBudget = 1000000L, buckets = 4)
    val kept = out.filter(col("kept")).count()
    // 60-token budget over 10-token docs → ~6 kept (±1 per bucket
    // boundary), NOT all 20 (which defaultBudget would admit)
    assert(kept >= 5 && kept <= 10, s"kept $kept")
  }
}

class StreamingExactSubstrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def collectSpans(
      buf: scala.collection.mutable.Set[(Long, Long, Long, Long, Long)])
      (id: Long, df: org.apache.spark.sql.DataFrame): Unit =
    buf ++= df.as[(Long, Long, Long, Long, Long)].collect()

  test("one batch equals the batch operator exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val indexDir = java.nio.file.Files
      .createTempDirectory("t38s").toString + "/idx"
    val rows = Seq(
      (1L, "x1 x2 a b c d e f y1 y2"),
      (2L, "z1 a b c d e f z2"),
      (3L, "p q r s completely other stuff here"))
    val found = scala.collection.mutable.Set[(Long, Long, Long, Long, Long)]()
    val input = MemoryStream[(Long, String)]
    val q = DupSpans.streamingExactSubstrings(
        input.toDF().toDF("doc_id", "text"), indexDir,
        collectSpans(found), minLen = 5)
      .start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
    } finally q.stop()
    val batch = DupSpans.exactSubstrings(
        rows.toDF("doc_id", "text"), "doc_id", "text", minLen = 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(found.toSet === batch)
    assert(batch.nonEmpty)
  }

  test("cross-batch: a later copy reports the span against history") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("t38s2").toString
    val found = scala.collection.mutable.Set[(Long, Long, Long, Long, Long)]()
    val input = MemoryStream[(Long, String)]
    def start() = DupSpans.streamingExactSubstrings(
        input.toDF().toDF("doc_id", "text"), s"$base/idx",
        collectSpans(found), minLen = 5)
      .option("checkpointLocation", s"$base/ckpt").start()
    val q1 = start()
    try {
      input.addData((1L, "x1 x2 a b c d e f y1 y2"),
        (9L, "totally unrelated words with no overlap whatsoever ok"))
      q1.processAllAvailable()
      assert(found.isEmpty) // nothing duplicated within batch 1
      input.addData((2L, "z1 a b c d e f z2"))
      q1.processAllAvailable()
      // only the LATER copy reports (arrival-time detection): tokens
      // 2..7 of doc 2, merged from starts {2,3}
      assert(found.toSet === Set((2L, 2L, 7L, 6L, 2L)))
    } finally q1.stop()
    // restart from the checkpoint: the index survives, a third copy
    // still sees the full history
    found.clear()
    val q2 = start()
    try {
      input.addData((3L, "a b c d e f"))
      q2.processAllAvailable()
      assert(found.toSet === Set((3L, 1L, 6L, 6L, 2L)))
    } finally q2.stop()
  }
}

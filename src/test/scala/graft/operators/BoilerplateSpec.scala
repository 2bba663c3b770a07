package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[Boilerplate]] — the document-frequency threshold boundary,
  * original-order rebuild, removal accounting, and the broadcast-back
  * plan shape of corpus-wide line dedup.
  */
class BoilerplateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def doc(id: Long, lines: String*): (Long, String) =
    id -> lines.mkString("\n")

  test("threshold boundary: df >= minDocs dies everywhere, df < minDocs survives") {
    // "footer" in 4 docs (= minDocs) -> removed; "quote" in 3 -> kept
    val docs = Seq(
      doc(1L, "alpha one", "quote", "footer"),
      doc(2L, "beta two", "quote", "footer"),
      doc(3L, "gamma three", "quote", "footer"),
      doc(4L, "delta four", "footer")).toDF("doc_id", "text")
    val got = Boilerplate.lineDedup(docs)
      .select(col("doc_id"), col("clean_text"), col("n_removed"))
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === (("alpha one\nquote", 1L)))
    assert(got(4L) === (("delta four", 1L)))
  }

  test("df counts DISTINCT docs: a line repeated within one doc counts once") {
    // "dup" appears 3 times in doc 1 but in only 2 distinct docs -> kept
    val docs = Seq(
      doc(1L, "dup", "dup", "dup", "body a"),
      doc(2L, "dup", "body b"),
      doc(3L, "body c"),
      doc(4L, "body d")).toDF("doc_id", "text")
    val got = Boilerplate.lineDedup(docs, minDocs = 3)
      .filter(col("doc_id") === 1L)
      .select(col("n_removed"), col("clean_text"))
      .as[(Long, String)].collect().head
    assert(got === ((0L, "dup\ndup\ndup\nbody a")))
  }

  test("rebuild preserves original line order; counts account chars") {
    val docs = Seq(
      doc(1L, "bp", "z content", "bp", "a content"),
      doc(2L, "bp"), doc(3L, "bp"), doc(4L, "bp"))
      .toDF("doc_id", "text")
    val r = Boilerplate.lineDedup(docs)
      .filter(col("doc_id") === 1L)
      .select(col("clean_text"), col("n_lines"), col("n_removed"),
        col("chars_removed"))
      .as[(String, Long, Long, Long)].collect().head
    // z before a: idx order, not lexical; both bp occurrences cut
    assert(r === (("z content\na content", 4L, 2L, 4L)))
    // a doc reduced to nothing keeps an empty clean_text row
    val empty = Boilerplate.lineDedup(docs)
      .filter(col("doc_id") === 2L)
      .select(col("clean_text")).as[String].collect().head
    assert(empty === "")
  }

  test("payload: every doc keeps its page-bucket line (df <= 3 by construction)") {
    val docs = (0L until 40L).map(i => (i, s"w$i x y z")).toDF("doc_id", "text")
    val out = Boilerplate.lineDedup(
      Boilerplate.withLinePayload(docs), textCol = "page_text")
    assert(out.count() === 40L)
    assert(out.filter(!col("clean_text").contains("page ")).count() === 0L)
    // host header/footer (df = 10 per host here) die everywhere
    assert(out.filter(col("clean_text").contains("copyright")).count() === 0L)
    assert(out.filter(col("clean_text").contains("about")).count() === 0L)
  }

  test("plan: the apply pass is map-only — one broadcast scalar frame, no corpus shuffle") {
    val docs = Seq(doc(1L, "a"), doc(2L, "a"), doc(3L, "b"), doc(4L, "a"))
      .toDF("doc_id", "text")
    val plan = Boilerplate.applyLineDedup(docs,
        Boilerplate.frequentLines(docs))
      .queryExecution.executedPlan.toString
    // the 1-row frequent-line array broadcast-nested-loop joins; the
    // corpus side itself never exchanges (the only Exchanges in the
    // plan belong to the frequentLines build)
    assert(plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin"))
    // the default path: frequent set broadcasts back as a hash join
    val plan2 = Boilerplate.lineDedup(docs)
      .queryExecution.executedPlan.toString
    assert(plan2.contains("BroadcastHashJoin"))
    assert(!plan2.contains("SortMergeJoin"))
  }

  test("staged apply over shards == one-shot lineDedup (path equality)") {
    val docs = (0L until 24L).map(i => (i, s"w$i x y z")).toDF("doc_id", "text")
    val payload = Boilerplate.withLinePayload(docs)
    val oneShot = Boilerplate.lineDedup(payload, textCol = "page_text")
      .collect().map(_.toSeq).toSet
    // the deployment shape: build the frequent list ONCE over the
    // whole corpus, apply it per shard map-only
    val fl = Boilerplate.frequentLines(payload, textCol = "page_text")
    val sharded = Seq(payload.filter(col("doc_id") < 12L),
        payload.filter(col("doc_id") >= 12L))
      .map(sh => Boilerplate.applyLineDedup(sh, fl,
        textCol = "page_text"))
      .reduce(_.unionByName(_)).collect().map(_.toSeq).toSet
    assert(sharded === oneShot)
  }
}

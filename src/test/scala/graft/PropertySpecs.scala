package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.streaming.{StatefulOps, StatsJobs, WideJobs}

/** Property tests (SURVEY.md §5): scalacheck generators produce the
  * inputs, a single Spark job evaluates the operator over the whole
  * generated batch, and every row is checked against an independent
  * in-memory reference implementation. One job per property keeps the
  * suite fast while still covering generated edge cases (empty docs,
  * repeated words, timestamp skew, equal timestamps).
  */
class PropertySpecs extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic sample of `n` values from a Gen (fixed seed — the
    * suite must be reproducible).
    */
  private def sample[A](g: Gen[A], n: Int, seed: Long = 42L): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private val wordGen: Gen[String] =
    Gen.oneOf("the", "cat", "sat", "on", "a", "mat", "dog", "ran", "x9", "", "  ")
  private val docGen: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("minhash signatures equal the per-doc md5-min reference for generated docs") {
    val docs = sample(docGen, 60).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val sigs = Dedup.signatures(df, numHashes = 4)
      .as[(Long, String, String, String, String)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4, r._5)).toMap
    // reference: distinct 3-word shingles (short docs → whole text),
    // min of md5("k:" + shingle) per seed
    def refShingles(text: String): Seq[String] = {
      val words = text.split(" ", -1).toSeq
      val starts = 1 to math.max(words.size - 2, 1)
      starts.map(i => words.slice(i - 1, i - 1 + 3).filter(_ != null).mkString(" ")).distinct
    }
    docs.foreach { case (id, text) =>
      val sh = refShingles(text)
      val expected = (0 until 4).map(k => sh.map(s => md5hex(s"$k:$s")).min)
      assert(sigs(id) === expected, s"doc $id text='$text'")
    }
  }

  test("exact dedup is total and idempotent on generated corpora") {
    val docs = sample(docGen, 80).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val first = Dedup.exact(df)
    // total: every row lands in exactly one group
    assert(first.agg(sum("dup_ct")).as[Long].head() === docs.size.toLong)
    // idempotent: keepers are all unique on a second pass
    val keepers = first.select(col("keeper_id").as("doc_id"))
      .join(df, "doc_id")
    val second = Dedup.exact(keepers)
    assert(second.filter(col("dup_ct") =!= 1L).count() === 0L)
  }

  test("interval join equals the brute-force predicate under timestamp skew") {
    val base = 1620000000000L
    val leftGen = for {
      id <- Gen.chooseNum(0, 19)
      off <- Gen.chooseNum(-30000, 30000)
    } yield (id.toLong, base + off)
    val rightGen = for {
      key <- Gen.chooseNum(0, 19)
      off <- Gen.chooseNum(-30000, 30000)
    } yield (key.toLong, base + off)
    val ls = sample(leftGen, 60).distinct
    val rs = sample(rightGen, 120).distinct
    val l = ls.toDF("id", "lts").withColumn("lt", timestamp_millis(col("lts")))
    val r = rs.toDF("okey", "rts").withColumn("rt", timestamp_millis(col("rts")))
    val joined = WideJobs.intervalJoin(l, r, "id", "okey", "lt", "rt",
        "-5 seconds", "5 seconds")
      .select(col("id"), col("lts"), col("rts"))
      .as[(Long, Long, Long)].collect().toSet
    val expected = (for {
      (id, lts) <- ls
      (key, rts) <- rs
      if key == id && rts >= lts - 5000 && rts <= lts + 5000
    } yield (id, lts, rts)).toSet
    assert(joined === expected)
  }

  test("batch bounce detection equals an in-memory session replay") {
    val evGen = for {
      mid <- Gen.oneOf("m1", "m2", "m3", "m4")
      off <- Gen.chooseNum(0, 120000)
      entry <- Gen.oneOf(true, true, false) // bias toward entries
    } yield (mid, 1620000000000L + off, if (entry) null else "prev")
    // one event per (mid, ts): lead() over timestamp ties is
    // order-ambiguous and the replay would not be well-defined
    val evs = sample(evGen, 80).distinctBy(e => (e._1, e._2))
    val df = evs.toDF("mid", "ts", "last_page_id")
    val out = StatefulOps.bounceBatch(df, gapMillis = 10000L)
      .select("mid", "ts").as[(String, Long)].collect().toSet
    // reference replay: an entry bounces iff no same-mid event follows
    // within the gap (bounceBatch's lead() is over ALL events)
    val expected = (for {
      (mid, ts, lp) <- evs
      if lp == null
      next = evs.filter(e => e._1 == mid && e._2 > ts).map(_._2).sorted.headOption
      if next.forall(_ - ts > 10000L)
    } yield (mid, ts)).toSet
    assert(out === expected)
  }

  test("sessionStats sessions are gap-separated, non-overlapping, and total") {
    val evGen = for {
      uid <- Gen.chooseNum(0, 9)
      off <- Gen.chooseNum(0, 600)
    } yield (uid.toLong, 1620000000L + off * 1000L)
    val evs = sample(evGen, 150).distinct
    val df = evs.toDF("user_id", "tsl")
      .withColumn("ts", timestamp_millis(col("tsl")))
    val sessions = StatsJobs.sessionStats(df, gap = "30 seconds")
      .select(col("user_id"), col("stt").cast("long") * 1000,
        col("edt").cast("long") * 1000, col("ev_ct"))
      .as[(Long, Long, Long, Long)].collect()
    assert(sessions.map(_._4).sum === evs.size.toLong) // total
    sessions.groupBy(_._1).foreach { case (uid, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          assert(s2 >= e1, s"user $uid sessions overlap") // gap-separated
        case _ =>
      }
      // every session's span is covered by events no more than gap apart
      sorted.foreach { case (_, s, e, ct) =>
        val inSession = evs.filter(ev => ev._1 == uid && ev._2 >= s && ev._2 < e)
        assert(inSession.size.toLong === ct)
        assert(e === inSession.map(_._2).max + 30000L) // end = last + gap
      }
    }
  }

  test("bucketed ANN paths are consistent with brute force on real embeddings") {
    import graft.operators.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") % 50 === 0)
    // brute-force scores for every (query, neighbor) pair — ground truth
    val truth = Similarity.bruteForceKnn(e, q, k = Int.MaxValue)
      .select(col("q_id"), col("n_id"), col("cos_sim"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    // each bucketed result must carry EXACTLY the brute-force cosine
    // (same kernel, same inputs), and ranks must be locally consistent
    Seq(Similarity.ivfKnn(e, q, k = 3), Similarity.lshKnn(e, q, k = 3))
      .foreach { df =>
        val rows = df.select(col("q_id"), col("n_id"), col("rnk"), col("cos_sim"))
          .as[(Long, Long, Int, Double)].collect()
        assert(rows.nonEmpty)
        rows.foreach { case (a, b, _, c) => assert(truth((a, b)) === c) }
        rows.groupBy(_._1).values.foreach { g =>
          val byRank = g.sortBy(_._3).map(_._4)
          assert(byRank.zip(byRank.tail).forall { case (x, y) => x >= y })
        }
      }
  }

  test("CJK forward-maximum-matching tokens always rejoin to the input") {
    import graft.functions.CjkSegmenter
    val dictWords = CjkSegmenter.defaultDict.toSeq.sorted
    val pieceGen = Gen.oneOf(
      Gen.oneOf(dictWords),
      Gen.oneOf("中", "文", "字", "符"),     // non-dictionary CJK singles
      Gen.oneOf("abc", "x1", ""))
    val textGen = Gen.chooseNum(0, 8)
      .flatMap(n => Gen.listOfN(n, pieceGen)).map(_.mkString)
    sample(textGen, 120).foreach { t =>
      val toks = CjkSegmenter.segment(t)
      // segmentation is a partition of the input: concatenating the
      // tokens reproduces it exactly (whitespace-free inputs here)
      assert(toks.mkString === t, s"input='$t' tokens=$toks")
    }
  }

  test("stableSplit assignment is invariant under repartitioning and rerun") {
    import graft.functions.TextFunctions
    val ids = sample(Gen.chooseNum(0L, 1000000L), 200).distinct
    def assign(parts: Int): Map[Long, String] =
      ids.toDF("doc_id").repartition(parts)
        .select(col("doc_id"), TextFunctions.stableSplit(col("doc_id")).as("s"))
        .as[(Long, String)].collect().toMap
    val a = assign(1)
    assert(assign(7) === a && assign(32) === a) // layout-independent
    // ratio lands near the requested 90/10 (md5 uniformity)
    val trainFrac = a.values.count(_ == "train").toDouble / a.size
    assert(trainFrac > 0.8 && trainFrac < 0.97, s"train fraction $trainFrac")
  }

  test("kmv sketch is partition-count independent (merge path ≡ single reduce)") {
    import graft.operators.Dedup
    val rows = sample(Gen.chooseNum(0, 3000), 500)
      .map(v => ("g", s"text_$v"))
    def sketch(parts: Int) =
      Dedup.kmvDistinct(rows.toDF("source", "text").repartition(parts),
          "source", "text", k = 32)
        .select("distinct_le_k", "kth", "kmv_estimate")
        .collect().head.toSeq
    assert(sketch(1) === sketch(8) && sketch(8) === sketch(31))
  }

  test("packByBudget is shard-count invariant and equals the sequential scan") {
    import graft.operators.Packing
    val rows = sample(Gen.zip(Gen.chooseNum(0L, 500000L),
      Gen.chooseNum(0, 300)), 300).distinctBy(_._1)
    val df = rows.toDF("doc_id", "w")
    def pack(shards: Int): Map[Long, Long] =
      Packing.packByBudget(df.repartition(9), "doc_id", col("w"),
          budget = 1000L, shards = shards)
        .select("doc_id", "chunk_id").as[(Long, Long)].collect().toMap
    // the global prefix sum must not depend on how it is sharded
    val one = pack(1)
    assert(pack(13) === one && pack(256) === one)
    // and must equal the in-memory sequential scan
    var acc = 0L
    val expect = rows.sortBy(_._1).map { case (id, w) =>
      val c = acc / 1000L; acc += w; id -> c
    }.toMap
    assert(one === expect)
  }

  test("MG sketch never loses a value above n/(k+1), any partitioning") {
    import graft.operators.Frequency.MisraGries
    val mg = new MisraGries(5)
    val streamGen = Gen.listOfN(400,
      Gen.frequency(3 -> Gen.const("hot"), 2 -> Gen.const("warm"),
        5 -> Gen.chooseNum(0, 80).map(i => s"cold$i")))
    sample(streamGen, 20).zipWithIndex.foreach { case (xs, i) =>
      val counts = xs.groupBy(identity).map { case (t, g) => t -> g.size }
      val threshold = xs.size / 6 // n/(k+1)
      // random partitioning + pairwise merges must keep every heavy key
      val rnd = new scala.util.Random(1000 + i)
      val parts = xs.groupBy(_ => rnd.nextInt(7)).values
        .map(_.foldLeft(mg.zero)(mg.reduce))
      val merged = parts.reduce(mg.merge)
      assert(merged.size <= 5)
      counts.filter(_._2 > threshold).keys.foreach { t =>
        assert(merged.contains(t), s"lost heavy '$t' in sample $i")
        // count error bounded by n/(k+1)
        assert(merged(t) >= counts(t) - threshold && merged(t) <= counts(t))
      }
    }
  }

  test("t22 head coverage emits zero rows on an empty corpus") {
    // contract with the DuckDB mirror: no tokens → no report rows
    // (the oracle's CROSS JOIN over an empty vocabulary emits none,
    // so the Spark side must drop its null-total aggregate rows)
    val dir = java.nio.file.Files.createTempDirectory("t22_empty").toString
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(0).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(SparkEntry.queries("t22_head_coverage")(spark, dir).count() === 0L)
  }

  test("rollingFingerprint equals the reference fold for generated ASCII text") {
    val txtGen = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(32, 126).map(_.toChar))).map(_.mkString)
    val texts = sample(txtGen, 100).distinct
    val out = texts.toDF("text")
      .select(col("text"), graft.functions.TextFunctions.rollingFingerprint(col("text")))
      .as[(String, Long)].collect().toMap
    texts.foreach { t =>
      val expected = t.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
      assert(out(t) === expected, s"text='$t'")
    }
  }

  test("chunk dedup matches a sequential first-wins replay on generated corpora") {
    val docs = sample(docGen, 80).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val out = Dedup.chunkDedup(df, n = 3)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // reference: chunks in (doc_id, idx) order, global first-wins set
    val seen = scala.collection.mutable.Set[String]()
    docs.sortBy(_._1).foreach { case (id, text) =>
      val words = text.split(" ", -1).toSeq
      val chunks = words.grouped(3).map(_.mkString(" ")).toSeq
      var kept = 0L; var dropped = 0L
      val survivors = chunks.flatMap { c =>
        if (seen.add(c)) { kept += 1; Some(c) } else { dropped += 1; None }
      }
      assert(out(id) === ((survivors.mkString(" "), kept, dropped)),
        s"doc $id text='$text'")
    }
  }

  test("ewma matches a sequential replay on generated series") {
    val valGen = Gen.chooseNum(-9999, 9999).map(_ / 100.0 * 3)
    val vals = sample(valGen, 120)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ((i % 5).toLong, i.toLong, new java.sql.Timestamp(i.toLong * 1000), v)
    }
    val h = 16
    val out = graft.operators.Series
      .ewma(rows.toDF("k", "id", "ts", "v"), "k", "id", "ts", "v", horizon = h)
      .select("id", "ewma").as[(Long, Double)].collect().toMap
    rows.groupBy(_._1).foreach { case (_, series) =>
      val ordered = series.sortBy(r => (r._3.getTime, r._2))
      val cents = ordered.map(r =>
        BigDecimal(r._4).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .*(100).toLongExact)
      cents.indices.foreach { i =>
        val window = cents.slice(math.max(0, i - h + 1), i + 1)
        var num = 0L; var w = 1L
        window.foreach { c => num += c * w; w <<= 1 }
        val expected = num.toDouble / (((w - 1) * 100L).toDouble)
        assert(out(ordered(i)._2) === expected, s"row ${ordered(i)}")
      }
    }
  }

  test("pagerank matches an in-memory integer replay on generated graphs") {
    val edgeGen = for {
      a <- Gen.chooseNum(0L, 19L); b <- Gen.chooseNum(0L, 19L) if a != b
    } yield (a, b)
    val edges = sample(edgeGen, 120).distinct
    val out = graft.operators.Graph
      .pagerank(edges.toDF("src", "dst"), iters = 3)
      .select("node", "rank_units").as[(Long, Long)].collect().toMap
    // replay with plain Long arithmetic
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val total = graft.operators.Graph.TotalMass
    val base = ((total / 100) * 15) / n
    var r = nodes.map(_ -> total / n).toMap
    for (_ <- 1 to 3) {
      val contrib = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (a, b) =>
        contrib(b) += r(a) / outdeg(a)
      }
      r = nodes.map(v => v -> (base + (85L * contrib(v)) / 100)).toMap
    }
    nodes.foreach { v => assert(out(v) === r(v), s"node $v") }
  }

  test("zvalue is a bijection: deinterleaving recovers every coordinate") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(31)
    val pts = Seq.fill(500)((rnd.nextInt(1 << 16).toLong,
      rnd.nextInt(1 << 16).toLong))
    val out = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.operators.Layout.zvalue(16, col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    def deinterleave(z: Long, lane: Int): Long =
      (0 until 16).map(j => ((z >> (2 * j + lane)) & 1L) << j).sum
    out.foreach { case (x, y, z) =>
      assert(deinterleave(z, 0) === x && deinterleave(z, 1) === y,
        s"($x, $y) -> $z")
    }
    // locality sanity: adjacent x at equal y differ only in low bits
    val z0 = out.head._3
    assert(out.length === 500 && z0 >= 0L)
  }

  test("groupQuantiles equals the sorted-index reference on generated multisets") {
    // heavy ties + spread + negatives: values from a small domain
    val rowGen = for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.oneOf(Gen.chooseNum(-5L, 5L), Gen.chooseNum(-1000L, 1000L))
    } yield (g, v)
    val rows = sample(rowGen, 400)
    val qs = Seq(1, 137, 250, 499, 500, 501, 750, 999, 1000)
    def ref(vs: Seq[Long], q: Int): Long = {
      val sorted = vs.sorted
      sorted(((q.toLong * sorted.size + 999) / 1000 - 1).toInt.max(0))
    }
    val got = graft.operators.Quantiles
      .groupQuantiles(rows.toDF("g", "v"), "g", col("v"), qs)
      .collect().map(r => r.getString(0) -> r).toMap
    for ((g, grp) <- rows.groupBy(_._1); vs = grp.map(_._2)) {
      val row = got(g)
      assert(row.getLong(row.fieldIndex("n")) === vs.size.toLong)
      for (q <- qs)
        assert(row.getLong(row.fieldIndex(
          graft.operators.Quantiles.qName(q))) === ref(vs, q), s"$g q=$q")
    }
  }

  test("hammingBandPairs equals brute-force popcount for generated signatures") {
    // random 48-bit signatures plus planted near-pairs at each radius
    val rnd = new scala.util.Random(7)
    val base = (0 until 120).map(i => i.toLong -> (rnd.nextLong() & ((1L << 48) - 1)))
    val planted = (0 until 16).map { i =>
      val (_, sig) = base(i)
      // flip i%4 distinct bits -> hamming i%4 from base(i)
      val flipped = (0 until i % 4).foldLeft(sig)((s, j) => s ^ (1L << (j * 11)))
      (1000L + i) -> flipped
    }
    val all = base ++ planted
    for (maxH <- Seq(0, 3, 7)) {
      val got = Dedup.hammingBandPairs(all.toDF("doc_id", "sig"),
          "doc_id", "sig", bits = 48, maxHamming = maxH)
        .as[(Long, Long, Long)].collect().toSet
      val want = (for {
        (a, sa) <- all; (b, sb) <- all if a < b
        d = java.lang.Long.bitCount(sa ^ sb) if d <= maxH
      } yield (a, b, d.toLong)).toSet
      assert(got === want, s"maxHamming=$maxH")
    }
  }

  test("mmrSelect equals an in-memory greedy replica on generated vectors") {
    // random unit-ish float vectors; the unrolled-join implementation
    // must reproduce the sequential greedy argmax exactly, including
    // (score, id) tie order, for several lambdas
    val rnd = new scala.util.Random(19)
    val vecs = (0L until 40L).map(i =>
      (i, Array.fill(6)((rnd.nextInt(21) - 10) / 10.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val qIds = Seq(0L, 7L, 13L)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.indices.foldLeft(0.0)((s, i) => s + x(i).toDouble * y(i).toDouble)
      val d = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
      if (d == 0.0) Double.NaN else dot(a, b) / d
    }
    for (lambda <- Seq(0.3, 0.7, 1.0)) {
      val got = graft.operators.Similarity.mmrSelect(
          df, df.filter(col("vec_id").isin(qIds: _*)),
          n = 6, k = 3, lambda = lambda)
        .as[(Long, Int, Long, Double)].collect().toSet
      val want = qIds.flatMap { q =>
        val qv = vecs(q.toInt)._2
        val cand = vecs.filter(_._1 != q)
          .map { case (id, v) => (id, v, cos(qv, v)) }
          .filter(!_._3.isNaN)
          .sortBy { case (id, _, rel) => (-rel, id) }.take(6)
        var sel = List.empty[(Long, Array[Float], Double)] // id, vec, score
        for (step <- 1 to 3) {
          val rem = cand.filterNot(c => sel.exists(_._1 == c._1))
          val scored = rem.map { case (id, v, rel) =>
            val s =
              if (step == 1) rel
              else lambda * rel -
                (1.0 - lambda) * sel.map(x => cos(v, x._2)).max
            (id, v, s)
          }
          val pick = scored.minBy { case (id, _, s) => (-s, id) }
          sel = sel :+ pick
        }
        sel.zipWithIndex.map { case ((id, _, s), i) => (q, i + 1, id, s) }
      }.toSet
      assert(got === want, s"lambda=$lambda")
    }
  }

  test("BPE training: in-core and distributed paths identical on generated corpora") {
    // the size-adaptive dispatch (Bpe.train) must be invisible: for
    // arbitrary corpora, the zero-jobs in-core loop and the
    // distributed incremental loop learn the SAME merges with the
    // SAME counts (same argmax total order, same left-to-right
    // non-overlapping apply). Path equality over generated inputs is
    // strictly stronger than the fixture pin in BpeTrainSpec.
    val corpora = (0 until 6).map { c =>
      sample(docGen, 12, seed = 100L + c).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
    }
    corpora.zipWithIndex.foreach { case (docs, c) =>
      val df = docs.toDF("doc_id", "text")
      def run(thr: Long) = graft.functions.Bpe
        .train(df, nMerges = 6, localVocabThreshold = thr)
        .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
      assert(run(2000000L) === run(0L), s"corpus $c: $docs")
    }
  }

  test("extractAnchors round-trips generated anchor lists") {
    // html built FROM generated (href, anchor) pairs must parse back
    // to exactly those pairs (after the documented tag-strip +
    // whitespace-collapse normalization)
    val hrefGen = Gen.chooseNum(0, 9999)
      .map(n => s"https://h$n.example.com/p/$n")
    val anchorGen = Gen.chooseNum(1, 4)
      .flatMap(n => Gen.listOfN(n,
        Gen.oneOf("read", "more", "b<i>x</i>", "a  b", "q&a")))
      .map(_.mkString(" "))
    val pairGen = for { h <- hrefGen; a <- anchorGen } yield (h, a)
    val listGen = Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, pairGen))
    val cases = sample(listGen, 40, seed = 7L)
    val html = cases.zipWithIndex.map { case (ps, i) =>
      (i.toLong, ps.map { case (h, a) =>
        s"""<p>noise</p><a href="$h" class="x">$a</a>"""
      }.mkString(" mid "))
    }
    val got = html.toDF("id", "h")
      .select(col("id"),
        graft.operators.Html.extractAnchors(col("h")).as("as"))
      .as[(Long, Seq[(String, String)])].collect().toMap
    def normalize(a: String): String =
      a.replaceAll("<[^>]*>", " ").replaceAll("[ \t\n\r]+", " ").trim
    cases.zipWithIndex.foreach { case (ps, i) =>
      assert(got(i.toLong) === ps.map { case (h, a) => (h, normalize(a)) },
        s"case $i: $ps")
    }
  }

  test("hash embeddings equal the md5 bucket/sign reference for generated docs") {
    val docs = sample(docGen, 80).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    for (dims <- Seq(8, 64)) {
      val got = graft.operators.Similarity.hashEmbed(
          docs.toDF("doc_id", "text"), dims = dims)
        .as[(Long, Seq[Double])].collect().toMap
      docs.foreach { case (id, text) =>
        val acc = Array.fill(dims)(0.0)
        text.toLowerCase.split(" ").filter(_.nonEmpty).foreach { w =>
          val h = java.lang.Long.parseLong(md5hex(w).take(12), 16)
          acc((h % dims).toInt) += (((h >> 47) & 1L) * 2 - 1).toDouble
        }
        assert(got(id) === acc.toSeq, s"doc $id dims=$dims text='$text'")
      }
    }
  }
}

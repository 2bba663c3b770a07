package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ArtifactsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dirOf(key: String) = new java.io.File(Artifacts.root,
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString)

  test("table builds once, then serves the staged parquet") {
    val key = s"spec|${java.util.UUID.randomUUID()}"
    var builds = 0
    def get() = Artifacts.table(spark, key) {
      builds += 1; Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    }
    assert(get().as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b")))
    assert(get().as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b")))
    assert(builds === 1) // second call served, never rebuilt
  }

  test("distinct keys are distinct artifacts (no cross-serving)") {
    val k1 = s"spec|${java.util.UUID.randomUUID()}"
    val k2 = s"spec|${java.util.UUID.randomUUID()}"
    Artifacts.table(spark, k1)(Seq(1L).toDF("x"))
    val out = Artifacts.table(spark, k2)(Seq(2L).toDF("x"))
    assert(out.as[Long].collect().toSeq === Seq(2L))
  }

  test("fingerprint changes when an input file changes") {
    val dir = java.nio.file.Files.createTempDirectory("afp").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "a.parquet"), "x".getBytes)
    val fp1 = Artifacts.fingerprint(dir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "a.parquet"), "xy".getBytes)
    val fp2 = Artifacts.fingerprint(dir)
    assert(fp1 !== fp2) // size changed → key changes → rebuild
    assert(Artifacts.fingerprint(dir) === fp2) // stable when unchanged
  }

  test("publishing a new generation prunes the stale one, sparing strangers") {
    val logical = s"gen|cfg|${java.util.UUID.randomUUID()}"
    val other = s"other|${java.util.UUID.randomUUID()}"
    Artifacts.table(spark, logical, "fp1")(Seq(1L).toDF("x"))
    Artifacts.table(spark, other)(Seq(7L).toDF("x"))
    assert(dirOf(s"$logical|fp1").exists())
    assert(dirOf(s"$other|").exists())
    // input regenerated -> new generation: old generation is GC'd
    val out = Artifacts.table(spark, logical, "fp2")(Seq(2L).toDF("x"))
    assert(out.as[Long].collect().toSeq === Seq(2L))
    assert(!dirOf(s"$logical|fp1").exists(), "stale generation must be pruned")
    assert(dirOf(s"$logical|fp2").exists())
    // unrelated artifact untouched
    assert(dirOf(s"$other|").exists())
  }

  test("publishing one leg never prunes a sibling leg sharing a key prefix") {
    // the curate-stager shape that motivated explicit generation
    // keying: per-leg keys share a long prefix and end in the leg
    // NAME. Under prefix-inference pruning, publishing legB deleted
    // legA's directory and the downstream join died on a missing
    // parquet; under explicit (logicalId, generation) the legs are
    // distinct logical artifacts and must both survive.
    val stem = s"curate|t|cfg${java.util.UUID.randomUUID()}"
    val a = Artifacts.table(spark, s"$stem|legA", "fp")(Seq(1L).toDF("x"))
    Artifacts.table(spark, s"$stem|legB", "fp")(Seq(2L).toDF("x"))
    assert(dirOf(s"$stem|legA|fp").exists(),
      "sibling leg pruned by legB's publish")
    // and the already-obtained frame still reads (the empirical
    // failure was FileNotFoundException on collect)
    assert(a.as[Long].collect().toSeq === Seq(1L))
    // generation GC still works per leg
    Artifacts.table(spark, s"$stem|legA", "fp2")(Seq(3L).toDF("x"))
    assert(!dirOf(s"$stem|legA|fp").exists())
    assert(dirOf(s"$stem|legB|fp").exists(), "other leg's generation GC'd")
  }

  test("a pre-marker leftover dir is rebuilt, not served") {
    val key = s"spec|${java.util.UUID.randomUUID()}"
    // simulate a foreign/incomplete dir at the artifact's location:
    // build once to find the path, then strip the _done marker and
    // corrupt the content
    Artifacts.table(spark, key)(Seq(1L).toDF("x"))
    require(new java.io.File(dirOf(s"$key|"), "_done").delete())
    val out = Artifacts.table(spark, key)(Seq(9L).toDF("x"))
    assert(out.as[Long].collect().toSeq === Seq(9L)) // rebuilt
  }

  test("two concurrent builders of one key converge on a single copy") {
    // the `_done`-rides-rename claim, exercised: both callers must get
    // correct data whichever build wins the rename, and exactly one
    // published dir remains
    val logical = s"race|${java.util.UUID.randomUUID()}"
    val results = new java.util.concurrent.ConcurrentHashMap[Int, Seq[Long]]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val gate = new java.util.concurrent.CountDownLatch(1)
    val threads = (0 until 2).map { i =>
      new Thread(() => {
        try {
          gate.await()
          val df = Artifacts.table(spark, logical, "fp") {
            // both builders produce the same logical content (the
            // contract: key identifies content)
            Seq(1L, 2L, 3L).toDF("x")
          }
          results.put(i, df.as[Long].collect().toSeq.sorted)
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
    assert(errs.isEmpty, s"racing builder threw: ${errs.peek()}")
    assert(results.get(0) === Seq(1L, 2L, 3L))
    assert(results.get(1) === Seq(1L, 2L, 3L))
    assert(dirOf(s"$logical|fp").exists())
    // no orphaned tmp dirs for this key remain
    val md5 = dirOf(s"$logical|fp").getName
    val leftovers = Option(new java.io.File(Artifacts.root).listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith(s".tmp_$md5"))
    assert(leftovers.isEmpty, "losing builder must clean its tmp dir")
  }

  test("evict drops least-recently-served artifacts down to the cap") {
    // isolated root: eviction math must not see (or delete) the
    // suite-shared staged tables
    val isoRoot = java.nio.file.Files.createTempDirectory("aevict").toString
    System.setProperty("graft.artifacts.root", isoRoot)
    try {
      Artifacts.table(spark, "ev|a")(Seq.fill(100)(1L).toDF("x"))
      Thread.sleep(1100) // FS mtime granularity can be a full second
      Artifacts.table(spark, "ev|b")(Seq.fill(100)(2L).toDF("x"))
      Thread.sleep(1100)
      // re-serve a: it becomes the most recently used
      Artifacts.table(spark, "ev|a")(sys.error("must serve, not build"))
      val total = Option(new java.io.File(isoRoot).listFiles())
        .getOrElse(Array.empty)
        .filter(_.isDirectory)
        .map(org.apache.commons.io.FileUtils.sizeOfDirectory).sum
      // cap just below the total: exactly the LRU artifact (b) must go
      assert(Artifacts.evict(total - 1) === 1)
      assert(dirOf("ev|a|").exists(),
        "most-recently-served artifact evicted before older ones")
      assert(!dirOf("ev|b|").exists(), "LRU artifact must be evicted")
      // cap 0 clears the rest
      assert(Artifacts.evict(0L) === 1)
      assert(!dirOf("ev|a|").exists())
    } finally System.clearProperty("graft.artifacts.root")
  }
}

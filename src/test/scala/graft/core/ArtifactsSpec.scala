package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ArtifactsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

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
    val stem = s"gen|cfg|${java.util.UUID.randomUUID()}"
    val other = s"other|${java.util.UUID.randomUUID()}"
    def dirOf(key: String) = new java.io.File(Artifacts.root,
      java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    Artifacts.table(spark, s"$stem|fp1")(Seq(1L).toDF("x"))
    Artifacts.table(spark, other)(Seq(7L).toDF("x"))
    assert(dirOf(s"$stem|fp1").exists())
    // input regenerated -> new fingerprint: old generation is GC'd
    val out = Artifacts.table(spark, s"$stem|fp2")(Seq(2L).toDF("x"))
    assert(out.as[Long].collect().toSeq === Seq(2L))
    assert(!dirOf(s"$stem|fp1").exists(), "stale generation must be pruned")
    assert(dirOf(s"$stem|fp2").exists())
    // unrelated artifact untouched
    assert(dirOf(other).exists())
  }

  test("a pre-marker leftover dir is rebuilt, not served") {
    val key = s"spec|${java.util.UUID.randomUUID()}"
    // simulate a foreign/incomplete dir at the artifact's location:
    // build once to find the path, then strip the _done marker and
    // corrupt the content
    Artifacts.table(spark, key)(Seq(1L).toDF("x"))
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val dir = new java.io.File(Artifacts.root, md5)
    require(new java.io.File(dir, "_done").delete())
    val out = Artifacts.table(spark, key)(Seq(9L).toDF("x"))
    assert(out.as[Long].collect().toSeq === Seq(9L)) // rebuilt
  }
}

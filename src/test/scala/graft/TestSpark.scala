package graft

import org.apache.spark.sql.SparkSession

import graft.core.Graft

/** One shared session per test JVM (suites run sequentially in sbt's
  * forked JVM; stopping it in any suite would kill the rest).
  */
object TestSpark {
  lazy val spark: SparkSession = Graft.session("graft-test", "4")
}

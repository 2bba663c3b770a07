package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    var nestedViolations = List.empty[String]
    // local-iteration filter, same contract as Bench (driver never sets
    // it): comma-separated query names; unset = all
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // Harness contract: the driver canonicalizes rows via pandas,
        // which cannot sort/hash nested cells (Array/Map/Struct) —
        // such a column passes the repo's tolerant tools/check.py but
        // red-flags in the real driver. Fail fast and loud here.
        val nested = df.schema.fields.collect {
          case f if !isAtomic(f.dataType) => s"${f.name}: ${f.dataType.sql}"
        }
        if (nested.nonEmpty) {
          nestedViolations ::= s"$name -> ${nested.mkString(", ")}"
          System.err.println(
            s"[verify] $name emits nested-typed columns the driver " +
            s"cannot canonicalize: ${nested.mkString(", ")}")
        } else {
          df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // release operator-internal persists between queries (110 queries
      // share this JVM; intra-query cache reuse is already done by now)
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (nestedViolations.nonEmpty) {
      System.err.println(
        s"[verify] ${nestedViolations.size} quer(ies) violate the " +
        "atomic-columns contract:\n  " + nestedViolations.mkString("\n  "))
      sys.exit(2)
    }
  }

  /** True iff the driver's pandas-based checker can sort/hash the type:
    * atomic scalars only — Array/Map/Struct cells raise
    * `unhashable type: numpy.ndarray` inside its canonicalizing sort.
    */
  private def isAtomic(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case _: org.apache.spark.sql.types.ArrayType => false
      case _: org.apache.spark.sql.types.MapType => false
      case _: org.apache.spark.sql.types.StructType => false
      case _ => true
    }
}

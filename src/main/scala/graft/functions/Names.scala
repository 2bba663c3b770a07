package graft.functions

import org.apache.spark.sql.DataFrame

/** Column-name conventions: the reference maps snake_case DB columns
  * to camelCase bean fields with Guava CaseFormat (reference
  * `gmall-realtime/src/main/java/com/atguigu/utils/JdbcUtil.java:46-48`).
  * Pure string functions — applied to the schema, never per row.
  */
object Names {

  def snakeToCamel(s: String): String = {
    // leading underscores are metadata convention (_corrupt, _rn), not
    // word separators — preserve them so snaked(camelized(df)) round-
    // trips; an all-underscore name passes through unchanged (split
    // would return an empty array and .head would throw)
    val lead = s.takeWhile(_ == '_')
    val rest = s.drop(lead.length)
    if (rest.isEmpty) s
    else {
      val parts = rest.split("_")
      lead + (parts.head +: parts.tail.map(p =>
        if (p.isEmpty) p else s"${p.head.toUpper}${p.tail}")).mkString
    }
  }

  def camelToSnake(s: String): String =
    s.replaceAll("([a-z0-9])([A-Z])", "$1_$2").toLowerCase

  /** Rename every column of a frame snake_case → camelCase. */
  def camelized(df: DataFrame): DataFrame =
    df.toDF(df.columns.toIndexedSeq.map(snakeToCamel): _*)

  /** Rename every column of a frame camelCase → snake_case. */
  def snaked(df: DataFrame): DataFrame =
    df.toDF(df.columns.toIndexedSeq.map(camelToSnake): _*)
}

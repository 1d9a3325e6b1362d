package graft.diff

import org.apache.spark.sql.{Column, DataFrame}

/** Outcome of a dataset comparison.
  *
  * Field-for-field the same information as the reference's result model
  * (`/root/reference/datasetComparison/.../ComparisonResult.scala:61-70`),
  * with a hand-rolled pretty-JSON writer (the reference uses spray-json,
  * unavailable offline).
  */
case class ComparisonResult(
    refRowCount: Long,
    newRowCount: Long,
    refDuplicateCount: Long,
    newDuplicateCount: Long,
    passedCount: Long,
    usedSchemaSelector: List[Column],
    resultDF: Option[DataFrame],
    diffCount: Long,
    passedOptions: String = "",
    additionalInfo: Map[String, String] = Map.empty) {

  def datasetsMatch: Boolean = diffCount == 0

  /** Pretty JSON for the `_METRICS` sink (reference
    * `DatasetComparisonJob.scala:97-109`). */
  def toJson: String = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val selector = usedSchemaSelector.map(c => q(c.toString)).mkString("[", ", ", "]")
    val extra = additionalInfo.toSeq.sortBy(_._1)
      .map { case (k, v) => s"    ${q(k)}: ${q(v)}" }.mkString("{\n", ",\n", "\n  }")
    s"""{
       |  "passed": ${datasetsMatch},
       |  "refRowCount": $refRowCount,
       |  "newRowCount": $newRowCount,
       |  "refDuplicateCount": $refDuplicateCount,
       |  "newDuplicateCount": $newDuplicateCount,
       |  "passedCount": $passedCount,
       |  "diffCount": $diffCount,
       |  "passedOptions": ${q(passedOptions)},
       |  "usedSchemaSelector": $selector,
       |  "additionalInfo": $extra
       |}""".stripMargin
  }
}

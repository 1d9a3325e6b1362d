package graft.infodiff

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}

/** Atum `_INFO` control-measure model + recursive differ.
  *
  * Model shape per the reference fixtures
  * (`/root/reference/infoFileComparison/src/test/resources/info_file_original.json`)
  * and differ semantics per `AtumModelUtils.scala:35-205`:
  *  - metadata: field-by-field simple compare + additionalInfo map diff
  *    where version-carrying keys are logged (not diffed), ignored keys
  *    skipped, and keys missing on one side diff against "Null";
  *  - checkpoints: compared pairwise by index (with an explicit length
  *    check — the reference zip-indexes and throws IndexOutOfBounds on
  *    unequal counts, which we fix by reporting a length difference);
  *  - software/version on checkpoints are logged, not diffed.
  */
case class ModelDifference(path: String, was: String, is: String)

/** Defaults mirror the reference's
  * `infoFileComparison/src/main/resources/reference.conf:18-29`. */
case class InfoDiffConfig(
    versionMetaKeys: Seq[String] = Seq(
      "std_enceladus_version", "conform_enceladus_version"),
    ignoredMetaKeys: Seq[String] = Seq(
      "std_application_id", "conform_application_id",
      "conform_input_dir_size", "std_input_dir_size",
      "std_output_dir_size", "conform_output_dir_size"))

object InfoFileDiff {

  private val mapper = new ObjectMapper()
    .configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)

  def parse(json: String): JsonNode = mapper.readTree(json)

  /** Full diff of two `_INFO` JSON documents, sorted by path. */
  def compare(wasJson: String, isJson: String,
      config: InfoDiffConfig = InfoDiffConfig()): List[ModelDifference] = {
    val was = parse(wasJson)
    val is = parse(isJson)
    (compareMetadata(was.path("metadata"), is.path("metadata"), config) ++
      simpleCompare("runUniqueId", text(was.path("runUniqueId")), text(is.path("runUniqueId"))) ++
      compareCheckpoints(was.path("checkpoints"), is.path("checkpoints")))
      .sortBy(_.path)
  }

  private def text(n: JsonNode): String =
    if (n == null || n.isMissingNode || n.isNull) "Null" else n.asText()

  private def simpleCompare(path: String, was: String, is: String): List[ModelDifference] =
    if (was != is) List(ModelDifference(path, was, is)) else Nil

  private def compareMetadata(was: JsonNode, is: JsonNode,
      config: InfoDiffConfig): List[ModelDifference] = {
    val fields = Seq("sourceApplication", "country", "historyType",
      "dataFilename", "sourceType", "version", "informationDate")
    val fieldDiffs = fields.toList.flatMap(f =>
      simpleCompare(s"metadata.$f", text(was.path(f)), text(is.path(f))))
    fieldDiffs ++ compareAdditionalInfo(
      was.path("additionalInfo"), is.path("additionalInfo"), config)
  }

  /** additionalInfo map diff (`AtumModelUtils.scala:89-108`). */
  private def compareAdditionalInfo(was: JsonNode, is: JsonNode,
      config: InfoDiffConfig): List[ModelDifference] = {
    import scala.jdk.CollectionConverters._
    def keys(n: JsonNode): Set[String] =
      if (n == null || n.isMissingNode) Set.empty
      else n.properties().asScala.map(_.getKey).toSet
    (keys(was) ++ keys(is)).toList.sorted.flatMap { k =>
      if (config.ignoredMetaKeys.contains(k) || config.versionMetaKeys.contains(k)) Nil
      else simpleCompare(s"metadata.additionalInfo.$k",
        text(was.path(k)), text(is.path(k)))
    }
  }

  private def compareCheckpoints(was: JsonNode, is: JsonNode): List[ModelDifference] = {
    val wasN = if (was.isArray) was.size() else 0
    val isN = if (is.isArray) is.size() else 0
    if (wasN != isN)
      return List(ModelDifference("checkpoints.length", wasN.toString, isN.toString))
    (0 until wasN).toList.flatMap { i =>
      val (w, n) = (was.get(i), is.get(i))
      val base = s"checkpoints[$i]"
      Seq("name", "workflowName", "order").toList.flatMap(f =>
        simpleCompare(s"$base.$f", text(w.path(f)), text(n.path(f)))) ++
        compareControls(w.path("controls"), n.path("controls"), base)
    }
  }

  private def compareControls(was: JsonNode, is: JsonNode, base: String): List[ModelDifference] = {
    val wasN = if (was.isArray) was.size() else 0
    val isN = if (is.isArray) is.size() else 0
    if (wasN != isN)
      return List(ModelDifference(s"$base.controls.length", wasN.toString, isN.toString))
    (0 until wasN).toList.flatMap { i =>
      val (w, n) = (was.get(i), is.get(i))
      Seq("controlName", "controlType", "controlCol", "controlValue").toList.flatMap(f =>
        simpleCompare(s"$base.controls[$i].$f", text(w.path(f)), text(n.path(f))))
    }
  }

  /** Render a diff list as pretty JSON (the job's report sink). */
  def toJson(diffs: List[ModelDifference]): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    diffs.map(d =>
      s"""  {"path": ${q(d.path)}, "was": ${q(d.was)}, "is": ${q(d.is)}}""")
      .mkString("[\n", ",\n", "\n]")
  }
}

/** Exit-by-exception when the `_INFO` files differ. */
class InfoFilesDifferException(val diffCount: Int)
  extends Exception(s"Expected and actual info files differ in $diffCount place(s)")

/** `java -jar`-style entry point (reference `InfoFileComparisonJob.scala`):
  * plain JVM, no Spark session — file IO through Hadoop FS for
  * local/HDFS/S3 transparency.
  *
  * The reference makes versionMetaKeys/ignoredMetaKeys configurable
  * (`infoFileComparison/src/main/resources/reference.conf:18,22` via
  * `InfoFileComparisonConfig.scala`); here the same knobs ride the CLI:
  * `--version-meta-keys k1,k2` / `--ignored-meta-keys k1,k2` override
  * the built-in defaults (comma-separated; omit to keep defaults). */
object InfoFileComparisonJob {

  /** Parse the two optional key-list overrides into an InfoDiffConfig. */
  private[infodiff] def configFrom(kv: Map[String, String]): InfoDiffConfig = {
    def list(flag: String, default: Seq[String]): Seq[String] =
      kv.get(flag).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(default)
    val d = InfoDiffConfig()
    InfoDiffConfig(
      versionMetaKeys = list("version-meta-keys", d.versionMetaKeys),
      ignoredMetaKeys = list("ignored-meta-keys", d.ignoredMetaKeys))
  }

  def main(args: Array[String]): Unit = {
    val kv = graft.cli.CliParametersParser.argsToMap(args)
    val conf = new org.apache.hadoop.conf.Configuration()
    val was = graft.io.PathResolver.readString(kv("ref-path"), conf)
    val is = graft.io.PathResolver.readString(kv("new-path"), conf)
    val diffs = InfoFileDiff.compare(was, is, configFrom(kv))
    kv.get("out-path").foreach(out =>
      graft.io.PathResolver.writeString(out, InfoFileDiff.toJson(diffs), conf))
    if (diffs.nonEmpty) throw new InfoFilesDifferException(diffs.length)
  }
}

package graft.infodiff

import org.scalatest.funsuite.AnyFunSuite

class InfoFileDiffSpec extends AnyFunSuite {

  private val original =
    """{
      |  "metadata": {
      |    "sourceApplication": "App", "country": "CZ", "historyType": "Snapshot",
      |    "dataFilename": "f.json", "sourceType": "Golden", "version": 1,
      |    "informationDate": "01-01-2019",
      |    "additionalInfo": {
      |      "raw_format": "json",
      |      "std_application_id": "local-123",
      |      "std_enceladus_version": "1.2.0",
      |      "std_record_count": "21"
      |    }
      |  },
      |  "runUniqueId": "aaa",
      |  "checkpoints": [{
      |    "name": "Source", "workflowName": "Source", "order": 1,
      |    "controls": [{
      |      "controlName": "recordCount", "controlType": "count",
      |      "controlCol": "id", "controlValue": "21"}]
      |  }]
      |}""".stripMargin

  test("identical documents produce no differences") {
    assert(InfoFileDiff.compare(original, original).isEmpty)
  }

  test("metadata field and control value changes are attributed by path") {
    val changed = original
      .replace("\"country\": \"CZ\"", "\"country\": \"ZA\"")
      .replace("\"controlValue\": \"21\"", "\"controlValue\": \"20\"")
    val diffs = InfoFileDiff.compare(original, changed)
    assert(diffs.map(_.path) ==
      List("checkpoints[0].controls[0].controlValue", "metadata.country"))
    assert(diffs.find(_.path == "metadata.country").get.was == "CZ")
    assert(diffs.find(_.path == "metadata.country").get.is == "ZA")
  }

  test("version keys and ignored keys in additionalInfo are not diffed") {
    val changed = original
      .replace("\"std_application_id\": \"local-123\"", "\"std_application_id\": \"local-999\"")
      .replace("\"std_enceladus_version\": \"1.2.0\"", "\"std_enceladus_version\": \"9.9.9\"")
    assert(InfoFileDiff.compare(original, changed).isEmpty)
  }

  test("missing additionalInfo key diffs against Null") {
    val changed = original.replace(
      "\"std_record_count\": \"21\"\n", "\"std_record_count_x\": \"21\"\n")
    val diffs = InfoFileDiff.compare(original, changed)
    assert(diffs.exists(d => d.path == "metadata.additionalInfo.std_record_count"
      && d.was == "21" && d.is == "Null"))
    assert(diffs.exists(d => d.path == "metadata.additionalInfo.std_record_count_x"
      && d.was == "Null" && d.is == "21"))
  }

  test("unequal checkpoint counts reported, not thrown (reference bug fixed)") {
    val changed = original.replace("\"checkpoints\": [{",
      """"checkpoints": [{
        |    "name": "Extra", "workflowName": "Extra", "order": 0,
        |    "controls": []
        |  }, {""".stripMargin)
    val diffs = InfoFileDiff.compare(original, changed)
    assert(diffs == List(ModelDifference("checkpoints.length", "1", "2")))
  }

  test("diff report renders as JSON") {
    val changed = original.replace("\"runUniqueId\": \"aaa\"", "\"runUniqueId\": \"bbb\"")
    val diffs = InfoFileDiff.compare(original, changed)
    val json = InfoFileDiff.toJson(diffs)
    assert(json.contains("\"path\": \"runUniqueId\""))
    assert(json.contains("\"was\": \"aaa\""))
  }

  test("configFrom parses key-list overrides and keeps defaults otherwise") {
    val defaults = InfoFileComparisonJob.configFrom(Map.empty)
    assert(defaults == InfoDiffConfig())
    val custom = InfoFileComparisonJob.configFrom(Map(
      "version-meta-keys" -> "my_version, other_version",
      "ignored-meta-keys" -> "scratch_key"))
    assert(custom.versionMetaKeys == Seq("my_version", "other_version"))
    assert(custom.ignoredMetaKeys == Seq("scratch_key"))
  }

  test("CLI path honors --ignored-meta-keys (reference reference.conf:18,22 parity)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-infodiff-cli")
    val changed = original.replace(
      "\"std_record_count\": \"21\"", "\"std_record_count\": \"99\"")
    val wasP = dir.resolve("was.json"); val isP = dir.resolve("is.json")
    java.nio.file.Files.write(wasP, original.getBytes("UTF-8"))
    java.nio.file.Files.write(isP, changed.getBytes("UTF-8"))
    def run(extra: Array[String]): Option[InfoFilesDifferException] =
      try {
        InfoFileComparisonJob.main(Array(
          "--ref-path", wasP.toString, "--new-path", isP.toString) ++ extra)
        None
      } catch { case e: InfoFilesDifferException => Some(e) }
    try {
      // default config: the changed std_record_count is a real diff
      assert(run(Array.empty).exists(_.diffCount == 1))
      // CLI override marks the key ignored: comparison passes
      assert(run(Array("--ignored-meta-keys", "std_record_count")).isEmpty)
      // version-meta-keys suppresses the diff the same way
      assert(run(Array("--version-meta-keys", "std_record_count")).isEmpty)
    } finally {
      java.nio.file.Files.deleteIfExists(wasP)
      java.nio.file.Files.deleteIfExists(isP)
      java.nio.file.Files.deleteIfExists(dir)
    }
  }
}

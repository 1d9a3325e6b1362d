package graft.runner

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Full DAG through the three shipped plugins: bash → dataset
  * comparison (diff persisted via writeArgs) → `_INFO` comparison
  * (diff JSON persisted via writeArgs). Mirrors the reference's
  * end-to-end runner flow (E2ERunnerJob.scala:79-125). */
class RunnerE2ESpec extends AnyFunSuite with SparkTestBase {

  private val infoDoc =
    """{
      |  "metadata": {
      |    "sourceApplication": "App", "country": "CZ", "historyType": "Snapshot",
      |    "dataFilename": "f.json", "sourceType": "Golden", "version": 1,
      |    "informationDate": "01-01-2019",
      |    "additionalInfo": {"raw_format": "json", "std_record_count": "21"}
      |  },
      |  "runUniqueId": "aaa",
      |  "checkpoints": [{
      |    "name": "Source", "workflowName": "Source", "order": 1,
      |    "controls": [{
      |      "controlName": "recordCount", "controlType": "count",
      |      "controlCol": "id", "controlValue": "21"}]
      |  }]
      |}""".stripMargin

  test("DAG: bash → dataset diff persisted via writeArgs → info-file diff persisted") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-e2e").toFile.getAbsolutePath
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").write.parquet(s"$dir/ref")
    Seq((1L, "a"), (2L, "X"), (3L, "c")).toDF("id", "v").write.parquet(s"$dir/new")
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$dir/info_ref.json"), infoDoc)
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$dir/info_new.json"),
      infoDoc.replace("\"controlValue\": \"21\"", "\"controlValue\": \"20\""))

    val defs = TestDefinitions.fromJson(
      s"""{"vars": {"base": "$dir"},
         | "runs": [
         |  {"name": "prep", "order": 1, "pluginName": "BashPlugin",
         |   "args": ["echo", "ready"]},
         |  {"name": "cmp", "order": 2, "pluginName": "DatasetComparison",
         |   "dependsOn": "prep",
         |   "args": ["--format", "parquet", "--ref-path", "#{base}#/ref",
         |            "--new-path", "#{base}#/new", "--keys", "id",
         |            "--out-path", "#{base}#/out"],
         |   "writeArgs": ["--path", "#{base}#/persisted"]},
         |  {"name": "info", "order": 3, "pluginName": "InfoFileComparison",
         |   "dependsOn": "prep",
         |   "args": ["--ref-path", "#{base}#/info_ref.json",
         |            "--new-path", "#{base}#/info_new.json"],
         |   "writeArgs": ["--path", "#{base}#/info_diff.json"]}
         |]}""".stripMargin)

    val plugins = PluginRegistry.discover()
    assert(plugins.keySet ==
      Set("BashPlugin", "DatasetComparison", "InfoFileComparison"))
    val res = TestRunner.runTests(defs, plugins)

    assert(res.head.passed) // bash
    // datasets differ in one row → test fails, but writeArgs persisted the
    // diff DF + _METRICS at the requested path
    assert(!res(1).passed && res(1).returnedValue == "diffCount=1")
    assert(spark.read.parquet(s"$dir/persisted").count() == 1)
    assert(new java.io.File(s"$dir/persisted/_METRICS").exists)
    // _INFO files differ → test fails, diff JSON persisted
    assert(!res(2).passed && res(2).returnedValue == "differences=1")
    val diffJson = java.nio.file.Files.readString(
      java.nio.file.Path.of(s"$dir/info_diff.json"))
    assert(diffJson.contains("controlValue"))
  }

  /** Compile a Plugin implementation at test time (javax.tools javac —
    * the class exists ONLY inside the temp jar, never on the suite's
    * classpath) and jar it WITHOUT a META-INF/services entry, proving
    * the reference-parity `--jar-path` flow (`PluginDefinitions.scala:
    * 65-86`): URLClassLoader + class-scan fallback. */
  test("external plugin jar loads via jar-path with no service registration") {
    val dir = java.nio.file.Files.createTempDirectory("graft-extjar")
    val src = dir.resolve("ExternalEchoPlugin.java")
    java.nio.file.Files.writeString(src,
      """public class ExternalEchoPlugin implements graft.runner.Plugin {
        |  public String name() { return "ExternalEcho"; }
        |  @SuppressWarnings({"unchecked", "rawtypes"})
        |  public graft.runner.PluginResult performAction(
        |      graft.runner.TestDefinition td, int order) {
        |    scala.collection.immutable.Map empty =
        |      scala.collection.immutable.Map$.MODULE$.empty();
        |    return new graft.runner.PluginResult(
        |      td.name(), name(), order, true,
        |      "echo:" + td.args().apply("msg"), empty,
        |      (scala.Option) scala.None$.MODULE$, false);
        |  }
        |}""".stripMargin)
    val javac = javax.tools.ToolProvider.getSystemJavaCompiler
    val rc = javac.run(null, null, null,
      "-classpath", System.getProperty("java.class.path"),
      "-d", dir.toString, src.toString)
    assert(rc == 0, "javac failed")

    val jarPath = dir.resolve("external-plugin.jar")
    val jos = new java.util.jar.JarOutputStream(
      java.nio.file.Files.newOutputStream(jarPath))
    try {
      jos.putNextEntry(new java.util.zip.ZipEntry("ExternalEchoPlugin.class"))
      jos.write(java.nio.file.Files.readAllBytes(
        dir.resolve("ExternalEchoPlugin.class")))
      jos.closeEntry()
    } finally jos.close()

    // not discoverable from the normal classpath...
    assert(!PluginRegistry.discover().contains("ExternalEcho"))
    // ...but discovered from the jar, and runnable in a DAG
    val plugins = PluginRegistry.discover(jarPaths = Seq(jarPath.toString))
    assert(plugins.contains("ExternalEcho"))
    val res = TestRunner.runTests(
      TestDefinitions.fromJson(
        """{"runs": [{"name": "x", "order": 1, "pluginName": "ExternalEcho",
          |           "args": {"msg": "hi"}}]}""".stripMargin),
      plugins)
    assert(res.head.passed && res.head.returnedValue == "echo:hi")

    // a missing jar is an explicit error, not silent non-discovery
    val e = intercept[IllegalArgumentException] {
      PluginRegistry.discover(jarPaths = Seq(s"$dir/nope.jar"))
    }
    assert(e.getMessage.contains("plugin jar not found"))
  }
}

package graft.runner

import graft.io.PathResolver
import org.apache.hadoop.conf.Configuration

class TestsFailedException(val failed: Int, val total: Int)
  extends Exception(s"$failed of $total tests failed")

/** spark-submit / java entry point for the DAG test runner (reference
  * `E2ERunnerJob.scala:37-109`): load the templated test-definition
  * JSON, discover plugins, run in (order, pluginName) order with
  * dependee-skip, log one line per result, exit by exception if any
  * test failed.
  *
  * Args: `--test-definition-path p [--fail-fast true] [--jar-path j]
  * [--var-k v ...]` (`--var-` prefixed args become `#{k}#` template
  * vars, replacing the reference's scopt `extra-vars`; `--jar-path`
  * loads external plugin jars as in reference
  * `PluginDefinitions.scala:65-86`, comma-separated).
  */
object E2ERunnerJob {

  def main(args: Array[String]): Unit = {
    val kv = graft.cli.CliParametersParser.argsToMap(args)
    val path = kv.getOrElse("test-definition-path",
      throw new IllegalArgumentException("--test-definition-path is required"))
    val failFast = kv.get("fail-fast").exists(_.toBoolean)
    val extraVars = kv.collect { case (k, v) if k.startsWith("var-") => k.stripPrefix("var-") -> v }

    val json = PathResolver.readString(path, new Configuration())
    val defs = TestDefinitions.fromJson(json, extraVars)
    val jarPaths = kv.get("jar-path").toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    val plugins = PluginRegistry.discover(jarPaths = jarPaths)
    val results = TestRunner.runTests(defs, plugins, failFast)
    results.foreach(r => println(ResultLog.format(r)))
    kv.get("out-path").foreach(out =>
      PathResolver.writeString(out, resultsJson(results), new Configuration()))
    val failed = results.count(!_.passed)
    if (failed > 0) throw new TestsFailedException(failed, results.size)
  }

  /** Machine-readable run report (`--out-path`). */
  def resultsJson(results: Seq[PluginResult]): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n") + "\""
    results.map { r =>
      val extra = r.additionalInfo.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ", ", "}")
      s"""  {"test": ${q(r.testName)}, "plugin": ${q(r.pluginName)},
         |   "order": ${r.order}, "passed": ${r.passed},
         |   "returned": ${q(r.returnedValue)}, "additionalInfo": $extra}""".stripMargin
    }.mkString("[\n", ",\n", "\n]")
  }
}

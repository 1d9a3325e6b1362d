package graft.runner

import org.scalatest.funsuite.AnyFunSuite

class RunnerSpec extends AnyFunSuite {

  private class OkPlugin(val name: String = "Ok") extends Plugin {
    var calls: Vector[String] = Vector.empty
    def performAction(td: TestDefinition, order: Int): PluginResult = {
      calls :+= td.name
      PluginResult(td.name, name, order, passed = true)
    }
  }
  private class FailPlugin extends Plugin {
    val name = "Fail"
    def performAction(td: TestDefinition, order: Int): PluginResult =
      PluginResult(td.name, name, order, passed = false, returnedValue = "boom")
  }

  test("JSON DSL parses with vars templating; unresolved vars error") {
    val defs = TestDefinitions.fromJson(
      """{"vars": {"base": "/data"},
        | "runs": [
        |  {"name": "t1", "order": 1, "pluginName": "Ok",
        |   "args": {"path": "#{base}#/in"}},
        |  {"name": "t2", "order": 2, "pluginName": "Ok",
        |   "args": {}, "dependsOn": "t1"}
        |]}""".stripMargin)
    assert(defs.size == 2)
    assert(defs.head.args("path") == "/data/in")
    assert(defs(1).dependsOn.contains("t1"))

    intercept[IllegalArgumentException] {
      TestDefinitions.fromJson("""{"runs": [{"name": "x", "order": 1,
        "pluginName": "Ok", "args": {"p": "#{nope}#"}}]}""")
    }
  }

  test("args accepts reference-style string arrays") {
    val defs = TestDefinitions.fromJson(
      """{"runs": [
        |  {"name": "cli", "order": 1, "pluginName": "Ok",
        |   "args": ["--path", "/in", "--format", "csv"]},
        |  {"name": "cmd", "order": 2, "pluginName": "BashPlugin",
        |   "args": ["echo", "hi", "there"]}
        |]}""".stripMargin)
    assert(defs.head.args == Map("path" -> "/in", "format" -> "csv"))
    assert(defs(1).args == Map("command" -> "echo hi there"))
  }

  test("extra vars override file vars") {
    val defs = TestDefinitions.fromJson(
      """{"vars": {"v": "old"}, "runs": [
        |  {"name": "t", "order": 1, "pluginName": "Ok", "args": {"a": "#{v}#"}}]}""".stripMargin,
      extraVars = Map("v" -> "new"))
    assert(defs.head.args("a") == "new")
  }

  test("DAG validation: dependsOn must run earlier") {
    val bad = Seq(
      TestDefinition("t1", 2, "Ok", Map.empty, dependsOn = Some("t2")),
      TestDefinition("t2", 3, "Ok", Map.empty))
    intercept[IllegalArgumentException] {
      TestDefinitions.ensureOrderAndDependenciesCorrect(bad)
    }
    intercept[IllegalArgumentException] {
      TestDefinitions.ensureOrderAndDependenciesCorrect(Seq(
        TestDefinition("t1", 1, "Ok", Map.empty, dependsOn = Some("ghost"))))
    }
  }

  test("fold-runner skips dependents of failed tests; failFast throws") {
    val ok = new OkPlugin()
    val defs = Seq(
      TestDefinition("fail1", 1, "Fail", Map.empty),
      TestDefinition("child", 2, "Ok", Map.empty, dependsOn = Some("fail1")),
      TestDefinition("indep", 3, "Ok", Map.empty))
    val results = TestRunner.runTests(defs, Map("Ok" -> ok, "Fail" -> new FailPlugin))
    assert(results.map(r => (r.testName, r.passed)) ==
      Seq(("fail1", false), ("child", false), ("indep", true)))
    assert(ok.calls == Vector("indep")) // child was skipped, not run

    intercept[TestFailedFastException] {
      TestRunner.runTests(defs, Map("Ok" -> ok, "Fail" -> new FailPlugin), failFast = true)
    }
  }

  test("result log levels: passed=INFO, dependee-skip=WARN, failure=ERROR") {
    val defs = Seq(
      TestDefinition("fail1", 1, "Fail", Map.empty),
      TestDefinition("child", 2, "Ok", Map.empty, dependsOn = Some("fail1")),
      TestDefinition("indep", 3, "Ok", Map.empty))
    val results = TestRunner.runTests(defs,
      Map("Ok" -> new OkPlugin, "Fail" -> new FailPlugin))
    val byName = results.map(r => r.testName -> ResultLog.levelOf(r)).toMap
    assert(byName("indep") == ResultLog.Info)
    assert(byName("child") == ResultLog.Warn)
    assert(byName("fail1") == ResultLog.Error)
    assert(ResultLog.format(results.head).startsWith("ERROR [FAILED]"))
  }

  test("writeArgs triggers the result writer; writer-less results fail the test") {
    var written: Option[Map[String, String]] = None
    val writerPlugin = new Plugin {
      val name = "Writes"
      def performAction(td: TestDefinition, order: Int): PluginResult =
        PluginResult(td.name, name, order, passed = true,
          writer = Some(w => written = Some(w)))
    }
    val defs = Seq(
      TestDefinition("w", 1, "Writes", Map.empty,
        writeArgs = Map("path" -> "/tmp/x")),
      TestDefinition("nope", 2, "Ok", Map.empty,
        writeArgs = Map("path" -> "/tmp/y")))
    val res = TestRunner.runTests(defs,
      Map("Writes" -> writerPlugin, "Ok" -> new OkPlugin()))
    assert(res.head.passed)
    assert(written.contains(Map("path" -> "/tmp/x")))
    // a result without a writer cannot honor writeArgs → test fails
    assert(!res(1).passed && res(1).returnedValue.contains("does not support write"))
    // without writeArgs the same plugin passes untouched
    val plain = TestRunner.runTests(
      Seq(TestDefinition("ok", 1, "Ok", Map.empty)), Map("Ok" -> new OkPlugin()))
    assert(plain.head.passed)
  }

  test("unknown plugin is rejected up front") {
    intercept[IllegalArgumentException] {
      TestRunner.runTests(Seq(TestDefinition("t", 1, "Ghost", Map.empty)), Map.empty)
    }
  }

  test("BashPlugin runs a real command and captures stdout") {
    val r = new BashPlugin().performAction(
      TestDefinition("echo", 1, "BashPlugin", Map("command" -> "echo hello-$((20+22))")), 0)
    assert(r.passed && r.returnedValue == "hello-42")
    val fail = new BashPlugin().performAction(
      TestDefinition("false", 1, "BashPlugin", Map("command" -> "exit 3")), 0)
    assert(!fail.passed)
  }

  test("duplicate plugin names rejected at discovery") {
    intercept[IllegalStateException] {
      PluginRegistry.discover(Seq(new OkPlugin(), new OkPlugin()))
    }
  }
}

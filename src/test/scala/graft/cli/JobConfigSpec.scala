package graft.cli

import org.scalatest.funsuite.AnyFunSuite

class JobConfigSpec extends AnyFunSuite {

  private val confText =
    """# job defaults
      |dataset-comparison {
      |  errColumn = "errs"      // trailing comment
      |  actualPrefix = act
      |  expectedPrefix: "exp"
      |  allowDuplicates = true
      |}""".stripMargin

  test("HOCON-subset parser handles blocks, separators, quotes, comments") {
    val m = JobConfig.parse(confText)
    assert(m("dataset-comparison.errColumn") == "errs")
    assert(m("dataset-comparison.actualPrefix") == "act")
    assert(m("dataset-comparison.expectedPrefix") == "exp")
    assert(m("dataset-comparison.allowDuplicates") == "true")
    // dotted keys outside a block work too, last value wins
    val m2 = JobConfig.parse("dataset-comparison.errColumn = a\ndataset-comparison.errColumn = b")
    assert(m2("dataset-comparison.errColumn") == "b")
  }

  test("config file sets comparison defaults; CLI flags override them") {
    val f = java.nio.file.Files.createTempFile("graft-conf", ".conf")
    java.nio.file.Files.writeString(f, confText)
    val base = Array("--format", "csv", "--ref-path", "/r", "--new-path", "/n",
      "--out-path", "/o", "--config", f.toString)

    val fromFile = CliParametersParser.parse(base)
    assert(fromFile.errColumn == "errs")
    assert(fromFile.expectedPrefix == "exp")
    assert(fromFile.actualPrefix == "act")
    assert(fromFile.allowDuplicates)

    val overridden = CliParametersParser.parse(
      base ++ Array("--err-column", "cliErr", "--allow-duplicates", "false"))
    assert(overridden.errColumn == "cliErr")
    assert(!overridden.allowDuplicates)
    assert(overridden.expectedPrefix == "exp") // file value still applies
  }

  test("without a config file the shipped reference.conf defaults apply") {
    val p = CliParametersParser.parse(Array("--format", "csv",
      "--ref-path", "/r", "--new-path", "/n", "--out-path", "/o"))
    assert(p.errColumn == "errCol")
    assert(p.expectedPrefix == "expected" && p.actualPrefix == "actual")
    assert(!p.allowDuplicates)
  }

  test("--help prints the option catalog without starting a job") {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      DatasetComparisonJob.main(Array("--help"))
    }
    val text = out.toString("UTF-8")
    assert(text.contains("graft dataset comparison"))
    assert(text.contains("Options:"))
    assert(text.contains("--keys"))
    assert(text.contains("--config"))
  }
}

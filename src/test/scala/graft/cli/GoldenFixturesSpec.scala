package graft.cli

import graft.SparkTestBase
import graft.diff.{DatasetsDifferException, DuplicateKeysException, SchemasDifferException}
import org.scalatest.funsuite.AnyFunSuite

/** E2E assertions against the reference's own golden fixtures (ported
  * verbatim into `src/test/resources/golden/` — see its README): the
  * compound-key XML diff must reproduce `example12_diff.json`
  * byte-for-byte, and the CLI job's exception messages must match the
  * reference's formats exactly
  * (reference `DatasetComparatorJobSuite.scala:37-270`). */
class GoldenFixturesSpec extends AnyFunSuite with SparkTestBase {

  private def res(p: String): String = getClass.getResource(s"/golden/$p").toString
  private def tmpOut(): String =
    java.nio.file.Files.createTempDirectory("graft-golden").toFile.getAbsolutePath + "/out"

  /** Spark 4's Woodstox-backed XML source rejects documents with
    * multiple root elements ("Illegal to have multiple roots"), which
    * the reference-era spark-xml tokenizer tolerated — so the row-only
    * fixtures get a synthetic root wrapper at copy time. rowTag
    * extraction is unaffected and the golden OUTPUT stays byte-equal. */
  private def wrapRoot(fixture: String): String = {
    val content = scala.io.Source.fromURL(getClass.getResource(s"/golden/$fixture")).mkString
    val f = java.nio.file.Files.createTempFile("graft-golden", ".xml")
    java.nio.file.Files.writeString(f, s"<rows>\n$content</rows>\n")
    f.toFile.getAbsolutePath
  }

  test("XML compound-key diff reproduces example12_diff.json verbatim") {
    val out = tmpOut()
    intercept[DatasetsDifferException] {
      DatasetComparisonJob.main(Array(
        "--new-format", "xml",
        "--ref-format", "xml",
        "--rowTag", "row",
        "--new-path", wrapRoot("xml_examples/example2.xml"),
        "--ref-path", wrapRoot("xml_examples/example1.xml"),
        "--out-path", out,
        "--keys", "id,id2,ckey.value"))
    }
    val actualDiff = spark.read.parquet(out)
      .orderBy("expected_id", "expected_id2", "actual_id", "actual_id2", "actual_value")
      .toJSON.collect().mkString("\n")
    val expectedDiff = scala.io.Source.fromURL(
      getClass.getResource("/golden/xml_examples/example12_diff.json"))
      .mkString.trim
    assert(actualDiff == expectedDiff)
  }

  test("keyed CSV diff raises the reference-verbatim differ message") {
    val out = tmpOut()
    val refPath = res("dataSample1.csv")
    val newPath = res("dataSample3.csv")
    val caught = intercept[DatasetsDifferException] {
      DatasetComparisonJob.main(Array(
        "--new-format", "csv",
        "--ref-format", "csv",
        "--delimiter", ",",
        "--header", "true",
        "--new-path", newPath,
        "--ref-path", refPath,
        "--out-path", out,
        "--keys", "id"))
    }
    assert(caught.getMessage ==
      "Expected and actual datasets differ.\n" +
        s"Reference path: $refPath\n" +
        s"Actual dataset path: $newPath\n" +
        s"Difference written to: $out\n" +
        "Count Expected( 9 ) vs Actual( 10 )")
    assert(new java.io.File(out).exists)
  }

  test("duplicate keys raise the reference-verbatim duplicates message") {
    val caught = intercept[DuplicateKeysException] {
      DatasetComparisonJob.main(Array(
        "--new-format", "csv",
        "--ref-format", "csv",
        "--delimiter", ",",
        "--header", "true",
        "--new-path", res("dataSample5.csv"),
        "--ref-path", res("dataSample1.csv"),
        "--out-path", tmpOut(),
        "--keys", "id,first_name"))
    }
    assert(caught.getMessage ==
      "Provided datasets have duplicate rows.\n" +
        "Reference Dataset has 0 duplicates\n" +
        "New Dataset has 1 duplicates")
  }

  test("schema mismatch raises the reference-verbatim schema message") {
    val caught = intercept[SchemasDifferException] {
      DatasetComparisonJob.main(Array(
        "--new-format", "csv",
        "--ref-format", "csv",
        "--delimiter", ",",
        "--new-path", res("dataSample1.csv"),
        "--ref-path", res("dataSample4.csv"),
        "--out-path", tmpOut()))
    }
    assert(caught.getMessage ==
      "Expected and actual datasets differ in schemas. Difference is:\n" +
        "_c5 cannot be found in both schemas")
  }

  test("deeply nested arrays attribute errors to exact flat positions") {
    val out = tmpOut()
    intercept[DatasetsDifferException] {
      DatasetComparisonJob.main(Array(
        "--format", "parquet",
        "--new-path", res("json_changed"),
        "--ref-path", res("json_orig"),
        "--out-path", out,
        "--keys", "id"))
    }
    // reference golden expectation (DatasetComparatorJobSuite.scala:219-243):
    // one row differs in legs[0].legid, one in the 6th element of a
    // triply-nested string array
    val errs = spark.read.parquet(out)
      .select("errCol").collect().flatMap(_.getSeq[String](0)).sorted
    assert(errs.toSeq == Seq("legs_0_conditions_0_checks_0_checkNums_5", "legs_0_legid"))
  }

  test("identical datasets across formats write _METRICS and no diff") {
    val out = tmpOut()
    DatasetComparisonJob.main(Array(
      "--ref-format", "csv",
      "--ref-delimiter", ",",
      "--ref-header", "true",
      "--new-format", "json",
      "--new-path", res("dataSample1.json"),
      "--ref-path", res("dataSample1.csv"),
      "--out-path", out))
    assert(new java.io.File(s"$out/_METRICS").exists)
  }
}

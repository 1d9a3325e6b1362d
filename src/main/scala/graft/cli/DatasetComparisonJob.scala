package graft.cli

import graft.diff.{ComparisonResult, DatasetComparator, DatasetsDifferException, DiffOptions}
import graft.io.{DataFrameIO, PathResolver, SourceParams}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}

/** CLI parameter model (reference `cliUtils/CliParametersParser.scala`):
  * `--ref-*` / `--new-*` / `--out-*` trios with un-prefixed generics
  * applying to both inputs, plus `--keys a,b`, `--schema path`,
  * `--allow-duplicates`. Out format defaults to parquet. */
case class CliParameters(
    ref: SourceParams,
    actual: SourceParams,
    out: SourceParams,
    keys: Seq[String],
    schemaPath: Option[String],
    allowDuplicates: Boolean,
    errColumn: String = "errCol",
    expectedPrefix: String = "expected",
    actualPrefix: String = "actual")

object CliParametersParser {

  private val prefixes = Seq("ref-", "new-", "out-")
  private val specials = Set("keys", "schema", "allow-duplicates",
    "err-column", "expected-prefix", "actual-prefix", "config")

  def parse(args: Array[String]): CliParameters = {
    val kv = argsToMap(args)
    // config-file defaults (reference config/TypesafeConfig.scala:21-31);
    // explicit CLI flags win over the file, the file over built-ins
    val cfg = JobConfig.load(kv.get("config"),
      new org.apache.hadoop.conf.Configuration())
    val generic = kv.filterNot { case (k, _) =>
      prefixes.exists(k.startsWith) || specials.contains(k)
    }
    def section(prefix: String): Map[String, String] =
      generic ++ kv.collect { case (k, v) if k.startsWith(prefix) => k.stripPrefix(prefix) -> v }
    def toParams(m: Map[String, String], defaults: Map[String, String]): SourceParams = {
      val merged = defaults ++ m
      SourceParams(
        merged.getOrElse("format", throw new IllegalArgumentException("missing --format")),
        merged.get("path"),
        merged - "format" - "path").validated
    }
    // generics apply to the two INPUTS; the out sink takes only out-*
    // and defaults to parquet (reference CliParametersParser.scala:51,73)
    val outOnly = kv.collect { case (k, v) if k.startsWith("out-") => k.stripPrefix("out-") -> v }
    CliParameters(
      ref = toParams(section("ref-"), Map.empty),
      actual = toParams(section("new-"), Map.empty),
      out = toParams(outOnly, Map("format" -> "parquet")),
      keys = kv.get("keys").map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil),
      schemaPath = kv.get("schema"),
      allowDuplicates = kv.get("allow-duplicates").map(_.toBoolean)
        .getOrElse(cfg.allowDuplicates),
      errColumn = kv.getOrElse("err-column", cfg.errColumn),
      expectedPrefix = kv.getOrElse("expected-prefix", cfg.expectedPrefix),
      actualPrefix = kv.getOrElse("actual-prefix", cfg.actualPrefix))
  }

  /** `--k v --k2 v2` pairs → map (reference `:135-137`). */
  def argsToMap(args: Array[String]): Map[String, String] = {
    args.grouped(2).map {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
      case other => throw new IllegalArgumentException(
        s"expected --key value pairs, got: ${other.mkString(" ")}")
    }.toMap
  }
}

/** spark-submit entry point (reference `DatasetComparisonJob.scala`):
  * load both sides, compare, write the diff + `_METRICS`, exit by
  * exception when the datasets differ. */
object DatasetComparisonJob {

  def main(args: Array[String]): Unit = {
    if (args.contains("--help")) { println(CliHelp.text); return }
    val params = CliParametersParser.parse(args)
    val builder = SparkSession.builder()
      .appName("graft-dataset-comparison")
      .config("spark.sql.adaptive.enabled", "true")
    // spark-submit injects the master; default to local[*] for plain-JVM runs
    if (!sys.props.contains("spark.master") && sys.env.get("MASTER").isEmpty)
      builder.master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
    implicit val spark: SparkSession = builder.getOrCreate()
    val result = execute(params)
    if (!result.datasetsMatch)
      throw new DatasetsDifferException(
        result.refRowCount, result.newRowCount, result.diffCount,
        Some("Expected and actual datasets differ.\n" +
          s"Reference path: ${params.ref.path.getOrElse("")}\n" +
          s"Actual dataset path: ${params.actual.path.getOrElse("")}\n" +
          s"Difference written to: ${params.out.path.getOrElse("")}\n" +
          s"Count Expected( ${result.refRowCount} ) vs Actual( ${result.newRowCount} )"))
  }

  def execute(params: CliParameters)(implicit spark: SparkSession): ComparisonResult = {
    val providedSchema = params.schemaPath.map { p =>
      DataType.fromJson(
        PathResolver.readString(p, spark.sparkContext.hadoopConfiguration))
        .asInstanceOf[StructType]
    }
    val ref = DataFrameIO.load(params.ref)
    val actual = DataFrameIO.load(params.actual)
    val result = new DatasetComparator(ref, actual, DiffOptions(
      keys = params.keys,
      errorColumnName = params.errColumn,
      expectedPrefix = params.expectedPrefix,
      actualPrefix = params.actualPrefix,
      allowDuplicates = params.allowDuplicates,
      providedSchema = providedSchema)).compare()

    val passedOptions = s"ref=${params.ref.format} new=${params.actual.format} " +
      s"keys=${params.keys.mkString(",")}"
    val finalResult = result.copy(passedOptions = passedOptions)

    val outPath = result.resultDF match {
      case Some(df) => DataFrameIO.write(df, params.out)
      case None => params.out.path.getOrElse("")
    }
    if (outPath.nonEmpty)
      PathResolver.writeString(s"$outPath/_METRICS", finalResult.toJson,
        spark.sparkContext.hadoopConfiguration)
    finalResult
  }
}

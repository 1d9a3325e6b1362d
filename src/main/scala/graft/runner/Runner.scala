package graft.runner

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** One test to run (reference `TestDefinition.scala:36-41`). */
case class TestDefinition(
    name: String,
    order: Int,
    pluginName: String,
    args: Map[String, String],
    dependsOn: Option[String] = None,
    writeArgs: Map[String, String] = Map.empty)

/** Result of one plugin action (reference `PluginResult.scala:21-71`).
  * `writer` is the persistence hook behind [[write]]: a closure set by
  * the producing plugin, capturing whatever the result needs to persist
  * itself (e.g. the diff DataFrame) — the case-class analogue of the
  * reference's typed PluginResult subclasses overriding `write`. */
case class PluginResult(
    testName: String,
    pluginName: String,
    order: Int,
    passed: Boolean,
    returnedValue: String = "",
    additionalInfo: Map[String, String] = Map.empty,
    writer: Option[Map[String, String] => Unit] = None,
    /** Set by the runner itself for dependee-skips — carried as a real
      * field so log-level classification never string-sniffs a
      * plugin-controlled returnedValue. */
    skipped: Boolean = false) {

  /** Persist this result per the test's `writeArgs` (reference
    * `PluginResult.scala:53-55`: unimplemented write is an error). */
  def write(writeArgs: Map[String, String]): Unit =
    writer.getOrElse(throw new NotImplementedError(
      s"result of plugin '$pluginName' does not support write"))(writeArgs)

  def resultLog: String = {
    val status = if (passed) "PASSED" else "FAILED"
    s"[$status] #$order $testName ($pluginName)" +
      (if (returnedValue.nonEmpty) s": $returnedValue" else "")
  }
}

/** A runnable plugin (reference `Plugin.scala:19-37`), discovered via
  * `java.util.ServiceLoader` (idiomatic replacement for the reference's
  * classpath scanning, `PluginDefinitions.scala:65-86`). */
trait Plugin {
  def name: String
  def performAction(td: TestDefinition, order: Int): PluginResult
}

object PluginRegistry {
  /** ServiceLoader discovery + explicit registration for embedding.
    * `jarPaths` loads EXTERNAL plugin jars the way the reference does
    * (`PluginDefinitions.scala:65-86`): a URLClassLoader over each jar,
    * ServiceLoader against it for well-formed jars, plus a class scan
    * fallback so jars WITHOUT a META-INF/services entry still work. */
  def discover(extra: Seq[Plugin] = Nil, jarPaths: Seq[String] = Nil): Map[String, Plugin] = {
    val loaded = java.util.ServiceLoader.load(classOf[Plugin]).iterator().asScala.toSeq
    val all = loaded ++ extra ++ jarPaths.flatMap(fromJar)
    val dupes = all.groupBy(_.name).filter(_._2.size > 1).keys
    if (dupes.nonEmpty)
      throw new IllegalStateException(s"duplicate plugin name(s): ${dupes.mkString(", ")}")
    all.map(p => p.name -> p).toMap
  }

  /** All [[Plugin]] implementations inside one jar: ServiceLoader first,
    * then a scan of the jar's class entries, deduped by class name. The
    * scan loads candidate classes lazily (initialize = false) and skips
    * anything abstract, non-Plugin, or without a no-arg constructor. */
  private def fromJar(path: String): Seq[Plugin] = {
    val file = new java.io.File(path)
    if (!file.isFile)
      throw new IllegalArgumentException(s"plugin jar not found: $path")
    val loader = new java.net.URLClassLoader(
      Array(file.toURI.toURL), getClass.getClassLoader)
    // the URLClassLoader delegates to the app loader, so ServiceLoader
    // re-surfaces classpath-registered plugins — keep only classes that
    // were actually loaded from THIS jar
    val viaService =
      java.util.ServiceLoader.load(classOf[Plugin], loader).iterator().asScala
        .filter(_.getClass.getClassLoader eq loader).toSeq
    val jar = new java.util.jar.JarFile(file)
    // two skip severities: a class that IS a Plugin but won't instantiate
    // must be diagnosable per-class (it silently vanishes from the
    // registry otherwise); a random class with absent optional deps is
    // NORMAL in a plugin jar and gets one summary line, not a warning
    // per class — a large jar would otherwise emit hundreds of lines
    val brokenPlugins = List.newBuilder[(String, Throwable)]
    var otherSkips = 0
    val viaScan =
      try {
        jar.entries().asScala
          .filter(e => e.getName.endsWith(".class") && !e.getName.contains('$'))
          .flatMap { e =>
            val cn = e.getName.stripSuffix(".class").replace('/', '.')
            try {
              val c = Class.forName(cn, false, loader)
              // same jar-only filter as viaService: a fat/assembly jar can
              // contain classpath classes (parent-first loads them from the
              // app loader) — instantiating those would duplicate builtins
              if (classOf[Plugin].isAssignableFrom(c) &&
                  !java.lang.reflect.Modifier.isAbstract(c.getModifiers) &&
                  (c.getClassLoader eq loader))
                try Some(c.getDeclaredConstructor().newInstance().asInstanceOf[Plugin])
                catch {
                  case t @ (_: LinkageError | _: ReflectiveOperationException) =>
                    brokenPlugins += cn -> t; None
                  case scala.util.control.NonFatal(t) =>
                    brokenPlugins += cn -> t; None
                }
              else None
            } catch {
              case _: LinkageError | _: ReflectiveOperationException =>
                otherSkips += 1; None
              case scala.util.control.NonFatal(_) =>
                otherSkips += 1; None
            }
          }.toList
      } finally jar.close()
    brokenPlugins.result().foreach { case (cn, t) =>
      System.err.println(
        s"[plugin-scan] Plugin $cn in $path failed to instantiate: " +
        s"${t.getClass.getSimpleName}: ${t.getMessage}")
    }
    if (otherSkips > 0)
      System.err.println(
        s"[plugin-scan] skipped $otherSkips unloadable non-plugin class(es) in $path")
    // the loader stays open deliberately: discovered Plugin instances
    // keep loading classes from their jar for the life of the run
    (viaService ++ viaScan).groupBy(_.getClass.getName).values.map(_.head).toSeq
  }
}

/** The `{vars: {...}, runs: [...]}` JSON DSL with `#{var}#` templating
  * (reference `TestDefinitions.scala:98-125`,
  * `TestDefinitionJsonProtocol.scala`). */
object TestDefinitions {

  private val mapper = new ObjectMapper()
    .configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
  private val VarPattern = "#\\{([^}]+)\\}#".r

  def fromJson(json: String, extraVars: Map[String, String] = Map.empty): Seq[TestDefinition] = {
    val root = mapper.readTree(json)
    val vars = Option(root.get("vars")).map(v =>
      v.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
      .getOrElse(Map.empty) ++ extraVars
    val runsNode = Option(root.get("runs"))
      .getOrElse(throw new IllegalArgumentException("test definition needs a 'runs' array"))
    val templated = applyVars(runsNode.toString, vars)
    mapper.readTree(templated).elements().asScala.map(parseOne).toSeq
  }

  /** Replace `#{k}#`; unresolved vars are an error (reference `:98-103`). */
  def applyVars(json: String, vars: Map[String, String]): String = {
    val replaced = vars.foldLeft(json) { case (acc, (k, v)) =>
      acc.replace(s"#{$k}#", v)
    }
    VarPattern.findFirstMatchIn(replaced).foreach { m =>
      throw new IllegalArgumentException(s"unresolved variable: ${m.group(1)}")
    }
    replaced
  }

  private def parseOne(n: JsonNode): TestDefinition = {
    // args may be an object ({"k": "v"}) or, as in the reference DSL, a
    // CLI-style string array (["--k", "v", ...] → pairs; anything else →
    // joined under "command")
    def strMap(node: JsonNode): Map[String, String] =
      if (node == null || node.isMissingNode || node.isNull) Map.empty
      else if (node.isArray) {
        val items = node.elements().asScala.map(_.asText()).toArray
        if (items.headOption.exists(_.startsWith("--")))
          graft.cli.CliParametersParser.argsToMap(items)
        else Map("command" -> items.mkString(" "))
      }
      else node.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    TestDefinition(
      name = n.path("name").asText(),
      order = n.path("order").asInt(),
      pluginName = n.path("pluginName").asText(),
      args = strMap(n.get("args")),
      dependsOn = Option(n.get("dependsOn")).filterNot(_.isNull).map(_.asText()),
      writeArgs = strMap(n.get("writeArgs")))
  }

  /** Execution order: (order, pluginName) sort (reference
    * `TestDefinitions.scala:49`). */
  def sorted(defs: Seq[TestDefinition]): Seq[TestDefinition] =
    defs.sortBy(d => (d.order, d.pluginName))

  /** Topological sanity: every dependsOn must appear EARLIER in the
    * sorted sequence (reference `TestDefinitions.scala:22-34`). */
  def ensureOrderAndDependenciesCorrect(defs: Seq[TestDefinition]): Unit = {
    val s = sorted(defs)
    s.zipWithIndex.foreach { case (d, i) =>
      d.dependsOn.foreach { dep =>
        val depIdx = s.indexWhere(_.name == dep)
        if (depIdx < 0)
          throw new IllegalArgumentException(s"test '${d.name}' depends on unknown '$dep'")
        if (depIdx >= i)
          throw new IllegalArgumentException(
            s"test '${d.name}' depends on '$dep' which does not run before it")
      }
    }
  }
}

/** Leveled classification of plugin results (reference
  * `e2eRunner/logging/LogLevel.scala`, `ResultLog.scala`, `Scribe.scala`):
  * passed tests log at INFO, dependee-skips at WARN, real failures at
  * ERROR — so a CI log grep for ERROR surfaces only genuine breakage. */
object ResultLog {
  sealed abstract class Level(val name: String)
  case object Info extends Level("INFO")
  case object Warn extends Level("WARN")
  case object Error extends Level("ERROR")

  def levelOf(r: PluginResult): Level =
    if (r.passed) Info
    else if (r.skipped) Warn
    else Error

  def format(r: PluginResult): String = s"${levelOf(r).name} ${r.resultLog}"
}

class TestFailedFastException(val testName: String)
  extends Exception(s"fail-fast: test '$testName' failed")

/** DAG fold-runner (reference `E2ERunnerJob.runTests`,
  * `E2ERunnerJob.scala:79-119`): skip-as-failed when a dependee failed,
  * optional fail-fast throw. */
object TestRunner {

  def runTests(
      defs: Seq[TestDefinition],
      plugins: Map[String, Plugin],
      failFast: Boolean = false): Seq[PluginResult] = {
    TestDefinitions.ensureOrderAndDependenciesCorrect(defs)
    val missing = defs.map(_.pluginName).distinct.filterNot(plugins.contains)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(s"unknown plugin(s): ${missing.mkString(", ")}")

    TestDefinitions.sorted(defs).zipWithIndex
      .foldLeft(Vector.empty[PluginResult]) { case (acc, (td, i)) =>
        val dependeeFailed = td.dependsOn.exists(dep => !acc.exists(r => r.testName == dep && r.passed))
        val result =
          if (td.dependsOn.isDefined && dependeeFailed)
            PluginResult(td.name, td.pluginName, i, passed = false,
              returnedValue = s"skipped: dependee '${td.dependsOn.get}' failed or missing",
              skipped = true)
          else
            try {
              val r = plugins(td.pluginName).performAction(td, i)
              // persist when the definition carries writeArgs (reference
              // E2ERunnerJob.scala:125); a write failure fails the test
              if (td.writeArgs.nonEmpty) r.write(td.writeArgs)
              r
            } catch {
              case e: Exception =>
                PluginResult(td.name, td.pluginName, i, passed = false,
                  returnedValue = s"plugin threw: ${e.getMessage}")
              case e: NotImplementedError =>
                PluginResult(td.name, td.pluginName, i, passed = false,
                  returnedValue = s"plugin threw: ${e.getMessage}")
            }
        if (!result.passed && failFast) throw new TestFailedFastException(td.name)
        acc :+ result
      }
  }
}

/** Fork a bash command, capture stdout + timing (reference
  * `BashPlugin.scala:54-70` with `calculateTime`/pretty elapsed from
  * `HelperFunctions.scala:168-211`). */
class BashPlugin extends Plugin {
  import scala.sys.process._
  override val name = "BashPlugin"
  override def performAction(td: TestDefinition, order: Int): PluginResult = {
    val cmd = td.args.getOrElse("command",
      throw new IllegalArgumentException("BashPlugin needs a 'command' arg"))
    val out = new StringBuilder
    val (code, elapsedMs) = graft.util.Timing.calculateTime {
      Seq("bash", "-c", cmd) ! ProcessLogger(l => out.append(l).append('\n'), _ => ())
    }
    PluginResult(td.name, name, order, passed = code == 0,
      returnedValue = out.toString.trim,
      additionalInfo = Map("elapsed" -> graft.util.Timing.prettyElapsed(elapsedMs)),
      // parity with the reference: bash results warn instead of failing
      // when asked to persist (BashPlugin.scala:37-39)
      writer = Some(_ => System.err.println(
        s"[$name] result of '${td.name}' does not support write; ignored")))
  }
}

/** Dataset comparison as a runner plugin (reference
  * `DatasetComparisonPlugin.scala:79-105`) — reuses the active session. */
class DatasetComparisonPlugin extends Plugin {
  override val name = "DatasetComparison"
  override def performAction(td: TestDefinition, order: Int): PluginResult = {
    val cliArgs = td.args.toSeq.flatMap { case (k, v) => Seq(s"--$k", v) }
    val params = graft.cli.CliParametersParser.parse(cliArgs.toArray)
    implicit val spark: org.apache.spark.sql.SparkSession =
      org.apache.spark.sql.SparkSession.builder().getOrCreate()
    try {
      val r = graft.cli.DatasetComparisonJob.execute(params)
      PluginResult(td.name, name, order, passed = r.datasetsMatch,
        returnedValue = s"diffCount=${r.diffCount}",
        // writeArgs sink: diff DF (when any) + _METRICS beside it
        // (reference DatasetComparisonPlugin.scala:39-53)
        writer = Some { wargs =>
          val out = graft.io.SourceParams(
            wargs.getOrElse("format", "parquet"), wargs.get("path"),
            wargs - "format" - "path").validated
          val written = r.resultDF match {
            case Some(df) => graft.io.DataFrameIO.write(df, out)
            case None => out.path.getOrElse("")
          }
          if (written.nonEmpty)
            graft.io.PathResolver.writeString(s"$written/_METRICS", r.toJson,
              spark.sparkContext.hadoopConfiguration)
        })
    } catch {
      case e: Exception =>
        PluginResult(td.name, name, order, passed = false, returnedValue = e.getMessage)
    }
  }
}

/** `_INFO` control-measure comparison as a runner plugin (reference
  * `plugins/InfoFileComparisonPlugin.scala:63-82`): plain file IO, no
  * Spark needed; the diff JSON is persisted via writeArgs only when the
  * files differ (reference `:39-44`). */
class InfoFileComparisonPlugin extends Plugin {
  override val name = "InfoFileComparison"
  override def performAction(td: TestDefinition, order: Int): PluginResult = {
    val conf = new org.apache.hadoop.conf.Configuration()
    def arg(k: String): String = td.args.getOrElse(k,
      throw new IllegalArgumentException(s"InfoFileComparison needs '--$k'"))
    val ref = graft.io.PathResolver.readString(arg("ref-path"), conf)
    val actual = graft.io.PathResolver.readString(arg("new-path"), conf)
    val diffs = graft.infodiff.InfoFileDiff.compare(ref, actual)
    PluginResult(td.name, name, order, passed = diffs.isEmpty,
      returnedValue = s"differences=${diffs.length}",
      additionalInfo = td.args,
      writer = Some { wargs =>
        if (diffs.nonEmpty) {
          val out = wargs.getOrElse("path", wargs.getOrElse("out-path",
            throw new IllegalArgumentException(
              "InfoFileComparison writeArgs need a 'path'")))
          graft.io.PathResolver.writeString(out,
            graft.infodiff.InfoFileDiff.toJson(diffs), conf)
        }
      })
  }
}

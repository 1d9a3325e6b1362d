package graft.cli

import org.apache.hadoop.conf.Configuration

/** Comparison defaults loadable from a config file (reference
  * `config/TypesafeConfig.scala:21-31`, `DatasetComparisonConfig.scala:27-45`).
  * Typesafe Config is not on Spark's classpath, so the `key = value`
  * HOCON subset that the reference's own `reference.conf` uses is parsed
  * directly: `name { ... }` blocks, dotted keys, `=` or `:` separators,
  * quoted values, `#`/`//` comments, last-wins overrides. */
case class DiffConfigValues(
    errColumn: String,
    expectedPrefix: String,
    actualPrefix: String,
    allowDuplicates: Boolean)

object JobConfig {

  val defaults: DiffConfigValues =
    DiffConfigValues("errCol", "expected", "actual", allowDuplicates = false)

  /** Precedence mirrors `ConfigFactory.load(path)`: explicit file, else
    * classpath application.conf, else the library's shipped defaults,
    * else hard defaults. The shipped file lives at the package-qualified
    * `graft/reference.conf`: on a real spark-submit classpath a bare
    * `reference.conf` lookup is classpath-order-dependent (any
    * Typesafe-config user ships one), so it must never be resolved by
    * plain name. */
  def load(path: Option[String], conf: Configuration): DiffConfigValues = {
    val text = path.map(p => graft.io.PathResolver.readString(p, conf))
      .orElse(classpathText("application.conf"))
      .orElse(classpathText("graft/reference.conf"))
    text.map(fromText).getOrElse(defaults)
  }

  def fromText(text: String): DiffConfigValues = {
    val m = parse(text)
    def get(k: String, dflt: String) = m.getOrElse(s"dataset-comparison.$k", dflt)
    DiffConfigValues(
      errColumn = get("errColumn", defaults.errColumn),
      expectedPrefix = get("expectedPrefix", defaults.expectedPrefix),
      actualPrefix = get("actualPrefix", defaults.actualPrefix),
      allowDuplicates = get("allowDuplicates", defaults.allowDuplicates.toString).toBoolean)
  }

  private def classpathText(name: String): Option[String] =
    Option(getClass.getClassLoader.getResourceAsStream(name))
      .map(in => try new String(in.readAllBytes(), "UTF-8") finally in.close())

  /** Flat `dotted.key -> value` view of the supported HOCON subset. */
  def parse(text: String): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var stack: List[String] = Nil
    text.linesIterator.map(stripComment).map(_.trim).filter(_.nonEmpty).foreach {
      case line if line.endsWith("{") =>
        stack = line.dropRight(1).trim :: stack
      case "}" =>
        stack = stack.drop(1)
      case line =>
        val sep = line.indexWhere(c => c == '=' || c == ':')
        if (sep > 0) {
          val key = (line.take(sep).trim :: stack).reverse.mkString(".")
          out(key) = unquote(line.drop(sep + 1).trim)
        }
    }
    out.toMap
  }

  private def stripComment(line: String): String = {
    var inQuote = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"') inQuote = !inQuote
      else if (!inQuote && (c == '#' ||
        (c == '/' && i + 1 < line.length && line.charAt(i + 1) == '/')))
        return line.take(i)
      i += 1
    }
    line
  }

  private def unquote(v: String): String =
    if (v.length >= 2 && v.head == '"' && v.last == '"') v.substring(1, v.length - 1)
    else v
}

/** `--help` text rendered from the structured option catalog shipped as
  * `cli_options.json` (reference `cliUtils/CliHelp.scala`,
  * `cli_options.json` — machine-readable help that doubles as docs). */
object CliHelp {
  def text: String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(
      getClass.getClassLoader.getResourceAsStream("cli_options.json"))
    import scala.jdk.CollectionConverters._
    val options = root.get("options").elements().asScala.map { o =>
      f"${o.get("key").asText()}%-26s${o.get("optional").asText()}%-11s${o.get("text").asText()}"
    }.mkString("\n")
    s"""${root.get("title").asText()}
       |${root.get("description").asText()}
       |${root.get("example").asText()}
       |Options:
       |$options""".stripMargin
  }
}

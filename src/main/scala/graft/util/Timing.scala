package graft.util

/** Driver-side scalar helpers (SURVEY.md §2.7: elapsed-time pretty
  * printer, block timer, `{var}` templating, ordinal suffix — reference
  * `utils/.../HelperFunctions.scala:168-230`). */
object Timing {

  /** Run `block`, returning (result, elapsedMillis). */
  def calculateTime[T](block: => T): (T, Long) = {
    val t0 = System.nanoTime()
    val r = block
    (r, (System.nanoTime() - t0) / 1000000L)
  }

  /** "1 day 2 hours 3 minutes 4.005 seconds" style pretty elapsed time. */
  def prettyElapsed(millis: Long): String = {
    require(millis >= 0)
    val days = millis / 86400000L
    val hours = millis % 86400000L / 3600000L
    val minutes = millis % 3600000L / 60000L
    val secs = millis % 60000L / 1000L
    val ms = millis % 1000L
    val parts = Seq(
      days -> "day", hours -> "hour", minutes -> "minute").collect {
      case (n, unit) if n > 0 => s"$n $unit" + (if (n == 1) "" else "s")
    }
    val secondsPart =
      if (ms > 0) Some(f"$secs%d.$ms%03d seconds")
      else if (secs > 0 || parts.isEmpty) Some(s"$secs second" + (if (secs == 1) "" else "s"))
      else None
    (parts ++ secondsPart).mkString(" ")
  }

  /** 1st, 2nd, 3rd, 4th… 11th/12th/13th special-cased. */
  def ordinal(n: Int): String = {
    val suffix = n % 100 match {
      case 11 | 12 | 13 => "th"
      case _ => n % 10 match {
        case 1 => "st"
        case 2 => "nd"
        case 3 => "rd"
        case _ => "th"
      }
    }
    s"$n$suffix"
  }
}

object Strings {
  /** `"{name} is {state}".richFormat("name" -> "x")` style templating
    * (reference `HelperFunctions.scala:218-219`). Unknown keys are left
    * in place. */
  def richFormat(template: String, vars: Map[String, Any]): String =
    vars.foldLeft(template) { case (acc, (k, v)) =>
      acc.replace(s"{$k}", v.toString)
    }
}

package graft.ts

/** Graphite-style duration strings (reference: `misc/misc.go:39-77`).
  *
  * Suffixes: `s`, `min`, `h`, `d`, `w`, `mon`, `y` (plus `ms`), and the
  * long forms `BetterParseDuration` rewrites (`minute(s)`, `hour(s)`,
  * `week(s)`) plus Go's bare `m` = minutes. A bare number is seconds.
  * `mon` = 30 d, `y` = 365 d, matching the reference's fixed conversion
  * factors (calendar-exact months are NOT intended).
  */
object Durations {
  private val unitMs: Map[String, Long] = Map(
    "ms" -> 1L,
    "s" -> 1000L,
    "sec" -> 1000L, "second" -> 1000L, "seconds" -> 1000L,
    "m" -> 60L * 1000, // Go time.ParseDuration: bare m = minutes
    "min" -> 60L * 1000, "minute" -> 60L * 1000, "minutes" -> 60L * 1000,
    "h" -> 3600L * 1000, "hour" -> 3600L * 1000, "hours" -> 3600L * 1000,
    "d" -> 86400L * 1000, "day" -> 86400L * 1000, "days" -> 86400L * 1000,
    "w" -> 7L * 86400 * 1000,
    "week" -> 7L * 86400 * 1000, "weeks" -> 7L * 86400 * 1000,
    "mon" -> 30L * 86400 * 1000,
    "y" -> 365L * 86400 * 1000,
    "year" -> 365L * 86400 * 1000, "years" -> 365L * 86400 * 1000)

  private val Pat =
    ("^([+-]?)(\\d+(?:\\.\\d+)?)" +
      "(ms|mon|minutes|minute|min|m|seconds|second|sec|s" +
      "|hours|hour|h|days|day|d|weeks|week|w|years|year|y)?$").r

  /** Parse to milliseconds. Throws IllegalArgumentException on junk. */
  def parseMs(s: String): Long = s.trim match {
    case Pat(sign, num, unit) =>
      val u = Option(unit).getOrElse("s")
      val v = (num.toDouble * unitMs(u)).toLong
      if (sign == "-") -v else v
    case other =>
      throw new IllegalArgumentException(s"bad duration: '$other'")
  }

  def parseSeconds(s: String): Long = parseMs(s) / 1000
}

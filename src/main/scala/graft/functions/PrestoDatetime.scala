package graft.functions

/** Presto datetime format-string shims (SURVEY.md §2.8 Date/time row).
  *
  * Presto's `date_format`/`date_parse` use MySQL `%`-patterns
  * (reference: presto-main DateTimeFunctions.java, which delegates to a
  * MySQL-compatible JodaTime formatter), while Spark's `date_format`
  * uses java.time patterns. This is a pure compile-time translation —
  * the produced pattern feeds Spark's codegen'd `date_format`, so there
  * is no per-row interpretation cost.
  */
object PrestoDatetime {
  /** Translate a MySQL/Presto `%`-pattern to a java.time pattern. */
  def translateFormat(mysql: String): String = {
    val out = new StringBuilder
    var i = 0
    var literal = new StringBuilder
    def flush(): Unit = {
      if (literal.nonEmpty) {
        // quote literal text so e.g. 'T' is not a pattern letter
        val s = literal.toString
        if (s.exists(_.isLetter)) out.append("'").append(s.replace("'", "''")).append("'")
        else out.append(s)
        literal = new StringBuilder
      }
    }
    while (i < mysql.length) {
      val c = mysql.charAt(i)
      if (c == '%' && i + 1 < mysql.length) {
        flush()
        mysql.charAt(i + 1) match {
          case 'Y' => out.append("yyyy")
          case 'y' => out.append("yy")
          case 'm' => out.append("MM")
          case 'c' => out.append("M")
          case 'd' => out.append("dd")
          case 'e' => out.append("d")
          case 'H' => out.append("HH")
          case 'k' => out.append("H")
          case 'h' | 'I' => out.append("hh")
          case 'l' => out.append("h")
          case 'i' => out.append("mm") // MySQL minutes
          case 's' | 'S' => out.append("ss")
          case 'f' => out.append("SSSSSS")
          case 'p' => out.append("a")
          case 'M' => out.append("MMMM")
          case 'b' => out.append("MMM")
          case 'W' => out.append("EEEE")
          case 'a' => out.append("EEE")
          case 'j' => out.append("DDD")
          case 'T' => out.append("HH:mm:ss")
          case '%' => literal.append('%')
          case other => literal.append(other)
        }
        i += 2
      } else {
        literal.append(c)
        i += 1
      }
    }
    flush()
    out.toString
  }
}

package graft.expr

/** strftime → java.time format conversion, same mapping the reference uses
  * (ref: python/feathub/common/utils.py:32-51 `to_java_date_format`).
  */
object TimeFormats {
  private val mapping: Map[Char, String] = Map(
    'Y' -> "yyyy",
    'm' -> "MM",
    'd' -> "dd",
    'H' -> "HH",
    'M' -> "mm",
    'S' -> "ss",
    'f' -> "SSS",
    'z' -> "X")

  def toJavaDateFormat(pythonFormat: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < pythonFormat.length) {
      val c = pythonFormat(i)
      if (c == '%' && i + 1 < pythonFormat.length) {
        val d = pythonFormat(i + 1)
        sb.append(mapping.getOrElse(d, d.toString))
        i += 2
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }
}

package graft.frontend

/** Source-positioned error formatting (reference report.ml's snippet
  * style: the offending line with a marker under the column).
  */
object Report {

  def format(src: String, offset: Int, msg: String): String = {
    val off = math.max(0, math.min(offset, src.length))
    val upto = src.take(off)
    val line = upto.count(_ == '\n') + 1
    val lineStart = upto.lastIndexOf('\n') + 1
    val col = off - lineStart + 1
    val lineEnd = src.indexOf('\n', lineStart) match {
      case -1 => src.length
      case e  => e
    }
    val text = src.substring(lineStart, lineEnd)
    s"""line $line, character $col: $msg
       |  │ $text
       |  │ ${" " * (col - 1)}⮬ $msg""".stripMargin
  }
}

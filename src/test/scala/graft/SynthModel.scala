package graft

/** Independent plain-Scala re-derivation of the page synthesis — a
  * second oracle for the tests, deliberately written against the
  * *documented defect rules* (PageSynth scaladoc) rather than the SQL
  * template, so a template bug can't hide in both places.
  */
object SynthModel {
  case class MPage(docId: Long, url: String, warcEpoch: Option[Long], pday: String,
      text: Option[String], lang: Option[String], host: String)

  private val BoilerA = "boilerplate cookie consent page please accept our terms and conditions to continue reading the content of this site"
  private val BoilerB = "boilerplate cookie consent page please accept our terms and conditions to continue reading the content of this website"

  def host(pid: Long): String = {
    val id =
      if (pid % 100 < 40) 0L
      else if (pid % 100 < 65) 1L
      else if (pid % 100 < 80) 2L
      else if (pid % 100 < 90) 3L
      else (pid % 97) + 4
    f"h$id%03d.example.com"
  }

  def url(docId: Long): String = {
    val pid = if (docId % 131 == 7) docId - 7 else docId
    val h = host(pid)
    if (pid % 439 == 0) s"http://$h/bad path/$pid"
    else if (pid % 433 == 0) s"notaurl-$pid"
    else if (pid % 211 == 0) s"https://$h/p/$pid.html?session=${"x" * 60}"
    else {
      val ext =
        if (pid % 463 == 0) ".xhtml"
        else if (pid % 467 == 0) ".htm"
        else if (pid % 479 == 0) ".txt"
        else ".html"
      s"https://$h/p/$pid$ext"
    }
  }

  def warcEpoch(docId: Long): Option[Long] =
    if (docId % 353 == 0) None
    else if (docId % 359 == 0) Some(499162500L)
    else if (docId % 45 >= 23 && docId % 11 < 3)
      Some(1704067200L + (docId % 45) * 86400 + 10800 + (docId * 7919) % 3600)
    else Some(1704067200L + (docId % 45) * 86400 + (docId * 7919) % 86400)

  def pday(docId: Long): String =
    if (docId % 353 == 0) "null"
    else if (docId % 359 == 0) "1985-10-26"
    else java.time.LocalDate.of(2024, 1, 1).plusDays(docId % 45).toString

  def text(docId: Long, base: String): Option[String] =
    if (docId % 349 == 0) None
    else if (docId % 347 == 0) Some("")
    else if (docId % 127 == 3) Some(BoilerA)
    else if (docId % 127 == 4) Some(BoilerB)
    else if (docId % 127 == 5) Some((1 to 400).map(i => f"w$i%03d").mkString(" "))
    else if (docId % 127 == 6)
      Some((1 to 400).map(i => if (i == 200) "wzzz" else f"w$i%03d").mkString(" "))
    else if (docId % 457 == 0)
      Some(s"""<a href="https://h000.example.com/ref">$base</a>""")
    else Some(base)

  def lang(docId: Long, base: String): Option[String] =
    if (docId % 421 == 0) None
    else if (docId % 419 == 0) Some("x!")
    else if (docId % 443 == 0) Some("h002.example.com")
    else if (docId % 97 == 0) Some("zz")
    else if (docId % 45 >= 23 && docId % 7 < 3) Some("fr")
    else Some(base)

  /** Fixed-width machine-readable license value of the page's html. */
  def license(docId: Long): String = {
    val pid = if (docId % 131 == 7) docId - 7 else docId
    val hostId =
      if (pid % 100 < 40) 0L
      else if (pid % 100 < 65) 1L
      else if (pid % 100 < 80) 2L
      else if (pid % 100 < 90) 3L
      else (pid % 97) + 4
    graft.synth.PageSynth.LicenseValues((hostId % 4).toInt)
  }

  def page(docId: Long, baseText: String, baseLang: String): MPage = {
    val pid = if (docId % 131 == 7) docId - 7 else docId
    MPage(docId, url(docId), warcEpoch(docId), pday(docId),
      text(docId, baseText), lang(docId, baseLang), host(pid))
  }
}

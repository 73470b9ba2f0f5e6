package graft.functions

import java.time.{LocalDate, LocalDateTime, LocalTime, Year}

/** Lenient date/time parsing with the reference's semantics
  * (meza/convert.py:316-510): fuzzy multi-format parse, `dayfirst`,
  * impossible-day repair (day tokens 29–32 decremented until valid), and the
  * `9999-12-31` sentinel for unparseable input.
  *
  * Pure JVM code, usable on driver (type inference) and executors (inside the
  * Lenient* Catalyst expressions). No Spark imports.
  */
object DateParser {

  /** meza NULL_DATETIME (meza/__init__.py:33-35). */
  val NullDate: LocalDate = LocalDate.of(9999, 12, 31)
  val NullDateTime: LocalDateTime = LocalDateTime.of(9999, 12, 31, 0, 0, 0)

  /** Internal single-attempt outcome (mirrors convert.py:316-345 _to_datetime):
    * Parsed = ok; BadDay = structurally a date but impossible day (retry);
    * Invalid = not parseable (sentinel, no retry).
    */
  private sealed trait Attempt
  private final case class Parsed(date: Option[LocalDate], time: Option[LocalTime]) extends Attempt
  private case object BadDay extends Attempt
  private case object Invalid extends Attempt

  private val monthNames: Map[String, Int] = Map(
    "jan" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4, "may" -> 5, "jun" -> 6,
    "jul" -> 7, "aug" -> 8, "sep" -> 9, "oct" -> 10, "nov" -> 11, "dec" -> 12)

  // time with optional am/pm: "2:30", "2:00 pm", "14:00:00", "04:14:00"
  private val TimeRe = """(?i)(?<![\d:])(\d{1,2}):(\d{2})(?::(\d{2}))?(?:\s*(am|pm))?(?![\d:])""".r
  // bare hour + meridiem: "2pm"
  private val BareMeridiemRe = """(?i)(?<!\d)(\d{1,2})\s*(am|pm)\b""".r
  private val IsoRe = """(?<!\d)(\d{4})-(\d{1,2})-(\d{1,2})(?!\d)""".r
  private val SlashRe = """(?<![\d/])(\d{1,3})[/-](\d{1,3})[/-](\d{2,4})(?![\d/])""".r
  private val MonthNameRe =
    """(?i)\b([a-z]{3,9})\.?\s+(\d{1,2})(?:st|nd|rd|th)?\s*,?\s+(\d{2,4})""".r
  private val DayMonthNameRe = """(?i)(?<!\d)(\d{1,2})\s+([a-z]{3,9})\.?\s+(\d{2,4})""".r

  /** Two-digit-year pivot (dateutil convention: ±50y window on current year). */
  private def expandYear(y: Int): Int =
    if (y >= 100) y
    else {
      val cur = Year.now.getValue
      var full = y + (cur / 100) * 100
      if (full >= cur + 50) full -= 100
      if (full < cur - 50) full += 100
      full
    }

  private def mkTime(h: Int, m: Int, s: Int, meridiem: Option[String]): Option[LocalTime] = {
    val hh = meridiem.map(_.toLowerCase) match {
      case Some("pm") if h < 12 => h + 12
      case Some("am") if h == 12 => 0
      case _ => h
    }
    if (hh > 23 || m > 59 || s > 59) None else Some(LocalTime.of(hh, m, s))
  }

  /** One parse attempt of the full string (no repair). */
  private def attempt(raw: String, dayFirst: Boolean): Attempt = {
    if (raw == null) return Invalid
    var s = " " + raw.trim + " "
    if (s.trim.isEmpty) return Invalid

    var time: Option[LocalTime] = None
    var badTime = false

    TimeRe.findFirstMatchIn(s).foreach { m =>
      mkTime(m.group(1).toInt, m.group(2).toInt,
        Option(m.group(3)).map(_.toInt).getOrElse(0), Option(m.group(4))) match {
        case t @ Some(_) => time = t; s = s.substring(0, m.start) + " " + s.substring(m.end)
        case None => badTime = true
      }
    }
    if (time.isEmpty && !badTime) {
      BareMeridiemRe.findFirstMatchIn(s).foreach { m =>
        mkTime(m.group(1).toInt, 0, 0, Some(m.group(2))) match {
          case t @ Some(_) => time = t; s = s.substring(0, m.start) + " " + s.substring(m.end)
          case None => badTime = true
        }
      }
    }
    if (badTime) return Invalid

    var date: Option[LocalDate] = None
    var badDay = false

    def tryDate(y: Int, mo: Int, d: Int): Unit =
      if (mo < 1 || mo > 12) badDay = true // dateutil: month error is not retried,
      // but a swapped-field month overflow only arises from day repair paths
      else try { date = Some(LocalDate.of(y, mo, d)) }
      catch { case _: java.time.DateTimeException => badDay = true }

    IsoRe.findFirstMatchIn(s) match {
      case Some(m) =>
        val (mo, d) = (m.group(2).toInt, m.group(3).toInt)
        // dateutil applies dayfirst even to ISO when both slots are ambiguous
        if (dayFirst && d <= 12 && mo <= 12) tryDate(m.group(1).toInt, d, mo)
        else tryDate(m.group(1).toInt, mo, d)
        s = s.substring(0, m.start) + " " + s.substring(m.end)
      case None =>
        SlashRe.findFirstMatchIn(s) match {
          case Some(m) =>
            val (a, b) = (m.group(1).toInt, m.group(2).toInt)
            val y = expandYear(m.group(3).toInt)
            // dateutil: honor dayfirst, but swap when the nominal month is
            // impossible and the other slot fits (convert.py doctests).
            val (mo, d) =
              if (dayFirst) { if (b <= 12) (b, a) else if (a <= 12) (a, b) else (b, a) }
              else { if (a <= 12) (a, b) else if (b <= 12) (b, a) else (a, b) }
            tryDate(y, mo, d)
            s = s.substring(0, m.start) + " " + s.substring(m.end)
          case None =>
            MonthNameRe.findFirstMatchIn(s).flatMap { m =>
              monthNames.get(m.group(1).toLowerCase.take(3)).map((m, _))
            } match {
              case Some((m, mo)) =>
                tryDate(expandYear(m.group(3).toInt), mo, m.group(2).toInt)
                s = s.substring(0, m.start) + " " + s.substring(m.end)
              case None =>
                DayMonthNameRe.findFirstMatchIn(s).flatMap { m =>
                  monthNames.get(m.group(2).toLowerCase.take(3)).map((m, _))
                } match {
                  case Some((m, mo)) =>
                    tryDate(expandYear(m.group(3).toInt), mo, m.group(1).toInt)
                    s = s.substring(0, m.start) + " " + s.substring(m.end)
                  case None => ()
                }
            }
        }
    }

    if (badDay) return BadDay
    // dateutil with fuzzy=False rejects leftover tokens ("spam");
    // a bare ISO 'T' separator left between date and time is fine.
    val leftover = s.split("[^A-Za-z0-9]+").filter(_.nonEmpty)
    if (!leftover.forall(t => t == "T" || t == "t")) return Invalid
    if (date.isEmpty && time.isEmpty) Invalid else Parsed(date, time)
  }

  private val badNums = Seq("29", "30", "31", "32")
  private val goodNums = Seq("31", "30", "29", "28")

  /** Full lenient parse incl. impossible-day repair (convert.py:416-436):
    * first bad token 29–32 found as a substring is replaced by 31,30,29,28 in
    * turn until an attempt parses. Returns None only when nothing parses —
    * callers substitute the sentinel.
    */
  def parse(content: String, dayFirst: Boolean = false): Option[(Option[LocalDate], Option[LocalTime])] = {
    if (content == null) return None
    val options: Seq[String] = badNums.find(content.contains) match {
      case Some(bad) => content +: goodNums.map(content.replace(bad, _))
      case None => Seq(content)
    }
    options.iterator.map(attempt(_, dayFirst)).collectFirst {
      case Parsed(d, t) => Some((d, t))
      case Invalid => None // non-retry failure stops the chain (sentinel)
    }.getOrElse(None) // all attempts were BadDay
  }

  /** meza to_datetime: sentinel-defaulted datetime (convert.py:374-436). */
  def toDatetime(content: String, dayFirst: Boolean = false): LocalDateTime =
    parse(content, dayFirst) match {
      case Some((d, t)) =>
        LocalDateTime.of(d.getOrElse(NullDate), t.getOrElse(LocalTime.MIDNIGHT))
      case None => NullDateTime
    }

  /** meza to_date (convert.py:439-475). */
  def toDate(content: String, dayFirst: Boolean = false): LocalDate =
    toDatetime(content, dayFirst).toLocalDate

  /** meza to_time (convert.py:478-510); canonical HH:mm:ss string (SURVEY §1.2). */
  def toTime(content: String): LocalTime = toDatetime(content).toLocalTime

  // ---- inference predicates (meza/typetools.py:174-279) -------------------

  /** has a date component with a real (non-sentinel) year. */
  def isDate(content: String): Boolean =
    parse(content) match {
      case Some((Some(_), _)) => true
      case _ => false
    }

  /** reference checks for literal time markers (typetools.py:214-247). */
  def isTime(content: String): Boolean =
    content != null && Seq(":", "T", "+", "am", "pm").exists(content.contains)

  def isDatetime(content: String): Boolean = isDate(content) && isTime(content)
}

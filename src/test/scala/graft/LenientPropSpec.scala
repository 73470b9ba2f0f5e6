package graft

import java.time.LocalDate

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.DateParser

/** Property tests for the lenient datetime parser (SURVEY §5 uplift):
  * round-trips, sentinel behavior, repair invariants. Pure driver-side code
  * (no Spark session); the Column forms are covered by LenientSpec goldens.
  */
object LenientPropSpec extends Properties("DateParser") {

  private val dates: Gen[LocalDate] = for {
    y <- Gen.choose(1930, 2069)
    m <- Gen.choose(1, 12)
    d <- Gen.choose(1, 28)
  } yield LocalDate.of(y, m, d)

  property("ISO date strings round-trip exactly") = forAll(dates) { d =>
    DateParser.toDate(d.toString) == d
  }

  property("US slash dates round-trip; dayfirst swaps") = forAll(dates) { d =>
    val us = s"${d.getMonthValue}/${d.getDayOfMonth}/${d.getYear}"
    val intl = s"${d.getDayOfMonth}/${d.getMonthValue}/${d.getYear}"
    DateParser.toDate(us) == d && DateParser.toDate(intl, dayFirst = true) == d
  }

  property("datetime with time component round-trips") =
    forAll(dates, Gen.choose(0, 23), Gen.choose(0, 59)) { (d, h, m) =>
      val s = f"${d.toString} $h%02d:$m%02d:00"
      val got = DateParser.toDatetime(s)
      got.toLocalDate == d && got.getHour == h && got.getMinute == m
    }

  property("letter-only garbage yields the sentinel, never throws") =
    forAll(Gen.alphaStr.suchThat(_.nonEmpty)) { s =>
      DateParser.toDatetime(s) == DateParser.NullDateTime
    }

  private val badTokens = Seq("29", "30", "31", "32")

  property("impossible days 29-32 repair downward within the month") =
    forAll(
      Gen.choose(1930, 2069).suchThat(y => !badTokens.exists(y.toString.contains)),
      Gen.choose(1, 12), Gen.choose(29, 31)) { (y, m, d) =>
      // years containing a bad token are excluded: the reference's repair
      // replaces ALL occurrences and mutates the year (parity goldens in
      // DateParserSpec pin '2/30/1930' -> 1928-02-28)
      val parsed = DateParser.toDate(s"$m/$d/$y")
      parsed.getYear == y && parsed.getMonthValue == m && parsed.getDayOfMonth <= d
    }

  property("dayfirst never changes an unambiguous date (day > 12)") =
    forAll(Gen.choose(1930, 2069), Gen.choose(1, 12), Gen.choose(13, 28)) { (y, m, d) =>
      val s = s"$d/$m/$y"
      DateParser.toDate(s) == DateParser.toDate(s, dayFirst = true)
    }

  property("toTime equals the time component of toDatetime") =
    forAll(Gen.choose(0, 23), Gen.choose(0, 59)) { (h, m) =>
      val t = DateParser.toTime(f"$h%02d:$m%02d")
      t.getHour == h && t.getMinute == m
    }
}

package graft

import java.time.LocalDateTime
import graft.streaming.{BadCronExpression, Cron}

/**
 * Cron battery port — libminifi/test/unit/CronTests.cpp (ctor validation,
 * numeric/name weekday equivalence, and the calculateNextTrigger vector
 * table including the Quartz L/LW/#/W specials).
 */
class CronSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def at(y: Int, mo: Int, d: Int, h: Int = 0, mi: Int = 0,
                 s: Int = 0): LocalDateTime =
    LocalDateTime.of(y, mo, d, h, mi, s)

  private def checkNext(expr: String, from: LocalDateTime,
                        expected: LocalDateTime): Unit = {
    assert(Cron(expr).calculateNextTrigger(from) === Some(expected),
      s"$expr from $from")
  }

  test("ctor validation: field counts, bounds, garbage, specials per " +
       "field position (CronTests.cpp:37-124)") {
    def bad(e: String): Unit =
      intercept[BadCronExpression](Cron(e))
    def ok(e: String): Unit = Cron(e)

    bad("1600 ms"); bad("foo")
    bad("61 0 0 * * *"); bad("0 61 0 * * *"); bad("0 0 24 * * *")
    bad("0 0 0 32 * *")
    bad("1banana * * * * * *"); bad("* 1banana * * * * *")
    bad("* * 1banana * * * *"); bad("* * * 1banana * * *")
    bad("* * * * 1banana * *"); bad("* * * * DECbanana * *")
    bad("* * * * * WEDbanana *")
    bad("* * * * * * 1banana"); bad("* * * * * * 2000banana")
    bad("1G * * * * * *"); bad("* * * * * 1G *"); bad("* * * * * * 1G")
    // 6 or 7 fields only
    bad("* * * * *"); ok("* * * * * *"); ok("* * * * * * *")
    bad("* * * * * * * *")
    // LW only in the day field
    bad("LW * * * * * *"); bad("* * LW * * * *"); ok("* * * LW * * *")
    bad("* * * * LW * *"); bad("* * * * * LW *"); bad("* * * * * * LW")
    // x#n only in the weekday field
    bad("2#1 * * * * * *"); bad("* * * 2#1 * * *"); ok("* * * * * 2#1 *")
    bad("* * * * * * 2#1")
    // L only in day / weekday fields
    bad("L * * * * * *"); ok("* * * L * * *"); bad("* * * * L * *")
    ok("* * * * * L *"); bad("* * * * * * L")
    // the Quartz documentation examples all parse
    Seq("0 0 12 * * ?", "0 15 10 ? * *", "0 15 10 * * ?",
      "0 15 10 * * ? *", "0 15 10 * * ? 2005", "0 * 14 * * ?",
      "0 0/5 14 * * ?", "0 0/5 14,18 * * ?", "0 0-5 14 * * ?",
      "0 10,44 14 ? 3 WED", "0 15 10 ? * MON-FRI", "0 15 10 15 * ?",
      "0 15 10 L * ?", "0 15 10 L-2 * ?", "0 15 10 ? * 6L",
      "0 15 10 ? * 6L 2002-2005", "0 15 10 ? * 6#3", "0 0 12 1/5 * ?",
      "0 11 11 11 11 ?").foreach(ok)
    bad("0 15 10 L-32 * ?")
    // inverted ranges reject; weekday ranges compare in the C encoding,
    // so MON-SUN (1-0) rejects while SUN-MON (0-1) parses
    bad("15-10 * * * * * *"); bad("* 4-3 * * * * *")
    bad("* * * 31-29 * * *")
    bad("0 0 0 ? * MON-SUN"); ok("0 0 0 ? * SUN-MON")
    // month and weekday names, any case (CronTests.cpp:127-130)
    ok("* * * * Jan,fEb,MAR,Apr,May,jun,Jul,Aug,Sep,Oct,Nov,Dec * *")
    ok("* * * * * Mon,tUe,WeD,Thu,Fri,SAT,Sun *")
  }

  test("weekday names equal their numbers, 0 and 7 both Sunday " +
       "(CronTests.cpp:132-158)") {
    val byName = Seq("SUN", "MON", "TUE", "WED", "THU", "FRI", "SAT")
      .map(n => Cron(s"* * * * * $n").dayOfWeek)
    (0 to 6).foreach(i =>
      assert(Cron(s"* * * * * $i").dayOfWeek === byName(i)))
    assert(Cron("* * * * * 7").dayOfWeek === byName(0)) // 7 wraps to Sunday
  }

  test("calculateNextTrigger vector table: increments, ranges, rollovers, " +
       "leap years, weekday windows (CronTests.cpp:160-448)") {
    checkNext("0/15 * 1-4 * * ?", at(2012, 7, 1, 9, 53, 50), at(2012, 7, 2, 1))
    checkNext("0/15 * 1-4 * * ? *", at(2012, 7, 1, 9, 53, 50), at(2012, 7, 2, 1))
    checkNext("*/15 * 1-4 * * ?", at(2012, 7, 1, 9, 53, 50), at(2012, 7, 2, 1))
    checkNext("0 0/2 1-4 * * ?", at(2012, 7, 1, 9), at(2012, 7, 2, 1))
    checkNext("* * * * * ?", at(2012, 7, 1, 9), at(2012, 7, 1, 9, 0, 1))
    checkNext("* * * * * ?", at(2012, 12, 1, 9, 0, 58), at(2012, 12, 1, 9, 0, 59))
    checkNext("10 * * * * ?", at(2012, 12, 1, 9, 42, 9), at(2012, 12, 1, 9, 42, 10))
    checkNext("10 * * * * ?", at(2012, 12, 1, 9, 42, 10), at(2012, 12, 1, 9, 43, 10))
    checkNext("10-15 * * * * ?", at(2012, 12, 1, 21, 42, 14), at(2012, 12, 1, 21, 42, 15))
    checkNext("0 * * * * ?", at(2012, 12, 1, 21, 10, 42), at(2012, 12, 1, 21, 11))
    checkNext("0 10 * * * ?", at(2012, 12, 1, 21, 11), at(2012, 12, 1, 22, 10))
    checkNext("0 0 * * * ?", at(2012, 9, 10, 23, 1), at(2012, 9, 11))
    checkNext("0 0 0 * * ?", at(2012, 9, 1, 14, 42, 43), at(2012, 9, 2))
    checkNext("* * * 10 * ?", at(2012, 10, 9, 15, 12, 42), at(2012, 10, 10))
    checkNext("* * * 10 * ?", at(2012, 10, 11, 15, 12, 42), at(2012, 11, 10))
    checkNext("0 0 0 * * ? 2020", at(2012, 9, 30, 15, 12, 42), at(2020, 1, 1))
    checkNext("0 0 0 * * ?", at(2012, 9, 30, 15, 12, 42), at(2012, 10, 1))
    checkNext("0 0 0 * * ?", at(2012, 8, 30, 15, 12, 42), at(2012, 8, 31))
    checkNext("0 0 0 * * ?", at(2012, 8, 31), at(2012, 9, 1))
    checkNext("0 0 0 1 * ?", at(2012, 10, 30, 15, 12, 42), at(2012, 11, 1))
    checkNext("0 0 0 1 * ?", at(2010, 12, 31, 15, 12, 42), at(2011, 1, 1))
    checkNext("0 0 0 31 * ?", at(2011, 10, 30, 15, 12, 42), at(2011, 10, 31))
    // weekday 1 = Monday; 2010-10-25 is a Monday
    checkNext("* * * ? * 1", at(2010, 10, 25, 15, 12, 42), at(2010, 10, 25, 15, 12, 43))
    checkNext("* * * ? * 1", at(2010, 10, 20, 15, 12, 42), at(2010, 10, 25))
    checkNext("* * * ? * 1", at(2010, 10, 27, 15, 12, 42), at(2010, 11, 1))
    checkNext("55 5 * * * ?", at(2010, 10, 27, 15, 4, 54), at(2010, 10, 27, 15, 5, 55))
    checkNext("55 5 * * * ?", at(2010, 10, 27, 15, 5, 55), at(2010, 10, 27, 16, 5, 55))
    checkNext("55 * 10 * * ?", at(2010, 10, 27, 9, 4, 54), at(2010, 10, 27, 10, 0, 55))
    checkNext("* 5 10 * * ?", at(2010, 10, 27, 9, 4, 55), at(2010, 10, 27, 10, 5))
    checkNext("55 * * 3 * ?", at(2010, 10, 2, 10, 5, 54), at(2010, 10, 3, 0, 0, 55))
    checkNext("* * * 3 11 ?", at(2010, 10, 2, 14, 42, 55), at(2010, 11, 3))
    // leap-day schedule only fires on leap years
    checkNext("0 0 0 29 2 ?", at(2007, 2, 10, 14, 42, 55), at(2008, 2, 29))
    checkNext("0 0 0 29 2 ?", at(2008, 2, 29), at(2012, 2, 29))
    checkNext("0 0 7 ? * Mon-Fri", at(2009, 9, 26, 0, 42, 55), at(2009, 9, 28, 7))
    checkNext("0 0 7 ? * Mon,Tue,Wed,Thu,Fri", at(2009, 9, 28, 7), at(2009, 9, 29, 7))
    // month increment 1/3 = Jan, Apr, Jul, Oct
    checkNext("0 30 23 30 1/3 ?", at(2010, 12, 30), at(2011, 1, 30, 23, 30))
    checkNext("0 30 23 30 1/3 ?", at(2011, 1, 30, 23, 30), at(2011, 4, 30, 23, 30))
    // LW: last weekday of month (2022-02-28 Mon; 2024-02-29 Thu;
    // 2027 Feb ends Sunday -> skips to March 31)
    checkNext("0 0 0 LW * ? *", at(2022, 2, 27, 2), at(2022, 2, 28))
    checkNext("0 0 0 LW * ? *", at(2024, 2, 27, 2), at(2024, 2, 29))
    checkNext("0 0 0 LW * ? *", at(2027, 2, 27, 2), at(2027, 3, 31))
    // 2#n: nth Tuesday
    checkNext("0 0 0 ? * 2#1 *", at(2022, 5, 4), at(2022, 6, 7))
    checkNext("0 0 0 ? * 2#2 *", at(2022, 5, 4), at(2022, 5, 10))
    checkNext("0 0 0 ? * 2#5 *", at(2022, 5, 4), at(2022, 5, 31))
    // L in the day field: last day of month (incl. leap Feb)
    checkNext("0 0 0 L * ? *", at(2022, 1, 4), at(2022, 1, 31))
    checkNext("0 0 0 L * ? *", at(2022, 2, 4), at(2022, 2, 28))
    checkNext("0 0 0 L * ? *", at(2024, 2, 4), at(2024, 2, 29))
    checkNext("0 0 0 L * ? *", at(2022, 5, 31), at(2022, 6, 30))
    // L in the weekday field: Saturday
    checkNext("0 0 0 ? * L *", at(2022, 1, 7), at(2022, 1, 8))
    checkNext("0 0 0 ? * L *", at(2024, 2, 4), at(2024, 2, 10))
    checkNext("0 0 0 ? * L *", at(2022, 5, 28), at(2022, 6, 4))
    // nW: closest weekday to day n
    checkNext("0 0 0 1W * ? *", at(2022, 5, 1), at(2022, 5, 2))
    checkNext("0 0 0 4W * ? *", at(2022, 5, 1), at(2022, 5, 4))
    checkNext("0 0 0 14W * ? *", at(2022, 5, 1), at(2022, 5, 13))
    checkNext("0 0 0 15W * ? *", at(2022, 5, 1), at(2022, 5, 16))
    checkNext("0 0 0 31W * ? *", at(2022, 2, 1), at(2022, 3, 31))
    checkNext("0 0 0 1W * ? *", at(2021, 12, 15), at(2022, 1, 3))
    checkNext("0 0 0 31W * ? *", at(2022, 7, 15), at(2022, 7, 29))
    // 5L: last Friday
    checkNext("0 15 10 ? * 5L", at(2022, 7, 15), at(2022, 7, 29, 10, 15))
    // L-n: n days before the last day (L-30 in January -> 1st, but the
    // trigger lands in the NEXT month whose length admits it)
    checkNext("0 0 0 L-3 * ?", at(2022, 1, 10), at(2022, 1, 28))
    checkNext("0 0 0 L-30 * ?", at(2022, 1, 10), at(2022, 3, 1))
  }
}

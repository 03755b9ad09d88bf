package graft.el

import java.time.LocalDate

/**
 * The EL toDate PARSE side: a faithful replay of Howard-Hinnant date
 * v3.0.4 `from_stream` — the reference's vendored parser
 * (cmake/Date.cmake:21; date.h:6566-7902 `from_stream(fields<Duration>&)`,
 * :8015-8033 the `sys_time` overload) — plus
 * `utils::timeutils::parseRfc3339` (core-framework/common/src/utils/
 * TimeUtil.cpp:85-115) and `expr_toDate`'s stream-state contract
 * (Expression.cpp:649-672).
 *
 * Why a hand parser and not a JVM DateTimeFormatter pattern: the
 * divergences are input-dependent, so no pattern translation can replay
 * them —
 *  - numeric fields read 1..N digits (`ru{x, 1, 2}`), so "2024-1-2 3:4:5"
 *    parses where a strict JVM "MM"/"dd"/"HH" pattern rejects;
 *  - a space in the format matches ZERO OR MORE whitespace
 *    (date.h:7633-7638 `ws(is)`), where a JVM literal space matches one;
 *  - %y carries the POSIX pivot (y >= 69 → 19xx, date.h:7664-7676), where
 *    the JVM's reduced-value default is 2000-2099 ("69" → 1969 vs 2069);
 *  - an INVALID %E/%O-modified command matches the literal "%<mod><cmd>"
 *    text in the INPUT (`read(is, '%', width, modified, *fmt)`), the
 *    read-side mirror of the r19 format-side literal-passthrough table;
 *  - a time-only format fails (the sys_time overload requires
 *    `fds.ymd.ok()`, date.h:8027) where Spark defaults the date to
 *    1970-01-01; a date-only format succeeds (`fds.has_tod` is preset);
 *  - trailing junk throws (→ null here) EXCEPT a NUL: expr_toDate's check
 *    is `peek() && !eof()`, and peek() == '\0' is falsy — everything at
 *    and after a NUL is ignored (Expression.cpp:665-666).
 *
 * Facet-routed commands (%a %A %b %B %h %c %x %X %r %p and the VALID
 * %E/%O combos) go to `std::time_get` of the global locale — the C locale
 * at minifi runtime, whose alternate-era/digit tables are empty — so they
 * are replayed as their C-locale expansions (%c = "%a %b %e %H:%M:%S %Y",
 * %x = "%m/%d/%y", %X/%r whole-second) with date.h's own `scan_keyword`
 * name matching (date.h:4937-5036: case-insensitive longest-match over
 * full-then-abbreviated English names; a consumed prefix that dead-ends a
 * longer name FAILS, it does not fall back to the shorter match).
 * Valid-modified numeric commands render like their unmodified forms
 * (empty C-locale era/alt-digit tables), the same approximation the
 * format side pinned in r19; %OS is the facet WHOLE-second read where
 * native %S consumes an optional fraction at millisecond precision
 * (`rld{S, 1, 6}`, rounded half-even per `round_i`).
 */
object ElFromStream {

  // C isspace set (the "C" locale — the stream's imbued locale)
  private final val WS = " \t\n\u000B\f\r"

  /** istringstream replay: pos + failbit + eofbit (peek at end sets
    * eofbit, the detail reads and the trailing-command check key on it). */
  private final class S(val in: String) {
    var pos = 0
    var fail = false
    var eofbit = false
    def eof: Boolean = pos >= in.length
    def peek: Int = if (eof) { eofbit = true; -1 } else in.charAt(pos).toInt
    def good: Boolean = !fail && !eofbit
    /** the `ws` manipulator: consume 0+ whitespace */
    def ws(): Unit = {
      while (!eof && WS.indexOf(in.charAt(pos)) >= 0) pos += 1
      if (eof) eofbit = true
    }
  }

  // --- detail::read helpers (date.h:6306-6419) ---

  /** read_unsigned: m..M digits, raw (no ws skip); count < m → failbit. */
  private def readUnsigned(s: S, m: Int, M: Int): Long = {
    var x = 0L; var count = 0; var stop = false
    while (!stop) {
      val ic = s.peek
      if (ic < '0' || ic > '9') stop = true
      else {
        s.pos += 1; count += 1
        // date.h accumulates in unsigned int; values past any field's
        // validity are rejected by the range/ok() checks downstream, so a
        // saturating accumulate preserves behavior without the wrap
        if (x < Long.MaxValue / 16) x = 10 * x + (ic - '0')
        if (count == M) stop = true
      }
    }
    if (count < m) s.fail = true
    x
  }

  /** read_signed: optional +/- then read_unsigned(max(m,1), M). */
  private def readSigned(s: S, m: Int, M: Int): Long = {
    val ic = s.peek
    if (ic >= 0 && ((ic >= '0' && ic <= '9') || ic == '-' || ic == '+')) {
      val neg = ic == '-'
      if (ic == '-' || ic == '+') s.pos += 1
      val x = readUnsigned(s, math.max(m, 1), M)
      if (!s.fail) return if (neg) -x else x
    }
    if (m > 0) s.fail = true
    0L
  }

  /** read_long_double's digit walk, kept EXACT: returns (intPart,
    * fracDigits); total consumed chars (incl. one '.') capped at M. */
  private def readDecimalSeconds(s: S, m: Int, M: Int): (Long, String) = {
    var count = 0; var sec = 0L; var seenPoint = false; var stop = false
    val frac = new StringBuilder
    while (!stop) {
      val ic = s.peek
      if (ic < 0) stop = true
      else if (!seenPoint && ic == '.') {
        seenPoint = true; s.pos += 1; count += 1
        if (count == M) stop = true
      } else if (ic >= '0' && ic <= '9') {
        if (!seenPoint) { if (sec < Long.MaxValue / 16) sec = 10 * sec + (ic - '0') }
        else frac.append(ic.toChar)
        s.pos += 1; count += 1
        if (count == M) stop = true
      } else stop = true
    }
    if (count < m) { s.fail = true; (0L, "") } else (sec, frac.toString)
  }

  /** read(is, CharT): literal char; eof → failbit|eofbit. */
  private def matchChar(s: S, c: Char): Unit = {
    if (s.fail) return
    val ic = s.peek
    if (ic < 0) { s.fail = true; s.eofbit = true }
    else if (ic != c) s.fail = true
    else s.pos += 1
  }

  /** read(is, '%', width, modified, cmd): the literal-text match an
    * invalid modified / unknown command performs against the INPUT. */
  private def matchLiteralCmd(s: S, width: Int, modified: Char, cmd: Char): Unit = {
    matchChar(s, '%')
    if (width != -1) width.toString.foreach(ch => matchChar(s, ch))
    if (modified != 0) matchChar(s, modified)
    if (cmd != 0) matchChar(s, cmd)
  }

  /** scan_keyword (date.h:4937-5036): case-insensitive keyword scan;
    * consumes while any candidate matches; a does_match shorter keyword is
    * DEMOTED once a longer candidate consumes past it. Returns the index
    * of the first fully-matched keyword, or -1 (failbit). */
  private def scanKeyword(s: S, kws: IndexedSeq[String]): Int = {
    val DOESNT = 0; val MIGHT = 1; val DOES = 2
    val status = Array.fill(kws.length)(MIGHT)
    var nMight = kws.length; var nDoes = 0
    var indx = 0; var stop = false
    while (!stop && nMight > 0) {
      val ic = s.peek
      if (ic < 0) { s.eofbit = true; stop = true }
      else {
        val c = Character.toUpperCase(ic.toChar)
        var consume = false
        var k = 0
        while (k < kws.length) {
          if (status(k) == MIGHT) {
            if (indx < kws(k).length &&
                Character.toUpperCase(kws(k).charAt(indx)) == c) {
              consume = true
              if (kws(k).length == indx + 1) { status(k) = DOES; nMight -= 1; nDoes += 1 }
            } else { status(k) = DOESNT; nMight -= 1 }
          }
          k += 1
        }
        if (consume) {
          s.pos += 1
          if (nMight + nDoes > 1) {
            var k2 = 0
            while (k2 < kws.length) {
              if (status(k2) == DOES && kws(k2).length != indx + 1) {
                status(k2) = DOESNT; nDoes -= 1
              }
              k2 += 1
            }
          }
          indx += 1
        } else stop = true
      }
    }
    val hit = status.indexOf(DOES)
    if (hit < 0) s.fail = true
    hit
  }

  private val WeekdayNames: IndexedSeq[String] = IndexedSeq(
    "Sunday", "Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
    "Saturday", "Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat")
  private val MonthNames: IndexedSeq[String] = IndexedSeq(
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December",
    "Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep",
    "Oct", "Nov", "Dec")
  private val AmPm: IndexedSeq[String] = IndexedSeq("AM", "PM")

  // --- rounding (round_i = std::chrono::round, half-even) ---

  private def pow10(k: Int): Long = { var r = 1L; var i = 0; while (i < k) { r *= 10; i += 1 }; r }

  /** Round a decimal fraction (digit string) to k digits, half-even.
    * Returns (carry, kDigitValue). */
  private def fracRound(frac: String, k: Int): (Long, Long) = {
    if (frac.length <= k) (0L, if (frac.isEmpty) 0L else frac.padTo(k, '0').toLong)
    else {
      val head = frac.substring(0, k).toLong
      val rest = frac.substring(k)
      val up = {
        val h = rest.charAt(0)
        if (h > '5') true
        else if (h < '5') false
        else if (rest.drop(1).exists(_ != '0')) true
        else (head % 2) == 1
      }
      val r = head + (if (up) 1L else 0L)
      if (r == pow10(k)) (1L, 0L) else (0L, r)
    }
  }

  /** round_i<milliseconds>(duration<long double>{S}) with S kept exact. */
  private def secsToMsHalfEven(sec: Long, frac: String): Long = {
    val (carry, ms3) = fracRound(frac, 3)
    (sec + carry) * 1000 + ms3
  }

  // --- field state + resolution (date.h:6608-6694, 7656-7899) ---

  private val NAY = Int.MinValue // not_a_year (short::min in date.h; any sentinel below year range)
  private val NA2 = 100          // not_a_2digit_year
  private val NAC = NAY / 100    // not_a_century
  private val NAM = 0            // not_a_month / not_a_day share 0
  private val NAH = Int.MinValue // not_a_hour / not_a_minute
  private val NASMS = Long.MinValue // not_a_second (ms)
  private val NADOY = -1
  private val NAWD = 8
  private val NAWK = 100
  private val NAAP = -1
  private val NAOFF = Int.MinValue // not_a_offset (minutes)

  private final class Fields {
    var Y = NAY; var y = NA2; var g = NA2; var G = NAY; var C = NAC
    var m = NAM; var d = NAM; var j = NADOY; var wd = NAWD
    var H = NAH; var I = 0; var p = NAAP; var M = NAH
    var sMs = NASMS
    var U = NAWK; var V = NAWK; var W = NAWK
    var offMin = NAOFF
  }

  private def checkedSet(s: S, cur: Int, from: Int, na: Int): Int =
    if (s.fail) cur
    else if (cur == na) from
    else { if (cur != from) s.fail = true; cur }

  private def checkedSetL(s: S, cur: Long, from: Long, na: Long): Long =
    if (s.fail) cur
    else if (cur == na) from
    else { if (cur != from) s.fail = true; cur }

  // --- the command loop ---

  /** Replay from_stream's format walk over `in`; mutates f and s. */
  private def runFormat(s: S, fmt: String, f: Fields): Unit = {
    var command = false
    var modified: Char = 0
    var width = -1
    def clear(): Unit = { command = false; width = -1; modified = 0 }
    def w(default: Int): Int = if (width == -1) default else width
    def literal(cmd: Char): Unit = { matchLiteralCmd(s, width, modified, cmd); clear() }

    var i = 0
    while (i < fmt.length && !s.fail) {
      val c = fmt.charAt(i)
      c match {
        case 'a' | 'A' =>
          if (command) {
            if (modified == 0) {
              val k = scanKeyword(s, WeekdayNames)
              if (!s.fail) f.wd = checkedSet(s, f.wd, k % 7, NAWD)
              clear()
            } else literal(c)
          } else matchChar(s, c)
        case 'u' | 'w' =>
          if (command) {
            if (modified == 0 || modified == 'O') {
              var t = readUnsigned(s, 1, w(1)).toInt
              if (!s.fail) {
                if (c == 'u') {
                  if (t < 1 || t > 7) s.fail = true else if (t == 7) t = 0
                } else if (t < 0 || t > 6) s.fail = true
              }
              if (!s.fail) f.wd = checkedSet(s, f.wd, t, NAWD)
              clear()
            } else literal(c)
          } else matchChar(s, c)
        case 'b' | 'B' | 'h' =>
          if (command) {
            if (modified == 0) {
              val k = scanKeyword(s, MonthNames)
              if (!s.fail) f.m = checkedSet(s, f.m, k % 12 + 1, NAM)
              clear()
            } else literal(c)
          } else matchChar(s, c)
        case 'c' =>
          if (command) {
            if (modified != 'O') {
              // C-locale D_T_FMT "%a %b %e %H:%M:%S %Y", whole seconds
              val k = scanKeyword(s, WeekdayNames)
              if (!s.fail) f.wd = checkedSet(s, f.wd, k % 7, NAWD)
              s.ws()
              val km = scanKeyword(s, MonthNames)
              if (!s.fail) f.m = checkedSet(s, f.m, km % 12 + 1, NAM)
              s.ws()
              val td = readSigned(s, 1, 2).toInt
              if (!s.fail) f.d = checkedSet(s, f.d, td, NAM)
              s.ws()
              val tH = readUnsigned(s, 1, 2).toInt
              matchChar(s, ':')
              val tM = readUnsigned(s, 1, 2).toInt
              matchChar(s, ':')
              val tS = readUnsigned(s, 1, 2)
              if (!s.fail) {
                f.H = checkedSet(s, f.H, tH, NAH)
                f.M = checkedSet(s, f.M, tM, NAH)
                f.sMs = checkedSetL(s, f.sMs, tS * 1000, NASMS)
              }
              s.ws()
              val tY = readSigned(s, 1, 4).toInt
              if (!s.fail) f.Y = checkedSet(s, f.Y, tY, NAY)
              clear()
            } else literal(c)
          } else matchChar(s, c)
        case 'x' =>
          if (command) {
            if (modified != 'O') {
              // C-locale D_FMT "%m/%d/%y"
              val tm = readUnsigned(s, 1, 2).toInt
              matchChar(s, '/')
              val td = readUnsigned(s, 1, 2).toInt
              matchChar(s, '/')
              val ty = readSigned(s, 1, 2).toInt
              if (!s.fail) {
                f.y = checkedSet(s, f.y, ty, NA2)
                f.m = checkedSet(s, f.m, tm, NAM)
                f.d = checkedSet(s, f.d, td, NAM)
              }
              clear()
            } else literal(c)
          } else matchChar(s, c)
        case 'X' =>
          if (command) {
            if (modified != 'O') {
              // C-locale T_FMT "%H:%M:%S", whole seconds (facet tm)
              val tH = readUnsigned(s, 1, 2).toInt
              matchChar(s, ':')
              val tM = readUnsigned(s, 1, 2).toInt
              matchChar(s, ':')
              val tS = readUnsigned(s, 1, 2)
              if (!s.fail) {
                f.H = checkedSet(s, f.H, tH, NAH)
                f.M = checkedSet(s, f.M, tM, NAH)
                f.sMs = checkedSetL(s, f.sMs, tS * 1000, NASMS)
              }
              clear()
            } else literal(c)
          } else matchChar(s, c)
        case 'C' =>
          if (command) {
            // %EC/%OC route to the facet whose C-locale era table is
            // empty — same digits as the unmodified read
            val t = readSigned(s, 1, w(2)).toInt
            if (!s.fail) f.C = checkedSet(s, f.C, t, NAC)
            clear()
          } else matchChar(s, c)
        case 'D' =>
          if (command) {
            if (modified == 0) {
              val tm = readUnsigned(s, 1, 2).toInt
              matchChar(s, '/')
              val td = readUnsigned(s, 1, 2).toInt
              matchChar(s, '/')
              val ty = readSigned(s, 1, 2).toInt
              if (!s.fail) {
                f.y = checkedSet(s, f.y, ty, NA2)
                f.m = checkedSet(s, f.m, tm, NAM)
                f.d = checkedSet(s, f.d, td, NAM)
              }
              clear()
            } else literal(c)
          } else matchChar(s, c)
        case 'F' =>
          if (command) {
            if (modified == 0) {
              val tY = readSigned(s, 1, w(4)).toInt
              matchChar(s, '-')
              val tm = readUnsigned(s, 1, 2).toInt
              matchChar(s, '-')
              val td = readUnsigned(s, 1, 2).toInt
              if (!s.fail) {
                f.Y = checkedSet(s, f.Y, tY, NAY)
                f.m = checkedSet(s, f.m, tm, NAM)
                f.d = checkedSet(s, f.d, td, NAM)
              }
              clear()
            } else literal(c)
          } else matchChar(s, c)
        case 'd' | 'e' =>
          if (command) {
            if (modified == 0 || modified == 'O') {
              // unmodified is rs (a sign is consumed!, date.h:6999);
              // ymd.ok() rejects the negative day downstream
              val t = (if (modified == 0) readSigned(s, 1, w(2))
                       else readUnsigned(s, 1, w(2))).toInt
              if (!s.fail) f.d = checkedSet(s, f.d, t, NAM)
              clear()
            } else literal(c)
          } else matchChar(s, c)
        case 'H' =>
          if (command) {
            if (modified == 0 || modified == 'O') {
              val t = readUnsigned(s, 1, w(2)).toInt
              if (!s.fail) f.H = checkedSet(s, f.H, t, NAH)
              clear()
            } else literal(c)
          } else matchChar(s, c)
        case 'I' =>
          if (command) {
            if (modified == 0) {
              val t = readSigned(s, 1, w(2)).toInt
              if (!s.fail && !(t >= 1 && t <= 12)) s.fail = true
              if (!s.fail) f.I = checkedSet(s, f.I, t, 0)
              clear()
            } else literal(c)
          } else matchChar(s, c)
        case 'j' =>
          if (command) {
            if (modified == 0) {
              val t = readUnsigned(s, 1, w(3)).toInt
              if (!s.fail) f.j = checkedSet(s, f.j, t, NADOY)
              clear()
            } else literal(c)
          } else matchChar(s, c)
        case 'M' =>
          if (command) {
            if (modified == 0 || modified == 'O') {
              val t = readUnsigned(s, 1, w(2)).toInt
              if (!s.fail) f.M = checkedSet(s, f.M, t, NAH)
              clear()
            } else literal(c)
          } else matchChar(s, c)
        case 'm' =>
          if (command) {
            if (modified == 0 || modified == 'O') {
              val t = (if (modified == 0) readSigned(s, 1, w(2))
                       else readUnsigned(s, 1, w(2))).toInt
              if (!s.fail) f.m = checkedSet(s, f.m, t, NAM)
              clear()
            } else literal(c)
          } else matchChar(s, c)
        case 'n' | 't' =>
          if (command) {
            if (modified == 0) {
              // %n = exactly one whitespace; %t = zero or one
              val ic = s.peek
              if (ic < 0) {
                s.eofbit = true
                if (c == 'n') s.fail = true
              } else if (WS.indexOf(ic.toChar) >= 0) s.pos += 1
              else if (c == 'n') s.fail = true
              clear()
            } else literal(c)
          } else matchChar(s, c)
        case 'p' =>
          if (command) {
            if (modified == 0) {
              val k = scanKeyword(s, AmPm)
              if (!s.fail) f.p = checkedSet(s, f.p, k, NAAP)
              clear()
            } else literal(c)
          } else matchChar(s, c)
        case 'r' =>
          if (command) {
            if (modified == 0) {
              // C-locale T_FMT_AMPM "%I:%M:%S %p", whole seconds; the
              // facet hands back a combined tm_hour
              val tI = readUnsigned(s, 1, 2).toInt
              if (!s.fail && !(tI >= 1 && tI <= 12)) s.fail = true
              matchChar(s, ':')
              val tM = readUnsigned(s, 1, 2).toInt
              matchChar(s, ':')
              val tS = readUnsigned(s, 1, 2)
              s.ws()
              val k = scanKeyword(s, AmPm)
              if (!s.fail) {
                val hh = if (k == 0) { if (tI == 12) 0 else tI }
                         else { if (tI == 12) 12 else tI + 12 }
                f.H = checkedSet(s, f.H, hh, NAH)
                f.M = checkedSet(s, f.M, tM, NAH)
                f.sMs = checkedSetL(s, f.sMs, tS * 1000, NASMS)
              }
              clear()
            } else literal(c)
          } else matchChar(s, c)
        case 'R' =>
          if (command) {
            if (modified == 0) {
              val tH = readUnsigned(s, 1, 2).toInt
              matchChar(s, ':')
              val tM = readUnsigned(s, 1, 2).toInt
              if (!s.fail) {
                f.H = checkedSet(s, f.H, tH, NAH)
                f.M = checkedSet(s, f.M, tM, NAH)
              }
              clear()
            } else literal(c)
          } else matchChar(s, c)
        case 'S' =>
          if (command) {
            if (modified == 0) {
              // ms-precision Duration: up to 2+1+3 = 6 chars, optional
              // fraction, round half-even (date.h:7266-7272)
              val (sec, frac) = readDecimalSeconds(s, 1, w(6))
              if (!s.fail)
                f.sMs = checkedSetL(s, f.sMs, secsToMsHalfEven(sec, frac), NASMS)
              clear()
            } else if (modified == 'O') {
              // facet whole-second read (tm.tm_sec)
              val t = readUnsigned(s, 1, 2)
              if (!s.fail) f.sMs = checkedSetL(s, f.sMs, t * 1000, NASMS)
              clear()
            } else literal(c)
          } else matchChar(s, c)
        case 'T' =>
          if (command) {
            if (modified == 0) {
              val tH = readUnsigned(s, 1, 2).toInt
              matchChar(s, ':')
              val tM = readUnsigned(s, 1, 2).toInt
              matchChar(s, ':')
              val (sec, frac) = readDecimalSeconds(s, 1, 6)
              if (!s.fail) {
                f.H = checkedSet(s, f.H, tH, NAH)
                f.M = checkedSet(s, f.M, tM, NAH)
                f.sMs = checkedSetL(s, f.sMs, secsToMsHalfEven(sec, frac), NASMS)
              }
              clear()
            } else literal(c)
          } else matchChar(s, c)
        case 'Y' =>
          if (command) {
            if (modified == 0 || modified == 'E') {
              // %EY routes to the facet whose C-locale era table is empty
              val t = readSigned(s, 1, w(4)).toInt
              if (!s.fail) f.Y = checkedSet(s, f.Y, t, NAY)
              clear()
            } else literal(c)
          } else matchChar(s, c)
        case 'y' =>
          if (command) {
            // %Ey/%Oy both route to the facet (date.h:7359-7382), whose
            // C-locale read is the same 2-digit value with the same
            // [69,99]→19xx pivot the unmodified resolution applies
            val t = readUnsigned(s, 1, w(2)).toInt
            if (!s.fail) f.y = checkedSet(s, f.y, t, NA2)
            clear()
          } else matchChar(s, c)
        case 'g' =>
          if (command) {
            if (modified == 0) {
              val t = readUnsigned(s, 1, w(2)).toInt
              if (!s.fail) f.g = checkedSet(s, f.g, t, NA2)
              clear()
            } else literal(c)
          } else matchChar(s, c)
        case 'G' =>
          if (command) {
            if (modified == 0) {
              val t = readSigned(s, 1, w(4)).toInt
              if (!s.fail) f.G = checkedSet(s, f.G, t, NAY)
              clear()
            } else literal(c)
          } else matchChar(s, c)
        case 'U' | 'V' | 'W' =>
          if (command) {
            if (modified == 0) {
              val t = readUnsigned(s, 1, w(2)).toInt
              if (!s.fail) c match {
                case 'U' => f.U = checkedSet(s, f.U, t, NAWK)
                case 'V' => f.V = checkedSet(s, f.V, t, NAWK)
                case _   => f.W = checkedSet(s, f.W, t, NAWK)
              }
              clear()
            } else literal(c)
          } else matchChar(s, c)
        case 'E' | 'O' =>
          if (command) {
            if (modified == 0) modified = c
            else literal(c)
          } else matchChar(s, c)
        case '%' =>
          if (command) {
            if (modified == 0) { matchChar(s, '%'); clear() }
            else literal(c)
          } else command = true
        case 'z' =>
          if (command) {
            // sign peeked BEFORE the signed read; abs applied, negated at
            // the end (date.h:7511-7568). Unmodified: exactly-2-digit
            // hours + optional colonless 2-digit minutes; %Ez/%Oz: 1-2
            // digit hours + optional ':mm'.
            val neg = s.peek == '-'
            var offOk = false; var off = 0
            if (modified == 0) {
              val tH = readSigned(s, 2, 2).toInt
              if (!s.fail) { off = math.abs(tH) * 60; offOk = true }
              if (s.good) {
                val ic = s.peek
                if (ic >= '0' && ic <= '9') {
                  val tM = readUnsigned(s, 2, 2).toInt
                  if (!s.fail) off += tM
                }
              }
            } else {
              val tH = readSigned(s, 1, 2).toInt
              if (!s.fail) { off = math.abs(tH) * 60; offOk = true }
              if (s.good && s.peek == ':') {
                s.pos += 1
                val tM = readUnsigned(s, 2, 2).toInt
                if (!s.fail) off += tM
              }
            }
            if (offOk) {
              val t = if (neg) -off else off
              f.offMin = checkedSet(s, f.offMin, t, NAOFF)
            }
            clear()
          } else matchChar(s, c)
        case 'Z' =>
          if (command) {
            if (modified == 0) {
              // zone-name char class per date.h:7592-7597
              val start = s.pos
              var stop = false
              while (!stop) {
                val ic = s.peek
                if (ic < 0) { s.eofbit = true; stop = true }
                else {
                  val ch = ic.toChar
                  if (ic > 1 && ic < 127 && (Character.isLetterOrDigit(ch) ||
                      ch == '_' || ch == '/' || ch == '-' || ch == '+')) s.pos += 1
                  else stop = true
                }
              }
              if (s.pos == start) s.fail = true
              clear()
            } else literal(c)
          } else matchChar(s, c)
        case other =>
          if (command) {
            if (width == -1 && modified == 0 && other >= '0' && other <= '9') {
              width = other - '0'
              while (i + 1 < fmt.length && fmt.charAt(i + 1) >= '0' &&
                     fmt.charAt(i + 1) <= '9') {
                i += 1
                width = 10 * width + (fmt.charAt(i) - '0')
              }
            } else literal(other) // unknown command: literal "%<mod><c>"
          } else {
            if (WS.indexOf(other) >= 0) {
              // a format space matches 0+ whitespace (date.h:7633-7638)
              if (s.good) s.ws()
            } else matchChar(s, other)
          }
      }
      i += 1
    }
    // trailing lone '%' (+width/mod): matched literally ONLY while the
    // stream is still goodbit (date.h:7654-7660)
    if (!s.fail && !s.eofbit && command)
      matchLiteralCmd(s, width, modified, 0)
  }

  /** Field resolution + sys_time construction (date.h:7661-7899 and the
    * sys_time overload :8015-8033). Returns epoch millis or None (fail). */
  private def resolveSysMs(s: S, f: Fields): Option[Long] = {
    if (s.fail) return None
    def broken: Option[Long] = { s.fail = true; None }

    // y (+ optional C) → Y, POSIX pivot; C is MUTATED for the g block
    if (f.y != NA2) {
      if (f.y < 0 || f.y > 99) return broken
      if (f.C == NAC) {
        if (f.Y == NAY) f.C = if (f.y >= 69) 19 else 20
        else f.C = (if (f.Y >= 0) f.Y else f.Y - 100) / 100
      }
      val tY = if (f.C >= 0) 100 * f.C + f.y
               else 100 * (f.C + 1) - (if (f.y == 0) 100 else f.y)
      if (f.Y != NAY && f.Y != tY) return broken
      f.Y = tY
    }
    if (f.g != NA2) {
      if (f.g < 0 || f.g > 99) return broken
      if (f.C == NAC) {
        if (f.G == NAY) f.C = if (f.g >= 69) 19 else 20
        else f.C = (if (f.G >= 0) f.G else f.G - 100) / 100
      }
      val tG = if (f.C >= 0) 100 * f.C + f.g
               else 100 * (f.C + 1) - (if (f.g == 0) 100 else f.g)
      if (f.G != NAY && f.G != tG) return broken
      f.G = tG
    }
    if (f.Y < -32767 || f.Y > 32767) f.Y = NAY
    var computed = false

    def epochDay(y: Int, m: Int, d: Int): Long = LocalDate.of(y, m, d).toEpochDay
    def weekdaySun0(ed: Long): Int = Math.floorMod(ed + 4, 7).toInt // 1970-01-01 = Thursday = 4
    def lastThuDec(y: Int): Long = {
      val ed = epochDay(y, 12, 31)
      ed - Math.floorMod(weekdaySun0(ed) - 4, 7)
    }
    def firstOfJan(y: Int, wdTarget: Int): Long = {
      val ed = epochDay(y, 1, 1)
      ed + Math.floorMod(wdTarget - weekdaySun0(ed), 7)
    }
    def applyTrial(ed: Long): Option[Long] = {
      val t = LocalDate.ofEpochDay(ed)
      if (f.Y == NAY) f.Y = t.getYear
      else if (f.Y != t.getYear) return broken
      if (f.m == NAM) f.m = t.getMonthValue
      else if (f.m != t.getMonthValue) return broken
      if (f.d == NAM) f.d = t.getDayOfMonth
      else if (f.d != t.getDayOfMonth) return broken
      computed = true
      Some(0L)
    }

    if (f.G != NAY && f.V != NAWK && f.wd != NAWD) {
      val trial = lastThuDec(f.G - 1) + 4 + 7L * (f.V - 1) +
        Math.floorMod(f.wd - 1, 7)
      if (applyTrial(trial).isEmpty) return None
    }
    if (f.Y != NAY && f.U != NAWK && f.wd != NAWD) {
      val trial = firstOfJan(f.Y, 0) + 7L * (f.U - 1) + Math.floorMod(f.wd, 7)
      if (applyTrial(trial).isEmpty) return None
    }
    if (f.Y != NAY && f.W != NAWK && f.wd != NAWD) {
      val trial = firstOfJan(f.Y, 1) + 7L * (f.W - 1) +
        Math.floorMod(f.wd - 1, 7)
      if (applyTrial(trial).isEmpty) return None
    }
    if (f.j != NADOY && f.Y != NAY) {
      // month/day derive from Y-01-01 + (j-1); the YEAR is not re-checked
      // (date.h:7773-7784) — %j of 0 lands on Dec 31 with Y unchanged
      val t = LocalDate.of(f.Y, 1, 1).plusDays(f.j - 1L)
      if (f.m == NAM) f.m = t.getMonthValue
      else if (f.m != t.getMonthValue) return broken
      if (f.d == NAM) f.d = t.getDayOfMonth
      else if (f.d != t.getDayOfMonth) return broken
      f.j = NADOY
    }

    val ymdOk = f.Y != NAY && f.m >= 1 && f.m <= 12 && f.d >= 1 &&
      f.d <= LocalDate.of(f.Y, f.m, 1).lengthOfMonth()
    if (ymdOk) {
      val ed = epochDay(f.Y, f.m, f.d)
      val realWd = weekdaySun0(ed)
      if (f.wd == NAWD) f.wd = realWd
      else if (f.wd != realWd) return broken
      if (!computed) {
        if (f.G != NAY || f.V != NAWK) {
          var gTrial = LocalDate.ofEpochDay(ed + 3).getYear
          var start = lastThuDec(gTrial - 1) + 4
          if (ed < start) {
            gTrial -= 1
            if (f.V != NAWK) start = lastThuDec(gTrial - 1) + 4
          }
          if (f.G != NAY && f.G != gTrial) return broken
          if (f.V != NAWK) {
            val vTrial = (ed - start) / 7 + 1 // sd >= start post-adjust
            if (f.V != vTrial) return broken
          }
        }
        if (f.U != NAWK) {
          val uTrial = Math.floorDiv(ed - firstOfJan(f.Y, 0), 7) + 1
          if (f.U != uTrial) return broken
        }
        if (f.W != NAWK) {
          val wTrial = Math.floorDiv(ed - firstOfJan(f.Y, 1), 7) + 1
          if (f.W != wTrial) return broken
        }
      }
    }

    // 12-hour/am-pm combine (date.h:7836-7874); not_a_hour_12_value is 0,
    // so a parsed "0" for %I never reaches here (range check failed it)
    if (f.I != 0) {
      if (!(f.I >= 1 && f.I <= 12)) return broken
      if (f.p != NAAP) {
        var p = f.p
        var ii = f.I
        if (ii == 12) p -= 1
        ii += p * 12
        if (f.H == NAH) f.H = ii
        else if (ii != f.H) return broken
      } else {
        if (f.H != NAH) {
          if (f.I == 12) { if (f.H != 0 && f.H != 12) return broken }
          else if (!(f.I == f.H || f.I == f.H + 12)) return broken
        } else return broken // %I without %p or %H is ambiguous
      }
    }

    // tod assembly; has_tod is PRESET by the sys_time overload, so a
    // date-only format succeeds with tod 0
    val todH = if (f.H != NAH) f.H else 0
    val todM = if (f.M != NAH) f.M else 0
    val todSMs = if (f.sMs != NASMS) f.sMs else 0L
    // (date.h:7880-7884 folds a leftover %j into tod as 24·j hours — but j
    // survives only when Y is unset, which already fails the ymd.ok()
    // check below, so the fold is unobservable on this sys_time path and
    // intentionally omitted)

    // the sys_time overload: ymd.ok() && tod.in_conventional_range()
    if (!ymdOk) return broken
    if (!(todH >= 0 && todH < 24 && todM >= 0 && todM < 60 &&
          todSMs >= 0 && todSMs < 60000)) return broken

    val off = if (f.offMin != NAOFF) f.offMin else 0
    Some(epochDay(f.Y, f.m, f.d) * 86400000L - off * 60000L +
      todH * 3600000L + todM * 60000L + todSMs)
  }

  /** expr_toDate's 2/3-arg parse (Expression.cpp:660-672): from_stream
    * into sys_time<milliseconds>, then
    * `fail() || (peek() && !eof())` → throw (null here). A trailing NUL
    * makes peek() falsy, so everything at and after a NUL is accepted. */
  def toDateMs(input: String, fmt: String): java.lang.Long = try {
    val s = new S(input)
    val f = new Fields
    runFormat(s, fmt, f)
    resolveSysMs(s, f) match {
      case Some(ms) =>
        val c = s.peek
        if (s.fail || c > 0) null else java.lang.Long.valueOf(ms)
      case None => null
    }
  } catch {
    // the week-date/doy trials build LocalDates from UNCLAMPED parsed
    // fields (only Y gets the ±32767 year clamp, mirroring date.h, whose
    // own int16 year{} silently wraps there — garbage-in UB territory): an
    // explicit-width read like %10G can exceed LocalDate's year range and
    // throw DateTimeException. One garbage row must null, never poison
    // the task — the same convention as every other EL error.
    case scala.util.control.NonFatal(_) => null
  }

  /** parseRfc3339 (TimeUtil.cpp:85-115): "%F" date + one of "tT_ " + the
    * Z-suffix form ("%T" + single get()) or the offset form ("%T%Ez");
    * fractional seconds round to ns then TRUNCATE to ms
    * (duration_cast<milliseconds> in Expression.cpp:655). The Z/z branch
    * keys on str.ends_with — "…Z<junk>" falls to the OFFSET branch and
    * fails at the 'Z'; the NUL acceptance exists only on the offset form. */
  def rfc3339Ms(input: String): java.lang.Long = {
    val s = new S(input)
    // %F: Y rs(1,4) '-' m ru(1,2) '-' d ru(1,2); the year_month_day
    // overload requires ymd.ok() (date.h:8001-8008)
    val tY = readSigned(s, 1, 4).toInt
    matchChar(s, '-')
    val tm = readUnsigned(s, 1, 2).toInt
    matchChar(s, '-')
    val td = readUnsigned(s, 1, 2).toInt
    if (s.fail) return null
    if (!(tm >= 1 && tm <= 12 && td >= 1 && tY >= -32767 && tY <= 32767 &&
          td <= LocalDate.of(tY, tm, 1).lengthOfMonth())) return null
    // stream.get(delimiter): eof → fail; must be one of "tT_ "
    val delim = s.peek
    if (delim < 0) return null
    s.pos += 1
    if ("tT_ ".indexOf(delim.toChar) < 0) return null
    // %T at system_clock (ns) precision: H ':' M ':' S with ≤ 2+1+9 chars
    val tH = readUnsigned(s, 1, 2).toInt
    matchChar(s, ':')
    val tM = readUnsigned(s, 1, 2).toInt
    matchChar(s, ':')
    val (sec, frac) = readDecimalSeconds(s, 1, 12)
    if (s.fail) return null
    // the duration overload: only in-range check is has_tod (set); round
    // half-even to ns, truncate to ms
    val (carry, ns9) = fracRound(frac, 9)
    val todMs = tH * 3600000L + tM * 60000L + (sec + carry) * 1000L +
      ns9 / 1000000L
    var offMin = 0L
    if (input.endsWith("Z") || input.endsWith("z")) {
      // consume ONE char (whatever it is), then the stream-state check
      if (s.peek >= 0) s.pos += 1 else return null
    } else {
      // %Ez: sign-optional 1-2 digit hours, optional ':' + 2-digit minutes
      val neg = s.peek == '-'
      val oH = readSigned(s, 1, 2).toInt
      if (s.fail) return null
      var off = math.abs(oH) * 60L
      if (s.good && s.peek == ':') {
        s.pos += 1
        val oM = readUnsigned(s, 2, 2)
        if (s.fail) return null
        off += oM
      }
      offMin = if (neg) -off else off
    }
    val c = s.peek
    if (s.fail || c > 0) return null
    java.lang.Long.valueOf(
      LocalDate.of(tY, tm, td).toEpochDay * 86400000L + todMs -
        offMin * 60000L)
  }
}

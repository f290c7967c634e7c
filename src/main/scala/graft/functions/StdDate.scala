package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Std.Date surface (ref `ecllibrary/std/Date.ecl`) over the integer-coded
  * types: Date_t = yyyymmdd, Time_t = hhmmss, Days_t = day count,
  * Seconds_t = unix seconds (UTC). Everything is composed built-in Column
  * arithmetic — part extraction never round-trips through DateType, and the
  * calendar conversions ride Spark's proleptic-Gregorian date functions,
  * which match the reference's Fliegel–van-Flandern day arithmetic
  * (`Date.ecl:247` counts 1 Jan 1AD = day 1). Behavior vectors are asserted
  * in StdDateSpec, ported from `ecllibrary/teststd/Date/TestDate.ecl`.
  */
object StdDate {

  // ---- part extraction (pure integer arithmetic, Date.ecl:66-116) --------

  def yearT(d: Column): Column = floor(d / 10000).cast("int")
  def monthT(d: Column): Column = (floor(d / 100) % 100).cast("int")
  def dayT(d: Column): Column = (d % 100).cast("int")
  def hourT(t: Column): Column = floor(t / 10000).cast("int")
  def minuteT(t: Column): Column = (floor(t / 100) % 100).cast("int")
  def secondT(t: Column): Column = (t % 100).cast("int")

  /** DateFromParts (Date.ecl:128). */
  def dateFromParts(y: Column, m: Column, d: Column): Column =
    ((y * 100 + m) * 100 + d).cast("int")

  /** TimeFromParts (Date.ecl:140). */
  def timeFromParts(h: Column, m: Column, s: Column): Column =
    ((h * 100 + m) * 100 + s).cast("int")

  // ---- Date_t <-> DateType codecs -----------------------------------------

  /** Date_t → native DateType (delegates to the shared codec). */
  def fromDateT(d: Column): Column = EclFunctions.fromDateT(d)

  /** DateType/timestamp → Date_t. */
  def toDateT(c: Column): Column = EclFunctions.toDateT(c)

  // ---- leap years (Date.ecl:220-230,374) ----------------------------------

  def isLeapYear(y: Column): Column = EclFunctions.isLeapYear(y)
  def isDateLeapYear(d: Column): Column = isLeapYear(yearT(d))
  def isJulianLeapYear(y: Column): Column = y % 4 === 0

  // ---- day-count epochs (Date.ecl:247-481) --------------------------------

  private val Day1 = to_date(lit("0001-01-01"))
  private val Day1900 = to_date(lit("1900-01-01"))

  /** FromGregorianDate: days since 31 Dec 1BC, 1 Jan 1AD = 1 (Date.ecl:310).
    * Spark's DateType is proleptic Gregorian — same calendar as the
    * reference's formula.
    */
  def fromGregorianDate(d: Column): Column =
    (datediff(fromDateT(d), Day1) + 1).cast("int")

  /** ToGregorianDate: inverse of [[fromGregorianDate]] (Date.ecl:321). */
  def toGregorianDate(days: Column): Column =
    toDateT(date_add(Day1, (days - 1).cast("int")))

  /** ToDaysSince1900 (Date.ecl:471). */
  def toDaysSince1900(d: Column): Column =
    datediff(fromDateT(d), Day1900).cast("int")

  /** FromDaysSince1900 (Date.ecl:481). */
  def fromDaysSince1900(days: Column): Column =
    toDateT(date_add(Day1900, days.cast("int")))

  // ---- calendar readouts (Date.ecl:337-356, 1123-1248) --------------------

  /** DayOfYear: 1-366 (Date.ecl:337). */
  def dayOfYear(d: Column): Column = dayofyear(fromDateT(d))

  /** DayOfWeek: 1-7 with 1 = Sunday (Date.ecl:356) — Spark's convention. */
  def dayOfWeek(d: Column): Column = dayofweek(fromDateT(d))

  /** ISODayOfWeekFromDate: 1-7 with 1 = Monday (Date.ecl:1123). */
  def isoDayOfWeek(d: Column): Column = (weekday(fromDateT(d)) + 1).cast("int")

  /** ISO-8601 week number (Date.ecl:1168 ISOWeekNumWeekDayAndYearFromDate). */
  def isoWeekNum(d: Column): Column = weekofyear(fromDateT(d)).cast("int")

  /** ISO week-numbering year: the calendar year of the week's Thursday. */
  def isoWeekYear(d: Column): Column = {
    val fd = fromDateT(d)
    year(date_add(fd, lit(3) - weekday(fd))).cast("int")
  }

  /** ISOWeeksFromDate's year-level core: 52 or 53 weeks (Date.ecl:1148) —
    * the ISO week of 28 Dec, always in the year's last week.
    */
  def isoWeeksInYear(y: Column): Column =
    weekofyear(make_date(y, lit(12), lit(28))).cast("int")

  /** ISOWeekDate (Date.ecl:1196): "yyyy-Www-d" when extended, "yyyyWwwd"
    * otherwise.
    */
  def isoWeekDate(d: Column, extended: Boolean = false): Column = {
    val parts = Seq(isoWeekYear(d).cast("string"),
      concat(lit("W"), lpad(isoWeekNum(d).cast("string"), 2, "0")),
      isoDayOfWeek(d).cast("string"))
    concat_ws(if (extended) "-" else "", parts: _*)
  }

  /** WeekNumForDate core (Date.ecl:955): 1-based week of `d` counted from
    * `ref`, weeks starting on `startingDayOfWeek` (1 = Sunday); week 1
    * contains `ref`.
    */
  private def weekNumFrom(d: Column, ref: Column,
      startingDayOfWeek: Int): Column = {
    val refDow = dayofweek(ref)
    // C-style remainder (sign of dividend), matching ECL's %
    val delta = (lit(startingDayOfWeek) - refDow) % 7
    val refFirst = date_add(ref, delta.cast("int"))
    val nDays = datediff(fromDateT(d), refFirst) + 1
    val week0 = floor((nDays + 6) / 7).cast("int")
    (week0 + when(lit(startingDayOfWeek) > refDow, 1).otherwise(0)).cast("int")
  }

  /** YearWeekNumFromDate (Date.ecl:1217): week within the year. */
  def yearWeekNum(d: Column, startingDayOfWeek: Int = 1): Column =
    weekNumFrom(d, make_date(yearT(d), lit(1), lit(1)), startingDayOfWeek)

  /** MonthWeekNumFromDate (Date.ecl:1238): week within the month. */
  def monthWeekNum(d: Column, startingDayOfWeek: Int = 1): Column =
    weekNumFrom(d, make_date(yearT(d), monthT(d), lit(1)), startingDayOfWeek)

  // ---- intervals (Date.ecl:492-551) ---------------------------------------

  /** DaysBetween (signed). */
  def daysBetween(from: Column, to: Column): Column =
    datediff(fromDateT(to), fromDateT(from)).cast("int")

  /** YearsBetween: whole years, symmetric sign (Date.ecl:492). */
  def yearsBetween(from: Column, to: Column): Column = {
    val lo = least(from, to)
    val hi = greatest(from, to)
    val years = yearT(hi) - yearT(lo)
    val adj = when(monthT(lo) > monthT(hi) ||
      (monthT(lo) === monthT(hi) && dayT(lo) > dayT(hi)), 1).otherwise(0)
    ((years - adj) * when(from > to, -1).otherwise(1)).cast("int")
  }

  private def isMonthEnd(d: Column): Column =
    dayT(d) === dayofmonth(last_day(fromDateT(d)))

  /** MonthsBetween: whole months; `monthEndsEqual` treats two month-end
    * days as equal (Date.ecl:523).
    */
  def monthsBetween(from: Column, to: Column,
      monthEndsEqual: Boolean = false): Column = {
    val lo = least(from, to)
    val hi = greatest(from, to)
    val raw = (yearT(hi) - yearT(lo)) * 12 + (monthT(hi) - monthT(lo))
    val dayAdj = when(dayT(lo) > dayT(hi), 1).otherwise(0)
    val adj =
      if (monthEndsEqual) when(isMonthEnd(lo) && isMonthEnd(hi), 0).otherwise(dayAdj)
      else dayAdj
    ((raw - adj) * when(from > to, -1).otherwise(1)).cast("int")
  }

  // ---- adjustment (Date.ecl:962-1120) -------------------------------------

  /** AdjustDate (Date.ecl:962): mktime normalization — month deltas roll
    * into years, then the (possibly out-of-range) day counts forward from
    * the 1st: 20000130 + 1 month = 20000301; 20000229 + 1 year = 20010301.
    */
  def adjustDate(d: Column, yearDelta: Column = lit(0),
      monthDelta: Column = lit(0), dayDelta: Column = lit(0)): Column = {
    val totalMonths = (yearT(d) + yearDelta) * 12 + (monthT(d) - 1) + monthDelta
    val y2 = floor(totalMonths / 12).cast("int")
    val m2 = (pmod(totalMonths, lit(12)) + 1).cast("int")
    toDateT(date_add(make_date(y2, m2, lit(1)),
      (dayT(d) - 1 + dayDelta).cast("int")))
  }

  /** AdjustDateBySeconds (Date.ecl:980): midnight + delta, floor to day. */
  def adjustDateBySeconds(d: Column, secondsDelta: Column): Column =
    toDateT(date_add(fromDateT(d), floor(secondsDelta / 86400).cast("int")))

  /** AdjustTime (Date.ecl:999): wraps mod 24h (mktime normalization). */
  def adjustTime(t: Column, hourDelta: Column = lit(0),
      minuteDelta: Column = lit(0), secondDelta: Column = lit(0)): Column = {
    val total = hourT(t) * 3600 + minuteT(t) * 60 + secondT(t) +
      hourDelta * 3600 + minuteDelta * 60 + secondDelta
    val w = pmod(total, lit(86400))
    timeFromParts(floor(w / 3600).cast("int"),
      (floor(w / 60) % 60).cast("int"), (w % 60).cast("int"))
  }

  /** AdjustTimeBySeconds (Date.ecl:1015). */
  def adjustTimeBySeconds(t: Column, secondsDelta: Column): Column =
    adjustTime(t, secondDelta = secondsDelta)

  /** AdjustCalendar (Date.ecl:1080): legal-calendar month arithmetic —
    * clamp to the target month's last day (Jan 31 + 1 month = Feb 28),
    * day delta applied after. Spark's add_months implements the clamp.
    */
  def adjustCalendar(d: Column, yearDelta: Column = lit(0),
      monthDelta: Column = lit(0), dayDelta: Column = lit(0)): Column =
    toDateT(date_add(
      add_months(fromDateT(d), (yearDelta * 12 + monthDelta).cast("int")),
      dayDelta.cast("int")))

  // ---- Seconds_t (UTC unix seconds, Date.ecl:160-211) ---------------------

  /** SecondsFromParts (is_local_time = FALSE — UTC). */
  def secondsFromParts(y: Column, mo: Column, d: Column, h: Column,
      mi: Column, s: Column): Column =
    make_timestamp(y, mo, d, h, mi, s, lit("UTC")).cast("long")

  /** SecondsToParts' date component as Date_t. */
  def secondsToDateT(seconds: Column): Column =
    toDateT(from_utc_timestamp(timestamp_seconds(seconds), "UTC"))

  /** SecondsToParts' time component as Time_t. */
  def secondsToTimeT(seconds: Column): Column = {
    val ts = from_utc_timestamp(timestamp_seconds(seconds), "UTC")
    timeFromParts(hour(ts), minute(ts), second(ts))
  }

  /** TimestampToSeconds: microseconds → seconds (Date.ecl:211). */
  def timestampToSeconds(ts: Column): Column = floor(ts / 1000000).cast("long")

  // ---- string formatting (strftime subset, Date.ecl:651-942) --------------

  /** Translate the strftime subset the reference's formatters use to a Java
    * DateTimeFormatter pattern (literal letters get quoted). `forParse`
    * emits single-letter fields (d, M, H...) because strptime accepts 1-2
    * digits where Java's doubled letters demand exactly two.
    */
  private[functions] def strftimeToJava(fmt: String,
      forParse: Boolean = false): String = {
    val sb = new StringBuilder
    val run = new StringBuilder // pending literal run, quoted as one block
    def literal(c: Char): Unit = run.append(c)
    def flush(): Unit = if (run.nonEmpty) {
      val s = run.toString
      if (s.exists(_.isLetter))
        sb.append('\'').append(s.replace("'", "''")).append('\'')
      else sb.append(s.replace("'", "''"))
      run.clear()
    }
    var i = 0
    while (i < fmt.length) {
      if (fmt(i) == '%' && i + 1 < fmt.length) {
        flush()
        fmt(i + 1) match {
          case 'Y'       => sb.append(if (forParse) "y" else "yyyy")
          case 'y'       => sb.append("yy")
          case 'm'       => sb.append(if (forParse) "M" else "MM")
          case 'd'       => sb.append(if (forParse) "d" else "dd")
          case 'e'       => sb.append("d")
          case 'j'       => sb.append(if (forParse) "D" else "DDD")
          case 'H'       => sb.append(if (forParse) "H" else "HH")
          case 'M'       => sb.append(if (forParse) "m" else "mm")
          case 'S'       => sb.append(if (forParse) "s" else "ss")
          case 'b' | 'h' => sb.append("MMM")
          case 'B'       => sb.append("MMMM")
          case 'a'       => sb.append("EEE")
          case 'A'       => sb.append("EEEE")
          case '%'       => sb.append('%')
          case other     => literal(other)
        }
        i += 2
      } else { literal(fmt(i)); i += 1 }
    }
    flush()
    sb.toString
  }

  /** DateToString (Date.ecl:784): '' when the date is 0/invalid. */
  def dateToString(d: Column, fmt: String = "%Y-%m-%d"): Column =
    coalesce(date_format(try_to_date(lpad(d.cast("string"), 8, "0"),
      "yyyyMMdd"), strftimeToJava(fmt)), lit(""))

  /** TimeToString (Date.ecl:800). */
  def timeToString(t: Column, fmt: String = "%H:%M:%S"): Column =
    coalesce(date_format(make_timestamp(lit(1970), lit(1), lit(1),
      hourT(t), minuteT(t), secondT(t), lit("UTC")),
      strftimeToJava(fmt)), lit(""))

  /** FromStringToDate (Date.ecl:651): 0 on parse failure. */
  def fromStringToDate(text: Column, fmt: String): Column =
    coalesce(toDateT(tryParseDate(text, fmt)), lit(0))

  /** ConvertDateFormat (Date.ecl:866): '' on parse failure. */
  def convertDateFormat(text: Column, fromFmt: String = "%m/%d/%Y",
      toFmt: String = "%Y%m%d"): Column =
    coalesce(date_format(tryParseDate(text, fromFmt),
      strftimeToJava(toFmt)), lit(""))

  /** FromStringToTime (Date.ecl:723): Time_t, 0 on parse failure. */
  def fromStringToTime(text: Column, fmt: String): Column = {
    val ts = tryParseTs(text, fmt)
    coalesce(timeFromParts(hour(ts), minute(ts), second(ts)), lit(0))
  }

  /** ConvertTimeFormat (Date.ecl:887): '' on parse failure. */
  def convertTimeFormat(text: Column, fromFmt: String = "%H%M%S",
      toFmt: String = "%H%M%S"): Column =
    coalesce(date_format(tryParseTs(text, fromFmt),
      strftimeToJava(toFmt)), lit(""))

  // strptime month/day names are case-insensitive (Java's are not —
  // canonicalize case when the format names months/days), and strptime
  // numeric fields accept 1-2 digits yet also pack tight ("20111201"):
  // try the strict fixed-width translation first, then the lenient one.
  private def canonCase(text: Column, fmt: String): Column =
    if (fmt.exists("bBaA".contains(_)) && fmt.contains('%'))
      initcap(lower(text)) else text

  private def tryParseDate(text: Column, fmt: String): Column = {
    val in = canonCase(text, fmt)
    coalesce(try_to_date(in, strftimeToJava(fmt)),
      try_to_date(in, strftimeToJava(fmt, forParse = true)))
  }

  private def tryParseTs(text: Column, fmt: String): Column = {
    val in = canonCase(text, fmt)
    coalesce(try_to_timestamp(in, lit(strftimeToJava(fmt))),
      try_to_timestamp(in, lit(strftimeToJava(fmt, forParse = true))))
  }

  /** ConvertDateFormatMultiple (Date.ecl:909): first format that parses
    * wins, '' when none do.
    */
  def convertDateFormatMultiple(text: Column, fromFmts: Seq[String],
      toFmt: String = "%Y%m%d"): Column = {
    val parsed = coalesce(fromFmts.map(f => tryParseDate(text, f)): _*)
    coalesce(date_format(parsed, strftimeToJava(toFmt)), lit(""))
  }

  /** MatchDateString (Date.ecl:841): Date_t from the first format that
    * parses, 0 when none do.
    */
  def matchDateString(text: Column, fmts: Seq[String]): Column =
    coalesce(toDateT(coalesce(
      fmts.map(f => tryParseDate(text, f)): _*)), lit(0))

  /** MatchTimeString (Date.ecl:855): Time_t from the first parsing format. */
  def matchTimeString(text: Column, fmts: Seq[String]): Column =
    coalesce(coalesce(fmts.map(f => {
      val ts = tryParseTs(text, f)
      when(ts.isNotNull, timeFromParts(hour(ts), minute(ts), second(ts)))
    }): _*), lit(0))

  /** SecondsToParts (Date.ecl:160): every component in one struct. */
  def secondsToParts(seconds: Column): Column = {
    val ts = from_utc_timestamp(timestamp_seconds(seconds), "UTC")
    struct(
      year(ts).as("year"), month(ts).as("month"),
      dayofmonth(ts).as("day"), hour(ts).as("hour"),
      minute(ts).as("minute"), second(ts).as("second"),
      dayofweek(ts).as("day_of_week"),
      toDateT(ts).as("date"),
      timeFromParts(hour(ts), minute(ts), second(ts)).as("time"))
  }

  // ---- Julian calendar (Date.ecl:377-449) ---------------------------------
  // Toendering day-count formulas; same YearDelta/JulianDateOrigin anchors
  // as the reference so 1 Jan 1AD = day 1 in both calendars.

  private val YearDeltaC = 4800
  private val JulianDateOrigin = -1753505

  /** FromJulianYMD (Date.ecl:390): Julian-calendar Y/M/D → elapsed days. */
  def fromJulianYMD(y: Column, m: Column, d: Column): Column = {
    val a = floor((lit(14) - m) / 12)
    val y2 = y + YearDeltaC - a
    val m2 = m + a * 12 - 3
    (d + floor((m2 * 153 + 2) / 5) + y2 * 365 + floor(y2 / 4) +
      (JulianDateOrigin - 1)).cast("int")
  }

  /** ToJulianYMD (Date.ecl:408): elapsed days → struct(year, month, day)
    * in the Julian calendar.
    */
  def toJulianYMD(days: Column): Column = {
    val daysIn4Years = 3 * 365 + 366
    val c = days - JulianDateOrigin
    val dd = floor((c * 4 + 3) / daysIn4Years)
    val e = c - floor(dd * daysIn4Years / 4)
    val m = floor((e * 5 + 2) / 153)
    struct(
      (dd - YearDeltaC + floor(m / 10)).cast("int").as("year"),
      (m + 3 - floor(m / 10) * 12).cast("int").as("month"),
      (e - floor((m * 153 + 2) / 5) + 1).cast("int").as("day"))
  }

  /** FromJulianDate (Date.ecl:432): Julian-calendar Date_t → days. */
  def fromJulianDate(d: Column): Column =
    fromJulianYMD(yearT(d), monthT(d), dayT(d))

  /** ToJulianDate (Date.ecl:442): days → Julian-calendar Date_t. */
  def toJulianDate(days: Column): Column = {
    val p = toJulianYMD(days)
    dateFromParts(p("year"), p("month"), p("day"))
  }

  // ---- date ranges (Date.ecl:1344-1379) -----------------------------------

  /** DatesForMonth: struct(startDate, endDate) covering d's month. */
  def datesForMonth(d: Column): Column =
    struct(dateFromParts(yearT(d), monthT(d), lit(1)).as("startDate"),
      toDateT(last_day(fromDateT(d))).as("endDate"))

  /** DatesForWeek: struct(startDate, endDate), Sunday-started week. */
  def datesForWeek(d: Column): Column = {
    val fd = fromDateT(d)
    val start = date_sub(fd, dayofweek(fd) - 1)
    struct(toDateT(start).as("startDate"),
      toDateT(date_add(start, 6)).as("endDate"))
  }

  // ---- validators (Date.ecl IsValidDate/IsValidTime/IsValidGregorianDate) -

  /** Days in (year, month), leap-aware — the calendar fact the validators
    * share.
    */
  def daysInMonth(y: Column, m: Column): Column =
    when(m.isin(1, 3, 5, 7, 8, 10, 12), 31)
      .when(m.isin(4, 6, 9, 11), 30)
      .when(m === 2, when(isLeapYear(y), 29).otherwise(28))
      .otherwise(0)

  /** IsValidDate: real calendar day with configurable year bounds
    * (`Date.ecl:1392` defaults yearLowerBound=1800, yearUpperBound=2100).
    */
  def isValidDate(d: Column, yearLowerBound: Int = 1800,
      yearUpperBound: Int = 2100): Column = {
    val y = yearT(d); val m = monthT(d); val dd = dayT(d)
    y.between(yearLowerBound, yearUpperBound) && m.between(1, 12) &&
      dd >= 1 && dd <= daysInMonth(y, m)
  }

  /** IsValidGregorianDate: year 1601..30827 and a real (normalized)
    * Gregorian day (`Date.ecl:1412` — `date = AdjustDate(date)`).
    */
  def isValidGregorianDate(d: Column): Column =
    isValidDate(d, 1601, 30827)

  /** IsValidTime: hh 0-23, mm 0-59, ss 0-59 (no leap seconds, per ref). */
  def isValidTime(t: Column): Column =
    hourT(t).between(0, 23) && minuteT(t).between(0, 59) &&
      secondT(t).between(0, 59)

  // ---- reference-name aliases (Date.ecl constructors). The bare part
  // getters (Year/Month/Day/...) are NOT aliased: they would shadow
  // Spark's functions.year/month/... inside this file — use yearT etc. ----

  def createDate(y: Column, m: Column, d: Column): Column =
    dateFromParts(y, m, d)
  def createTime(h: Column, m: Column, s: Column): Column =
    timeFromParts(h, m, s)

  // ---- current date (Date.ecl:1279-1289) ----------------------------------

  def currentDate(): Column = toDateT(current_date())

  // ---- r18 parity audit: the remaining Date.ecl exports --------------------

  /** Today (Date.ecl:1289). */
  def today(): Column = currentDate()

  /** CurrentTime (Date.ecl:1300 region): Time_t of now. Sessions pin UTC;
    * the reference's in_local_time flag is the session timezone here.
    */
  def currentTime(): Column = EclFunctions.toTimeT(current_timestamp())

  /** CurrentSeconds (Date.ecl:1315): unix seconds of now. */
  def currentSeconds(): Column = unix_timestamp(current_timestamp())

  /** CurrentTimestamp: microseconds since epoch. */
  def currentTimestampT(): Column = unix_micros(current_timestamp())

  /** AdjustSeconds (Date.ecl:1046, TimeLib.AdjustSeconds): calendar deltas
    * via mktime-style normalization (Jan 31 + 1 month = Mar 2/3), the same
    * rule as [[adjustDate]]; clock deltas are exact seconds. Normalization
    * falls out of make_date(y, m, 1) + (day-1) day arithmetic, all
    * codegen'd.
    */
  def adjustSeconds(seconds: Column,
      yearDelta: Column = lit(0), monthDelta: Column = lit(0),
      dayDelta: Column = lit(0), hourDelta: Column = lit(0),
      minuteDelta: Column = lit(0), secondDelta: Column = lit(0)): Column = {
    val ts = from_utc_timestamp(timestamp_seconds(seconds), "UTC")
    val mi = (year(ts) * 12 + month(ts) - 1) + yearDelta * 12 + monthDelta
    val ny = floor(mi / 12).cast("int")
    val nm = (pmod(mi, lit(12)) + 1).cast("int")
    val newDate = date_add(make_date(ny, nm, lit(1)),
      (dayofmonth(ts) - 1 + dayDelta).cast("int"))
    (unix_date(newDate).cast("long") * 86400
      + hour(ts) * 3600 + minute(ts) * 60 + second(ts)
      + hourDelta * 3600 + minuteDelta * 60 + secondDelta).cast("long")
  }

  // ---- record (struct) constructors and accessors (Date.ecl:566-619,
  // 1524-1560). ECL's Date_rec/Time_rec/DateTime_rec are nested RECORDs;
  // the Spark analog is a StructType column with the same field names. ----

  /** CreateDate / CreateTime / CreateDateTime (struct forms). */
  def createDateRec(y: Column, m: Column, d: Column): Column =
    struct(y.cast("int").as("year"), m.cast("int").as("month"),
      d.cast("int").as("day"))
  def createTimeRec(h: Column, m: Column, s: Column): Column =
    struct(h.cast("int").as("hour"), m.cast("int").as("minute"),
      s.cast("int").as("second"))
  def createDateTime(y: Column, mo: Column, d: Column,
      h: Column, mi: Column, s: Column): Column =
    struct(y.cast("int").as("year"), mo.cast("int").as("month"),
      d.cast("int").as("day"), h.cast("int").as("hour"),
      mi.cast("int").as("minute"), s.cast("int").as("second"))

  /** CreateDateTimeFromSeconds (Date.ecl:1550). */
  def createDateTimeFromSeconds(seconds: Column): Column = {
    val p = secondsToParts(seconds)
    struct(p("year").as("year"), p("month").as("month"), p("day").as("day"),
      p("hour").as("hour"), p("minute").as("minute"),
      p("second").as("second"))
  }

  /** CreateDateFromSeconds / CreateTimeFromSeconds. */
  def createDateFromSeconds(seconds: Column): Column = secondsToDateT(seconds)
  def createTimeFromSeconds(seconds: Column): Column = secondsToTimeT(seconds)

  /** DateFromDateRec (Date.ecl:566; DateFromRec is its deprecated alias). */
  def dateFromDateRec(rec: Column): Column =
    dateFromParts(rec("year"), rec("month"), rec("day"))

  /** TimeFromTimeRec (Date.ecl:586). */
  def timeFromTimeRec(rec: Column): Column =
    timeFromParts(rec("hour"), rec("minute"), rec("second"))

  /** DateFromDateTimeRec / TimeFromDateTimeRec (Date.ecl:596-606). */
  def dateFromDateTimeRec(rec: Column): Column = dateFromDateRec(rec)
  def timeFromDateTimeRec(rec: Column): Column = timeFromTimeRec(rec)

  /** SecondsFromDateTimeRec (Date.ecl:619). */
  def secondsFromDateTimeRec(rec: Column): Column =
    secondsFromParts(rec("year"), rec("month"), rec("day"),
      rec("hour"), rec("minute"), rec("second"))

  // ---- Gregorian YMD forms (Date.ecl:247,267) ------------------------------

  /** FromGregorianYMD: day count with 1 Jan 1AD = day 1. */
  def fromGregorianYMD(y: Column, m: Column, d: Column): Column =
    fromGregorianDate(dateFromParts(y, m, d))

  /** ToGregorianYMD: (year, month, day) struct from the day count. */
  def toGregorianYMD(days: Column): Column = {
    val d = toGregorianDate(days)
    struct(yearT(d).as("year"), monthT(d).as("month"), dayT(d).as("day"))
  }

  // ---- string parse/format completions (Date.ecl:651-942) ------------------

  /** FromString (Date.ecl:665) — alias of FromStringToDate. */
  def fromString(text: Column, fmt: String): Column =
    fromStringToDate(text, fmt)

  /** FromStringToSeconds (Date.ecl:720): strftime parse → unix seconds,
    * 0 when unparseable (the reference's failure value).
    */
  def fromStringToSeconds(text: Column, fmt: String): Column =
    coalesce(
      unix_timestamp(tryParseTs(text, fmt)).cast("long"), lit(0L))

  /** SecondsToString (Date.ecl:815): strftime format of unix seconds. */
  def secondsToString(seconds: Column,
      fmt: String = "%Y-%m-%dT%H:%M:%S"): Column =
    date_format(from_utc_timestamp(timestamp_seconds(seconds), "UTC"),
      strftimeToJava(fmt))

  /** TimestampToString (Date.ecl:835): microseconds since epoch with the
    * reference's extra specifiers — %@ = 6-digit microsecond fraction,
    * %# = 3-digit milliseconds. The fraction is per-row data, so the
    * specifiers become sentinel literals through the formatter and the
    * fraction substitutes afterwards (all builtin string ops).
    */
  def timestampToString(micros: Column,
      fmt: String = "%Y-%m-%dT%H:%M:%S.%@"): Column = {
    val SentMicro = "\u0001"
    val SentMilli = "\u0002"
    val fmt2 = fmt.replace("%@", SentMicro).replace("%#", SentMilli)
    val base = secondsToString(floor(micros / 1000000).cast("long"), fmt2)
    // pmod, not %: for pre-epoch (negative) micros Spark's % keeps the
    // dividend's sign, which would mangle the zero-padded fraction and
    // disagree with the floored seconds on the boundary; floor + pmod
    // decompose micros consistently (micros = floorSec*1e6 + pmod).
    val frac6 = lpad(pmod(micros, lit(1000000L)).cast("string"), 6, "0")
    replace(replace(base, lit(SentMicro), frac6),
      lit(SentMilli), substring(frac6, 1, 3))
  }

  /** ToString (Date.ecl:853) — deprecated alias of DateToString. */
  def toStringT(d: Column, fmt: String): Column = dateToString(d, fmt)

  /** ConvertFormat / ConvertFormatMultiple (Date.ecl:884,929) — aliases of
    * the date-format converters.
    */
  def convertFormat(text: Column, fromFmt: String = "%m/%d/%Y",
      toFmt: String = "%Y%m%d"): Column =
    convertDateFormat(text, fromFmt, toFmt)
  def convertFormatMultiple(text: Column, fromFmts: Seq[String],
      toFmt: String = "%Y%m%d"): Column =
    convertDateFormatMultiple(text, fromFmts, toFmt)

  /** ConvertTimeFormatMultiple: first parseable of `fromFmts`, else ''. */
  def convertTimeFormatMultiple(text: Column, fromFmts: Seq[String],
      toFmt: String = "%H%M%S"): Column = {
    val t = matchTimeString(text, fromFmts)
    when(t.isNull, lit("")).otherwise(timeToString(t, toFmt))
  }

  // ---- ISO week completions (Date.ecl:1140-1186) ---------------------------

  /** ISOIsLongYear (Date.ecl:1140): the year has 53 ISO weeks. */
  def isoIsLongYear(y: Column): Column = isoWeeksInYear(y) === 53

  /** ISORawWeekNumForDate (Date.ecl:1156): may be 0 or 53/54 at year
    * boundaries — the raw value before ISOWeekNumWeekDayAndYear folds it.
    */
  def isoRawWeekNum(d: Column): Column =
    floor((dayOfYear(d) - isoDayOfWeek(d) + 10) / 7).cast("int")

  /** ISOWeekNumWeekDayAndYearFromDate (Date.ecl:1168): struct of the
    * folded ISO week number, its year, and the ISO weekday.
    */
  def isoWeekNumWeekDayAndYear(d: Column): Column = {
    val gy = yearT(d)
    val raw = isoRawWeekNum(d)
    val lastWeekPrev = isoWeeksInYear(gy - 1)
    val lastWeekGiven = isoWeeksInYear(gy)
    val week = when(raw < 1, lastWeekPrev)
      .when(raw > lastWeekGiven, 1).otherwise(raw).cast("int")
    val wy = (gy + when(raw < 1, -1).when(raw > lastWeekGiven, 1)
      .otherwise(0)).cast("int")
    struct(week.as("weekNumber"), wy.as("year"),
      isoDayOfWeek(d).as("weekDay"))
  }

  // ---- session-timezone scalars (Date.ecl:1235-1264 analogs) ---------------
  // The reference asks the C library about the PROCESS's local zone; the
  // engine analog is the Spark session timezone (sessions here pin UTC, so
  // both read 0/false there — the implementations are zone-generic).

  /** LocalTimeZoneOffset: seconds east of UTC for the session zone now,
    * read back from the formatter's xxx offset rendering (codegen'd).
    */
  def localTimeZoneOffset(): Column = {
    val off = date_format(current_timestamp(), "xxx") // e.g. +05:30
    val sign = when(substring(off, 1, 1) === "-", -1).otherwise(1)
    sign * (substring(off, 2, 2).cast("int") * 3600 +
      substring(off, 5, 2).cast("int") * 60)
  }

  /** IsLocalDaylightSavingsInEffect: the session zone's offset now differs
    * from its standard (minimum of mid-winter/mid-summer) offset —
    * hemisphere-neutral, matching tm_isdst for zones with a single DST
    * rule.
    */
  def isLocalDaylightSavingsInEffect(): Column = {
    def offAt(md: String): Column = {
      val ts = to_timestamp(concat(year(current_date()).cast("string"),
        lit(s"-$md 12:00:00")))
      val off = date_format(ts, "xxx")
      val sign = when(substring(off, 1, 1) === "-", -1).otherwise(1)
      sign * (substring(off, 2, 2).cast("int") * 3600 +
        substring(off, 5, 2).cast("int") * 60)
    }
    localTimeZoneOffset() > least(offAt("01-15"), offAt("07-15"))
  }
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Std.Date time-zone surface (ref `ecllibrary/std/Date.ecl:1571-2100`):
  * abbreviation-keyed fixed offsets with a location disambiguator, because
  * one abbreviation can name several zones (three ISTs, three CSTs).
  *
  * The reference resolves lookups against a hardcoded table
  * (`Date.ecl:1603` TZ_DATA) with FIRST-MATCH semantics in table order;
  * we keep the same contract over a curated table of the same public
  * offset facts (IANA / timeanddate.com data). Lookups lower to
  * `element_at` on a literal map — constant-folded per row group, no UDF,
  * stays inside whole-stage codegen, and at 100 TB the map travels inside
  * the plan (a few KB), never as a shuffle or broadcast table.
  *
  * Behavior vectors in StdDateSpec are ported from
  * `ecllibrary/teststd/Date/TestDate.ecl:346-365`.
  */
object StdTimezone {

  /** (abbrev, secondsOffset, locations) — first match per abbrev wins,
    * mirroring the reference's table-order contract (`Date.ecl:1908`).
    */
  val tzData: Seq[(String, Int, Seq[String])] = Seq(
    ("ACDT", 37800, Seq("AUSTRALIA")),
    ("ACST", 34200, Seq("AUSTRALIA")),
    ("ADT", 10800, Seq("ASIA")),
    ("ADT", -10800, Seq("NORTH AMERICA", "ATLANTIC")),
    ("AEDT", 39600, Seq("AUSTRALIA")),
    ("AEST", 36000, Seq("AUSTRALIA")),
    ("AKDT", -28800, Seq("NORTH AMERICA")),
    ("AKST", -32400, Seq("NORTH AMERICA")),
    ("AST", 7200, Seq("ASIA")),
    ("AST", -14400, Seq("NORTH AMERICA", "ATLANTIC", "CARIBBEAN")),
    ("AWST", 28800, Seq("AUSTRALIA")),
    ("BRT", -10800, Seq("SOUTH AMERICA")),
    ("BST", 3600, Seq("EUROPE")),
    ("CDT", -18000, Seq("NORTH AMERICA")),
    ("CDT", -14400, Seq("CARIBBEAN")),
    ("CEST", 7200, Seq("EUROPE", "ANTARCTICA")),
    ("CET", 3600, Seq("EUROPE", "AFRICA")),
    ("CST", -21600, Seq("NORTH AMERICA", "CENTRAL AMERICA")),
    ("CST", 28800, Seq("ASIA")),
    ("CST", -18000, Seq("CARIBBEAN")),
    ("EDT", -14400, Seq("NORTH AMERICA", "CARIBBEAN")),
    ("EEST", 10800, Seq("EUROPE", "ASIA", "AFRICA")),
    ("EET", 7200, Seq("EUROPE", "ASIA", "AFRICA")),
    ("EST", -18000, Seq("NORTH AMERICA", "CARIBBEAN", "CENTRAL AMERICA")),
    ("GMT", 0, Seq("EUROPE", "AFRICA", "NORTH AMERICA", "ANTARCTICA")),
    ("HKT", 28800, Seq("ASIA")),
    ("HST", -36000, Seq("NORTH AMERICA", "PACIFIC")),
    ("ICT", 25200, Seq("ASIA")),
    ("IDT", 10800, Seq("ISRAEL")),
    ("IST", 19800, Seq("ASIA")),
    ("IST", 3600, Seq("EUROPE")),
    ("IST", 7200, Seq("ISRAEL")),
    ("JST", 32400, Seq("ASIA")),
    ("KST", 32400, Seq("ASIA")),
    ("MDT", -21600, Seq("NORTH AMERICA")),
    ("MSK", 10800, Seq("EUROPE", "ASIA")),
    ("MST", -25200, Seq("NORTH AMERICA")),
    ("NDT", -9000, Seq("NORTH AMERICA")),
    ("NST", -12600, Seq("NORTH AMERICA")),
    ("NZDT", 46800, Seq("PACIFIC", "ANTARCTICA")),
    ("NZST", 43200, Seq("PACIFIC", "ANTARCTICA")),
    ("PDT", -25200, Seq("NORTH AMERICA")),
    ("PST", -28800, Seq("NORTH AMERICA")),
    ("SGT", 28800, Seq("ASIA")),
    ("UTC", 0, Seq("WORLDWIDE")),
    ("WEST", 3600, Seq("EUROPE", "AFRICA")),
    ("WET", 0, Seq("EUROPE", "AFRICA"))
  )

  // first occurrence per abbreviation (table order), per Date.ecl:1944
  private val firstOffset: Map[String, Int] =
    tzData.foldLeft(Map.empty[String, Int]) { case (m, (ab, off, _)) =>
      if (m.contains(ab)) m else m + (ab -> off)
    }

  // first occurrence per (abbreviation, location)
  private val byLocation: Map[String, Int] =
    tzData.foldLeft(Map.empty[String, Int]) { case (m, (ab, off, locs)) =>
      locs.foldLeft(m) { (m2, loc) =>
        val k = s"$ab|$loc"
        if (m2.contains(k)) m2 else m2 + (k -> off)
      }
    }

  // ---- scalar (driver-side) lookups ---------------------------------------

  /** Seconds east of UTC; None when the abbreviation (or pair) is unknown. */
  def offsetOf(abbrev: String, location: String = ""): Option[Int] = {
    val ab = abbrev.trim.toUpperCase
    if (location.isEmpty) firstOffset.get(ab)
    else byLocation.get(s"$ab|${location.trim.toUpperCase}")
  }

  /** SecondsBetweenTZ (Date.ecl:1981): to-zone offset minus from-zone
    * offset; 0 when either zone is unknown (the reference returns 0 rows
    * from FindTZData and the difference of empty FIRSTs evaluates to 0).
    */
  def secondsBetweenTZ(fromAbbrev: String, toAbbrev: String,
      fromLocation: String = "", toLocation: String = ""): Int =
    (for {
      f <- offsetOf(fromAbbrev, fromLocation)
      t <- offsetOf(toAbbrev, toLocation)
    } yield t - f).getOrElse(0)

  // ---- Column-level lookups (literal-map element_at, codegen'd) -----------

  private lazy val firstOffsetLit: Column = typedlit(firstOffset)
  private lazy val byLocationLit: Column = typedlit(byLocation)

  /** Column lookup with the same first-match contract; null when unknown. */
  def tzOffset(abbrev: Column, location: Column = lit("")): Column = {
    val ab = upper(trim(abbrev))
    val loc = upper(trim(location))
    when(loc === "", element_at(firstOffsetLit, ab))
      .otherwise(element_at(byLocationLit, concat_ws("|", ab, loc)))
  }

  /** SecondsBetweenTZ over columns; 0 when either zone is unknown. */
  def secondsBetweenTZ(fromAbbrev: Column, toAbbrev: Column,
      fromLocation: Column, toLocation: Column): Column =
    coalesce(tzOffset(toAbbrev, toLocation) - tzOffset(fromAbbrev, fromLocation),
      lit(0))

  /** AdjustTimeTZ (Date.ecl:2029): shift a Time_t between zones, wrapping
    * mod 24h like the reference's AdjustTime normalization.
    */
  def adjustTimeTZ(time: Column, fromAbbrev: Column, toAbbrev: Column,
      fromLocation: Column = lit(""), toLocation: Column = lit("")): Column =
    StdDate.adjustTime(time, secondDelta =
      secondsBetweenTZ(fromAbbrev, toAbbrev, fromLocation, toLocation))

  /** ToLocalTime (Date.ecl:2061): UTC Time_t → zone-local Time_t. */
  def toLocalTime(utcTime: Column, toAbbrev: Column,
      toLocation: Column = lit("")): Column =
    adjustTimeTZ(utcTime, lit("UTC"), toAbbrev, toLocation = toLocation)

  /** ToUTCTime (Date.ecl:2084): zone-local Time_t → UTC Time_t. */
  def toUTCTime(localTime: Column, fromAbbrev: Column,
      fromLocation: Column = lit("")): Column =
    adjustTimeTZ(localTime, fromAbbrev, lit("UTC"),
      fromLocation = fromLocation)

  // ---- dataset forms (Date.ecl:1908 TZDataForLocation, :1944 FindTZData) --

  /** The zone table as rows (tz_abbrev, seconds_offset, location) — one row
    * per (abbrev, location) pair, preserving table order via tz_rank so
    * FIRST-match queries stay expressible.
    */
  def tzDataFrame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    tzData.zipWithIndex.flatMap { case ((ab, off, locs), i) =>
      locs.map(loc => (ab, off, loc, i))
    }.toDF("tz_abbrev", "seconds_offset", "location", "tz_rank")
  }

  /** TZDataForLocation: every zone observed in a location. */
  def tzDataForLocation(spark: SparkSession, location: String): DataFrame =
    tzDataFrame(spark)
      .filter(upper(col("location")) === location.trim.toUpperCase)

  /** FindTZData: zones matching an abbreviation (optionally a location). */
  def findTZData(spark: SparkSession, abbrev: String,
      location: String = ""): DataFrame = {
    val base = tzDataFrame(spark)
      .filter(upper(col("tz_abbrev")) === abbrev.trim.toUpperCase)
    if (location.isEmpty) base
    else base.filter(upper(col("location")) === location.trim.toUpperCase)
  }

  /** UniqueTZAbbreviations (Date.ecl:1852). */
  def uniqueTZAbbreviations(spark: SparkSession): DataFrame =
    tzDataFrame(spark).select(col("tz_abbrev")).distinct()

  /** UniqueTZLocations (Date.ecl:1864): uppercase location names. */
  def uniqueTZLocations(spark: SparkSession): DataFrame =
    tzDataFrame(spark).select(upper(col("location")).as("name")).distinct()

  /** Shared spine of AppendTZOffset/AppendTZAdjustedTime (Date.ecl:2166,
    * 2292): LEFT join the input against the zone table on the row's
    * abbreviation (and location when a location column is named) — the
    * zone table is tiny and constant, so the join is an explicit
    * broadcast; the destination zone resolves ONCE (driver-side read of a
    * handful of constant rows, the macro's "find destination just once").
    * Returns (joined-with-dim frame, dim offset col, dest offset,
    * dest location, dest found).
    */
  private def tzJoin(in: DataFrame, tzAbbrevCol: String,
      fromLocationCol: String, toAbbrev: String, toLocation: String)
      : (DataFrame, Column, Int, String, Boolean) = {
    val spark = in.sparkSession
    val dest = findTZData(spark, toAbbrev, toLocation)
      .orderBy(col("tz_rank")).limit(1).collect().headOption
    val dOff = dest.map(_.getInt(1)).getOrElse(0)
    val dLoc = if (toLocation.nonEmpty) toLocation
      else dest.map(_.getString(2)).getOrElse("")
    val tz0 = tzDataFrame(spark)
    // abbrev-only matches take the zone table's FIRST row for the abbrev
    // (TZ_DATA is one row per abbrev; the flattened frame re-derives that
    // via min tz_rank) so the join can't multiply input rows
    val dim =
      if (fromLocationCol.isEmpty)
        tz0.groupBy(col("tz_abbrev"))
          .agg(min_by(struct(col("seconds_offset"), col("location")),
            col("tz_rank")).as("r"))
          .select(col("tz_abbrev"), col("r.seconds_offset").as("seconds_offset"),
            col("r.location").as("location"))
      else tz0.select(col("tz_abbrev"), col("seconds_offset"), col("location"))
    val cond = upper(in(tzAbbrevCol)) === upper(dim("tz_abbrev")) &&
      (if (fromLocationCol.isEmpty) lit(true)
       else upper(in(fromLocationCol)) === upper(dim("location")))
    val joined = in.join(broadcast(dim),
      if (dest.isEmpty) lit(false) else cond, "left")
    (joined, dim("seconds_offset"), dOff, dLoc, dest.nonEmpty)
  }

  /** AppendTZOffset (Date.ecl:2166): append per row the seconds to add to
    * move from the row's zone to the destination zone, plus the macro's
    * `<new>_is_valid` / `<new>_tz` / `<new>_location` companions.
    */
  def appendTZOffset(in: DataFrame, tzAbbrevCol: String, newCol: String,
      fromLocationCol: String = "", toAbbrev: String = "UTC",
      toLocation: String = ""): DataFrame = {
    val (j, srcOff, dOff, dLoc, found) =
      tzJoin(in, tzAbbrevCol, fromLocationCol, toAbbrev, toLocation)
    val valid = srcOff.isNotNull
    j.select(in.columns.map(in(_)) ++ Seq(
      when(valid, lit(dOff) - srcOff).otherwise(0).cast("int").as(newCol),
      valid.as(s"${newCol}_is_valid"),
      when(valid, lit(if (found) toAbbrev else "")).otherwise("")
        .as(s"${newCol}_tz"),
      when(valid, lit(dLoc)).otherwise("").as(s"${newCol}_location")): _*)
  }

  /** AppendTZAdjustedTime (Date.ecl:2292): append the row's Time_t
    * re-expressed in the destination zone (invalid rows keep the original
    * time, per the macro's IF).
    */
  def appendTZAdjustedTime(in: DataFrame, timeCol: String,
      tzAbbrevCol: String, newCol: String, fromLocationCol: String = "",
      toAbbrev: String = "UTC", toLocation: String = ""): DataFrame = {
    val (j, srcOff, dOff, dLoc, found) =
      tzJoin(in, tzAbbrevCol, fromLocationCol, toAbbrev, toLocation)
    val valid = srcOff.isNotNull
    val adjusted = StdDate.adjustTimeBySeconds(in(timeCol), lit(dOff) - srcOff)
    j.select(in.columns.map(in(_)) ++ Seq(
      when(valid, adjusted).otherwise(in(timeCol)).cast("int").as(newCol),
      valid.as(s"${newCol}_is_valid"),
      when(valid, lit(if (found) toAbbrev else "")).otherwise("")
        .as(s"${newCol}_tz"),
      when(valid, lit(dLoc)).otherwise("").as(s"${newCol}_location")): _*)
  }
}

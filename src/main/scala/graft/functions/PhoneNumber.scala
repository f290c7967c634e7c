package graft.functions

/** Phone-number parsing — the phonenumber plugin analog
  * (ref `plugins/phonenumber/lib_phonenumber.ecllib:23-66`, which wraps
  * Google libphonenumber). The reference's value is a DATA dependency
  * (libphonenumber's region metadata), not an algorithm; this analog
  * implements the same documented parse pipeline — punctuation stripping,
  * `+` / IDD / trunk-prefix resolution, country-code extraction, ITU
  * length gates, per-region validity + line-type classification, E.164
  * formatting — over a built-in metadata table for a documented region
  * subset (public numbering-plan facts: NANP, GB, DE, FR, ES, IT, AU, IN,
  * BR, JP). Unknown country codes surface as
  * `INVALID_COUNTRY_CODE_ERROR`, exactly like the reference when metadata
  * is missing.
  *
  * Enum values mirror `phonenumber_type` / `phonenumber_error`
  * (lib_phonenumber.ecllib:23-45) so result columns compare 1:1.
  */
object PhoneNumber {

  // phonenumber_type (ecllib:23-36)
  val FIXED_LINE = 0; val MOBILE = 1; val FIXED_LINE_OR_MOBILE = 2
  val TOLL_FREE = 3; val PREMIUM_RATE = 4; val SHARED_COST = 5
  val VOIP = 6; val PERSONAL_NUMBER = 7; val PAGER = 8; val UAN = 9
  val VOICEMAIL = 10; val UNKNOWN = 11

  // phonenumber_error (ecllib:38-45)
  val NO_PARSING_ERROR = 0; val INVALID_COUNTRY_CODE_ERROR = 1
  val NOT_A_NUMBER = 2; val TOO_SHORT_AFTER_IDD = 3
  val TOO_SHORT_NSN = 4; val TOO_LONG_NSN = 5

  final case class Parsed(number: String, error: Int, valid: Boolean,
      lineType: Int, regionCode: String, countryCode: Int)

  /** Per-region metadata: country code, trunk prefix dropped from national
    * dialing, IDD prefix, NSN length range, and (category, regex) rules in
    * priority order. Patterns are simplified public numbering-plan facts —
    * a subset, as documented above.
    */
  private final case class Region(code: String, cc: Int, trunk: String,
      idd: String, minLen: Int, maxLen: Int, rules: Seq[(Int, String)])

  private val regions: Seq[Region] = Seq(
    // NANP: shared cc 1, trunk prefix '1', IDD 011; 10-digit NXXNXXXXXX
    Region("US", 1, "1", "011", 10, 10, Seq(
      TOLL_FREE -> "8(00|33|44|55|66|77|88)[2-9]\\d{6}",
      PREMIUM_RATE -> "900[2-9]\\d{6}",
      PERSONAL_NUMBER -> "5(00|33|44|66|77|88)\\d{7}",
      FIXED_LINE_OR_MOBILE -> "[2-9]\\d{2}[2-9]\\d{6}")),
    Region("GB", 44, "0", "00", 9, 10, Seq(
      TOLL_FREE -> "80(0\\d{6}|8\\d{7})",
      PREMIUM_RATE -> "9[018]\\d{8}",
      MOBILE -> "7[4-9]\\d{8}",
      PAGER -> "76\\d{8}",
      PERSONAL_NUMBER -> "70\\d{8}",
      VOIP -> "56\\d{8}",
      SHARED_COST -> "84[2-5]\\d{7}",
      UAN -> "(3[0347]|55)\\d{8}",
      FIXED_LINE -> "[12]\\d{8,9}")),
    Region("DE", 49, "0", "00", 6, 11, Seq(
      TOLL_FREE -> "800\\d{7,9}",
      PREMIUM_RATE -> "(900|137\\d)\\d{6,7}",
      MOBILE -> "1(5\\d{9}|6[023]\\d{7,8}|7[0-57-9]\\d{7,8})",
      VOIP -> "32\\d{9,11}",
      UAN -> "18[0-5]\\d{6,9}",
      FIXED_LINE -> "[2-9]\\d{5,10}")),
    Region("FR", 33, "0", "00", 9, 9, Seq(
      TOLL_FREE -> "80[0-5]\\d{6}",
      SHARED_COST -> "8(1[01]|2[0156])\\d{6}",
      PREMIUM_RATE -> "8(9[1-37-9]|99)\\d{6}",
      MOBILE -> "[67]\\d{8}",
      VOIP -> "9\\d{8}",
      FIXED_LINE -> "[1-5]\\d{8}")),
    Region("ES", 34, "", "00", 9, 9, Seq(
      TOLL_FREE -> "[89]00\\d{6}",
      PREMIUM_RATE -> "80[367]\\d{6}",
      MOBILE -> "[67]\\d{8}",
      FIXED_LINE -> "[89][1-8]\\d{7}")),
    // Italy keeps the leading 0 in the NSN (no trunk drop) — the classic
    // metadata edge the parse pipeline must thread through
    Region("IT", 39, "", "00", 6, 11, Seq(
      TOLL_FREE -> "80(0\\d{6}|3\\d{3})",
      PREMIUM_RATE -> "(089|16\\d|89[457])\\d{4,7}",
      MOBILE -> "3[1-9]\\d{8}|3[2-9]\\d{7}",
      VOIP -> "55\\d{8}",
      FIXED_LINE -> "0\\d{5,10}")),
    Region("AU", 61, "0", "0011", 5, 10, Seq(
      TOLL_FREE -> "180(0\\d{6}|\\d{4})",
      PREMIUM_RATE -> "190[0-26]\\d{6}",
      SHARED_COST -> "13(00\\d{6}|\\d{4})",
      MOBILE -> "4\\d{8}",
      FIXED_LINE -> "[2378]\\d{8}")),
    Region("IN", 91, "0", "00", 10, 10, Seq(
      TOLL_FREE -> "1800\\d{6}",
      PREMIUM_RATE -> "186[12]\\d{6}",
      MOBILE -> "[6-9]\\d{9}",
      FIXED_LINE -> "[1-5]\\d{9}")),
    Region("BR", 55, "0", "00", 10, 11, Seq(
      TOLL_FREE -> "800\\d{6,7}",
      PREMIUM_RATE -> "[359]00\\d{6,7}",
      MOBILE -> "[1-9]{2}9\\d{8}|[1-9]{2}[6-9]\\d{7}",
      FIXED_LINE -> "[1-9]{2}[2-5]\\d{7}")),
    Region("JP", 81, "0", "010", 8, 10, Seq(
      TOLL_FREE -> "120\\d{6}|800\\d{7}",
      PREMIUM_RATE -> "990\\d{6}",
      MOBILE -> "[789]0\\d{8}",
      VOIP -> "50\\d{8}",
      PAGER -> "20\\d{8}",
      FIXED_LINE -> "[1-9]\\d{8}")))

  /** Canada shares cc 1: region resolution needs the area-code split
    * (public NANP assignment; a stable subset).
    */
  private val caAreaCodes = Set(
    "204", "226", "236", "249", "250", "289", "306", "343", "365", "367",
    "403", "416", "418", "431", "437", "438", "450", "506", "514", "519",
    "548", "579", "581", "587", "604", "613", "639", "647", "672", "705",
    "709", "778", "780", "782", "807", "819", "825", "867", "873", "902",
    "905")

  private val byCode: Map[String, Region] =
    regions.map(r => r.code -> r).toMap +
      ("CA" -> regions.head.copy(code = "CA"))
  private val byCc: Map[Int, Region] = regions.map(r => r.cc -> r).toMap

  /** ITU-T E.164 global bounds on a national significant number. */
  private val ItuMin = 2
  private val ItuMax = 15

  /** `parsePhoneNumber(phonenumber, countryCode)`
    * (lib_phonenumber.ecllib:64,66): the default-region code steers IDD
    * and trunk handling exactly as libphonenumber's documented pipeline.
    */
  def parse(raw: String, defaultRegion: String): Parsed = {
    val fail = (e: Int) => Parsed(raw.trim, e, valid = false, UNKNOWN, "", 0)
    val cleaned = raw.trim.replaceAll("[\\s().\\-/]", "")
    if (!cleaned.matches("\\+?\\d+")) return fail(NOT_A_NUMBER)
    val home = byCode.get(defaultRegion.trim.toUpperCase)

    // resolve the country code: '+' prefix, then the region's IDD, then
    // national dialing in the default region
    val (ccOpt, rest): (Option[Int], String) =
      if (cleaned.startsWith("+")) extractCc(cleaned.drop(1))
      else home match {
        case Some(h) if cleaned.startsWith(h.idd) =>
          val afterIdd = cleaned.drop(h.idd.length)
          if (afterIdd.length < ItuMin)
            return fail(TOO_SHORT_AFTER_IDD)
          extractCc(afterIdd)
        case Some(h) =>
          val nsn = if (h.trunk.nonEmpty && cleaned.startsWith(h.trunk))
            cleaned.drop(h.trunk.length) else cleaned
          (Some(h.cc), nsn)
        case None => return fail(INVALID_COUNTRY_CODE_ERROR)
      }

    val cc = ccOpt match {
      case Some(c) => c
      case None => return fail(INVALID_COUNTRY_CODE_ERROR)
    }
    val region = byCc.get(cc) match {
      case Some(r) => r
      case None => return fail(INVALID_COUNTRY_CODE_ERROR)
    }
    if (rest.length < ItuMin || rest.length < region.minLen)
      return Parsed(rest, TOO_SHORT_NSN, valid = false, UNKNOWN, "", cc)
    if (rest.length > ItuMax || rest.length > region.maxLen)
      return Parsed(rest, TOO_LONG_NSN, valid = false, UNKNOWN, "", cc)

    val lineType = region.rules
      .find { case (_, rx) => rest.matches(rx) }
      .map(_._1).getOrElse(UNKNOWN)
    val valid = lineType != UNKNOWN
    val regionCode =
      if (cc == 1) { if (caAreaCodes(rest.take(3))) "CA" else "US" }
      else region.code
    Parsed(if (valid) s"+$cc$rest" else rest,
      NO_PARSING_ERROR, valid, lineType,
      if (valid) regionCode else "", cc)
  }

  /** Longest-match country-code extraction (1–3 digits) against the
    * metadata table — libphonenumber's documented strategy.
    */
  private def extractCc(digits: String): (Option[Int], String) =
    (3 to 1 by -1).flatMap { n =>
      if (digits.length > n) {
        val cc = digits.take(n).toInt
        byCc.get(cc).map(_ => (Some(cc), digits.drop(n)))
      } else None
    }.headOption.getOrElse((None, digits))

  // ---- Spark Column surface (UDF: regex-table dispatch per row) ----------

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.udf

  private lazy val parseUdf = udf((s: String, region: String) => {
    val p = parse(s, region)
    (p.number, p.error, p.valid, p.lineType, p.regionCode, p.countryCode)
  })

  /** Struct column (number, error, valid, line_type, region_code,
    * country_code) — explode with `.select(col("p.*"))`.
    */
  def parseCol(number: Column, region: Column): Column =
    parseUdf(number, region)
}

package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Std.Str surface (ref `ecllibrary/std/Str.ecl`), re-expressed as composed
  * built-in Column functions so everything stays inside whole-stage codegen.
  * Pattern/filter/separator arguments are literal Strings (as in ECL, where
  * they are almost always compile-time constants) — this lets us translate
  * wildcards/character classes to regexes at plan-build time instead of per
  * row. Edge-case semantics mirror the `ecllibrary/teststd/str` tests and are
  * asserted in StdStrSpec.
  */
object StdStr {

  private def quoted(s: String): String = if (s.isEmpty) "" else Pattern.quote(s)

  /** Character class matching any char of `s` (safe for regex metachars). */
  private def charClass(s: String, negate: Boolean): String =
    "[" + (if (negate) "^" else "") + quoted(s) + "]"

  // ---- comparison ----------------------------------------------------------

  /** Std.Str.CompareIgnoreCase: -1/0/1 with ECL trailing-space-blind,
    * case-blind ordering (`Str.ecl:31`). */
  def compareIgnoreCase(a: Column, b: Column): Column = {
    val (ka, kb) = (lower(rtrim(a)), lower(rtrim(b)))
    when(ka < kb, -1).when(ka > kb, 1).otherwise(0)
  }

  /** Std.Str.EqualIgnoreCase (`Str.ecl:42`). */
  def equalIgnoreCase(a: Column, b: Column): Column =
    lower(rtrim(a)) === lower(rtrim(b))

  // ---- wildcard / containment ---------------------------------------------

  /** Std.Str.WildMatch (`Str.ecl:75`): whole-string match where `?` is any
    * one char and `*` any run. No trimming (teststd TestWildMatch Test17);
    * an empty pattern matches only the empty string (Test16).
    */
  def wildMatch(src: Column, pattern: String, ignoreCase: Boolean): Column = {
    val body = pattern.map {
      case '*' => ".*"
      case '?' => "."
      case c   => Pattern.quote(c.toString)
    }.mkString
    val rx = (if (ignoreCase) "(?is)" else "(?s)") + "^" + body + "$"
    src.rlike(rx)
  }

  /** Std.Str.Contains (`Str.ecl:87`): multiset containment — every char of
    * `pattern` must appear in `src`, duplicates requiring duplicate matches
    * (teststd TestContains Test02/Test04). Empty pattern is always true.
    */
  def strContains(src: Column, pattern: String, ignoreCase: Boolean): Column = {
    val folded = if (ignoreCase) pattern.toLowerCase else pattern
    val s = if (ignoreCase) lower(src) else src
    folded.groupBy(identity).map { case (ch, occ) =>
      // count of ch in src = len(src) - len(src with ch removed)
      (length(s) - length(regexp_replace(s, quoted(ch.toString), ""))) >= occ.length
    }.foldLeft(lit(true))(_ && _)
  }

  // ---- substitution --------------------------------------------------------

  /** Std.Str.SubstituteIncluded (`Str.ecl:121`): chars IN `filter` become
    * `replaceChar`. */
  def substituteIncluded(src: Column, filter: String, replaceChar: String): Column =
    if (filter.isEmpty) src
    else regexp_replace(src, charClass(filter, negate = false),
      java.util.regex.Matcher.quoteReplacement(replaceChar))

  /** Std.Str.SubstituteExcluded (`Str.ecl:135`): chars NOT in `filter`
    * become `replaceChar`. */
  def substituteExcluded(src: Column, filter: String, replaceChar: String): Column =
    regexp_replace(src, charClass(filter, negate = true),
      java.util.regex.Matcher.quoteReplacement(replaceChar))

  /** Std.Str.FindReplace (`Str.ecl:205`): literal substring replace. */
  def findReplace(src: Column, sought: String, replacement: String): Column =
    regexp_replace(src, quoted(sought),
      java.util.regex.Matcher.quoteReplacement(replacement))

  // ---- case conversion -----------------------------------------------------

  /** Tokens = alternating runs of [A-Za-z0-9] and single other chars; the
    * zero-width lookaround split keeps delimiters so the original spacing
    * and punctuation survive re-joining. (ECL "words" are alnum runs —
    * `Str.ecl:170-190`.)
    */
  private def mapWords(src: Column)(f: Column => Column): Column =
    array_join(transform(
      split(src, "(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"),
      t => when(t.rlike("^[A-Za-z0-9]"), f(t)).otherwise(t)), "")

  /** Std.Str.ToCapitalCase (`Str.ecl:176`): first letter of each word
    * upper-cased, the REST LEFT AS-IS (TestToCapitalCase Test06). */
  def toCapitalCase(src: Column): Column =
    mapWords(src)(t => concat(upper(t.substr(lit(1), lit(1))), t.substr(lit(2), length(t))))

  /** Std.Str.ToTitleCase (`Str.ecl:186`): first letter upper, rest lower
    * (TestToTitleCase Test06). */
  def toTitleCase(src: Column): Column =
    mapWords(src)(t => concat(upper(t.substr(lit(1), lit(1))), lower(t.substr(lit(2), length(t)))))

  // ---- comma-list extraction ----------------------------------------------

  /** Std.Str.Extract (`Str.ecl:215`): nth (1-based) element of a comma
    * separated list; out-of-range → empty string (TestExtract). */
  def extract(src: Column, instance: Int): Column =
    if (instance < 1) lit("")
    else coalesce(get(split(src, ",", -1), lit(instance - 1)), lit(""))

  /** Std.Str.ExtractMultiple (`Str.ecl:266`): comma-join of the elements
    * whose bit is set in `mask` (bit 0 = item 1). */
  def extractMultiple(src: Column, mask: Long): Column = {
    val parts = split(src, ",", -1)
    val picked = (0 until 64).filter(i => (mask & (1L << i)) != 0)
      .map(i => get(parts, lit(i)))
    if (picked.isEmpty) lit("") else concat_ws(",", picked: _*)
  }

  // ---- prefix / suffix -----------------------------------------------------

  /** Std.Str.StartsWith (`Str.ecl:236`): prefix is right-trimmed first. */
  def startsWith(src: Column, prefix: Column): Column =
    src.startsWith(rtrim(prefix))

  /** Std.Str.EndsWith (`Str.ecl:245`): both sides right-trimmed. */
  def endsWith(src: Column, suffix: Column): Column =
    rtrim(src).endsWith(rtrim(suffix))

  /** Std.Str.RemoveSuffix (`Str.ecl:255`). */
  def removeSuffix(src: Column, suffix: Column): Column =
    when(endsWith(src, suffix),
      rtrim(src).substr(lit(1), length(rtrim(src)) - length(rtrim(suffix))))
    .otherwise(src)

  /** Std.Str.CommonPrefix (`Str.ecl:466`): longest shared prefix, returned
    * in the FIRST argument's case when `nocase` (TestCommonPrefix Test10).
    * Pure-Column scan: first mismatching position via array_position over a
    * per-char equality vector.
    */
  def commonPrefix(a: Column, b: Column, nocase: Boolean = false): Column = {
    val (ca, cb) = if (nocase) (lower(a), lower(b)) else (a, b)
    val n = least(length(a), length(b))
    val idxs = when(n >= 1, sequence(lit(1), n))
      .otherwise(lit(Array.emptyIntArray))
    val eqs = transform(idxs, i => ca.substr(i, lit(1)) === cb.substr(i, lit(1)))
    val firstNe = array_position(eqs, lit(false))
    val plen = when(firstNe > 0, firstNe - 1).otherwise(n.cast("long"))
    a.substr(lit(1), plen.cast("int"))
  }

  /** Std.Str.CommonSuffix (`Str.ecl:479`): prefix of the reversals. */
  def commonSuffix(a: Column, b: Column, nocase: Boolean = false): Column =
    reverse(commonPrefix(reverse(a), reverse(b), nocase))

  // ---- separator-delimited words (CountWords/SplitWords family) ------------

  private def sepParts(src: Column, separator: String, allowBlank: Boolean): Column = {
    val parts =
      if (separator.isEmpty) array(src)
      else split(src, quoted(separator), -1)
    if (allowBlank) parts else filter(parts, _ =!= "")
  }

  /** Std.Str.CountWords (`Str.ecl:277`): words separated by the exact
    * `separator` string; blanks dropped unless allowBlank. */
  def countWords(src: Column, separator: String, allowBlank: Boolean = false): Column =
    when(length(src) === 0, 0).otherwise(size(sepParts(src, separator, allowBlank)))

  /** Std.Str.SplitWords (`Str.ecl:288`): the words as an array column. */
  def splitWords(src: Column, separator: String, allowBlank: Boolean = false): Column =
    when(length(src) === 0, lit(Array.empty[String]))
      .otherwise(sepParts(src, separator, allowBlank))

  /** Std.Str.CombineWords (`Str.ecl:299`). */
  def combineWords(words: Column, separator: String): Column =
    array_join(words, separator)

  // ---- whitespace words (WordCount/GetNthWord family) ----------------------

  private def wsWords(text: Column): Column =
    filter(split(text, "\\s+"), _ =!= "")

  /** Std.Str.WordCount (`Str.ecl:337`): whitespace-delimited word count. */
  def wordCount(text: Column): Column = size(wsWords(text))

  /** Std.Str.GetNthWord (`Str.ecl:348`): nth whitespace word, '' if out of
    * range (TestGetNthWord). */
  def getNthWord(text: Column, n: Int): Column =
    if (n < 1) lit("") else coalesce(get(wsWords(text), lit(n - 1)), lit(""))

  /** Std.Str.ExcludeNthWord (`Str.ecl:380`): drop word n and its trailing
    * whitespace; word 1 also drops leading whitespace (TestExcludeNthWord
    * Test15/Test18). Anchored regex ⇒ single replacement. */
  def excludeNthWord(text: Column, n: Int): Column =
    if (n < 1) text
    else if (n == 1) regexp_replace(text, "^\\s*\\S+\\s*", "")
    else regexp_replace(text, s"^((?:\\s*\\S+){${n - 1}}\\s+)\\S+\\s*", "$1")

  /** Std.Str.ExcludeFirstWord (`Str.ecl:359`). */
  def excludeFirstWord(text: Column): Column = excludeNthWord(text, 1)

  /** Std.Str.ExcludeLastWord (`Str.ecl:369`): drop the last word and its
    * trailing spaces; a lone word also loses its leading spaces
    * (TestExcludeLastWord Test11/Test15). */
  def excludeLastWord(text: Column): Column =
    regexp_replace(text, "^\\s*\\S+\\s*$|\\S+\\s*$", "")

  /** Std.Str.FindWord (`Str.ecl:390`): whole-word membership. */
  def findWord(src: Column, word: Column, ignoreCase: Boolean = false): Column =
    if (ignoreCase) array_contains(transform(wsWords(src), lower(_)), lower(word))
    else array_contains(wsWords(src), word)

  /** Std.Str.EditDistanceWithinRadius (`Str.ecl:326`); EditDistance itself
    * is the built-in codegen'd levenshtein. */
  def editDistanceWithinRadius(a: Column, b: Column, radius: Int): Column =
    levenshtein(rtrim(a), rtrim(b)) <= radius

  // ---- binary renderings ---------------------------------------------------

  /** Std.Str.ToHexPairs (`Str.ecl:413`): uppercase hex pairs of raw bytes. */
  def toHexPairs(data: Column): Column = hex(data)

  /** Std.Str.FromHexPairs (`Str.ecl:426`). */
  def fromHexPairs(hexPairs: Column): Column = unhex(hexPairs)

  /** Std.Str.EncodeBase64 (`Str.ecl:440`): optional MIME line folding
    * (LF every 76 chars) to match the reference's stream encoder. Spark's
    * own `base64` may emit CRLF MIME chunking — normalize to unchunked
    * first so the folding (and its absence) is ours.
    */
  def encodeBase64(data: Column, insertLF: Boolean = true): Column = {
    val b = regexp_replace(base64(data), "[\\r\\n]", "")
    if (!insertLF) b
    else rtrim(regexp_replace(b, "(.{76})", "$1\n"), "\n")
  }

  /** Std.Str.DecodeBase64 (`Str.ecl:453`). */
  def decodeBase64(value: Column): Column =
    unbase64(regexp_replace(value, "\\s", ""))

  // ---- r18 parity audit: remaining Str.ecl exports. Each is a named
  // surface over the codegen'd builtin (or EclFunctions helper) that
  // already carried the semantics, so the full Str.ecl export list
  // resolves 1:1 to a Scala def (COVERAGE.md parity table). -----------------

  /** Std.Str.EditDistance (`Str.ecl:313`, EditDistanceV3 with radius 0 =
    * unbounded): Levenshtein on trailing-space-trimmed operands (ECL string
    * compares are trailing-space-blind).
    */
  def editDistance(a: Column, b: Column): Column =
    levenshtein(rtrim(a), rtrim(b))

  /** Std.Str.Find (`Str.ecl:54`): 1-based position of the nth
    * NON-OVERLAPPING occurrence (`slStringFind` skips hitLen after a match,
    * `plugins/stringlib/stringlib.cpp:519`), 0 when absent. `instance` is a
    * plan-time literal, so the scan unrolls to `instance` chained `locate`
    * calls — all codegen'd, no UDF.
    */
  def find(src: Column, sought: String, instance: Int = 1): Column = {
    require(instance >= 1, s"find: instance must be >= 1, got $instance")
    if (sought.isEmpty) lit(0)
    else {
      val first = locate(sought, src)
      (2 to instance).foldLeft(first) { (pos, _) =>
        // locate's Int-position overload can't take a Column start, so the
        // chained step searches the remainder and re-bases the hit
        val start = pos + sought.length
        val p = locate(sought, src.substr(start, length(src)))
        when(pos === 0 || p === 0, 0).otherwise(p + start - 1)
      }
    }
  }

  /** Std.Str.FindCount (`Str.ecl:64`): non-overlapping occurrence count. */
  def findCount(src: Column, sought: String): Column =
    EclFunctions.findCount(src, sought)

  /** Std.Str.CleanSpaces (`Str.ecl:225`). */
  def cleanSpaces(src: Column): Column = EclFunctions.cleanSpaces(src)

  /** Std.Str.Filter (`Str.ecl:108`): keep only chars in `keep`. (Named
    * strFilter — a bare `filter` would shadow functions.filter in-file.)
    */
  def strFilter(src: Column, keep: String): Column =
    EclFunctions.strFilter(src, keep)

  /** Std.Str.FilterOut (`Str.ecl:98`). */
  def strFilterOut(src: Column, drop: String): Column =
    EclFunctions.strFilterOut(src, drop)

  /** Std.Str.Translate (`Str.ecl:149`): per-char mapping; when the lengths
    * differ the reference installs the IDENTITY map and returns the input
    * unchanged (`slStringTranslate`, stringlib.cpp:469) — Spark's builtin
    * would instead DELETE unmapped chars, so the guard is load-bearing.
    */
  def strTranslate(src: Column, within: String, mapping: String): Column =
    if (within.length != mapping.length) src
    else translate(src, within, mapping)

  /** Std.Str.Reverse (`Str.ecl:195`). */
  def strReverse(src: Column): Column = reverse(src)

  /** Std.Str.Repeat (`Str.ecl:404`). */
  def strRepeat(src: Column, n: Int): Column =
    if (n <= 0) lit("") else repeat(src, n)

  /** Std.Str.ToLowerCase / ToUpperCase (`Str.ecl:162,172`). */
  def toLowerCase(src: Column): Column = lower(src)
  def toUpperCase(src: Column): Column = upper(src)
}

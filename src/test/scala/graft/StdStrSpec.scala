package graft

import graft.functions.StdStr
import graft.functions.StdStr._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Std.Str semantics, edge cases ported from the reference's own suite
  * (`ecllibrary/teststd/str/Test*.ecl`): WildMatch does no trimming and an
  * empty pattern matches only '', Contains is multiset containment, Extract
  * never trims list elements, ToCapitalCase leaves the rest of each word
  * alone (ToTitleCase lowers it), word exclusion eats trailing whitespace.
  */
class StdStrSpec extends SparkSpec {
  import spark.implicits._

  private def str(c: Column): String =
    Seq("x").toDF("d").select(c.cast("string")).head.getString(0)
  private def bool(c: Column): Boolean =
    Seq("x").toDF("d").select(c).head.getBoolean(0)
  private def int(c: Column): Int =
    Seq("x").toDF("d").select(c.cast("int")).head.getInt(0)

  // ---- WildMatch (TestWildMatch) ------------------------------------------

  test("wildMatch: * and ? wildcards, anchored whole-string") {
    val s = lit("ABCDEFGHIJKLMN")
    assert(bool(wildMatch(s, "AB*MN", ignoreCase = false)))          // Test01
    assert(bool(wildMatch(s, "A?C*MN", ignoreCase = false)))         // Test02
    assert(bool(wildMatch(s, "A*B*C*MN", ignoreCase = false)))       // Test03
    assert(bool(wildMatch(s, "??????????????", ignoreCase = false))) // Test10
    assert(bool(wildMatch(s, "*", ignoreCase = false)))              // Test15
    assert(!bool(wildMatch(s, "ABCDEFGHIJKLM", ignoreCase = false))) // Test20
    assert(!bool(wildMatch(s, "BCDEFGHIJKLMN", ignoreCase = false))) // Test21
  }

  test("wildMatch: no trimming; empty pattern matches only empty string") {
    val padded = lit("ABCDEFGHIJKLMN ")
    assert(!bool(wildMatch(padded, "ABC**MN", ignoreCase = false)))  // Test17
    assert(bool(wildMatch(padded, "A?C?E?G?I?K?M??", ignoreCase = false))) // Test05
    assert(!bool(wildMatch(lit("ABCDEFGHIJKLMN"), "", ignoreCase = false))) // Test16
    assert(bool(wildMatch(lit(""), "", ignoreCase = false)))         // Test27
    assert(bool(wildMatch(lit(""), "*", ignoreCase = false)))        // Test28
    assert(!bool(wildMatch(lit(""), "?", ignoreCase = false)))       // Test29
  }

  test("wildMatch: metachars in source are literal; ignoreCase flag") {
    assert(bool(wildMatch(lit("A*C"), "A?C", ignoreCase = false)))   // Test23
    assert(bool(wildMatch(lit("A?C"), "A*C", ignoreCase = false)))   // Test24
    assert(!bool(wildMatch(lit("ABCDEF"), "abcdef", ignoreCase = false))) // Test19a
    assert(bool(wildMatch(lit("ABCDEF"), "abcdef", ignoreCase = true)))   // Test19b
  }

  // ---- Contains (TestContains): multiset containment ----------------------

  test("strContains: duplicate chars require duplicate occurrences") {
    val s = lit("ABCDEF ABCDEF")
    assert(bool(strContains(s, "AA", ignoreCase = false)))           // Test02
    assert(!bool(strContains(s, "AAA", ignoreCase = false)))         // Test04
    assert(bool(strContains(s, "FEDC", ignoreCase = false)))         // Test05
    assert(bool(strContains(lit("abcdef"), "A", ignoreCase = true))) // Test06
    assert(!bool(strContains(lit("abcdef"), "A", ignoreCase = false))) // Test08
    assert(bool(strContains(lit("x"), "", ignoreCase = false)))      // Test10
  }

  // ---- Extract (TestExtract): untrimmed comma-list indexing ---------------

  test("extract: 1-based, untrimmed, empty out of range") {
    assert(str(StdStr.extract(lit("a,b,c,d"), 1)) == "a")                   // Test01
    assert(str(StdStr.extract(lit("a,b,c,d"), 0)) == "")                    // Test02
    assert(str(StdStr.extract(lit("a,b,c,d"), 5)) == "")                    // Test04
    assert(str(StdStr.extract(lit(" a , b , c , d "), 1)) == " a ")         // Test07
    assert(str(StdStr.extract(lit(" a ,, c , d "), 2)) == "")               // Test10
    assert(str(StdStr.extract(lit(""), 1)) == "")                           // Test13
    assert(str(StdStr.extract(lit("x"), -1)) == "")                         // Test15
  }

  test("extractMultiple picks items by bitmask") {
    assert(str(extractMultiple(lit("a,b,c,d"), 0x5L)) == "a,c")
    assert(str(extractMultiple(lit("a,b,c,d"), 0L)) == "")
  }

  // ---- case conversion (TestToCapitalCase/TestToTitleCase) ----------------

  test("toCapitalCase uppercases first letter only, rest untouched") {
    assert(str(toCapitalCase(lit(" john doe "))) == " John Doe ")    // Test04
    assert(str(toCapitalCase(lit(" JOHN,DOE "))) == " JOHN,DOE ")    // Test06
    assert(str(toCapitalCase(lit("john-doe"))) == "John-Doe")        // Test07
    assert(str(toCapitalCase(lit("99john 5doe"))) == "99john 5doe")  // Test12
    assert(str(toCapitalCase(lit(""))) == "")                        // Test02
  }

  test("toTitleCase lowers the rest of each word") {
    assert(str(toTitleCase(lit(" JOHN DOE "))) == " John Doe ")
    assert(str(toTitleCase(lit("mIxEd-cAsE"))) == "Mixed-Case")
  }

  // ---- words (TestCountWords/TestGetNthWord/TestExcludeNthWord...) --------

  test("countWords/splitWords: exact separator, blanks dropped by default") {
    assert(int(countWords(lit("a b c"), " ")) == 3)
    assert(int(countWords(lit("a  b"), " ")) == 2)                   // blank dropped
    assert(int(countWords(lit("a  b"), " ", allowBlank = true)) == 3)
    assert(int(countWords(lit(""), " ")) == 0)
    assert(str(combineWords(splitWords(lit("x,y,,z"), ","), "|")) == "x|y|z")
  }

  test("wordCount/getNthWord: whitespace-delimited") {
    assert(int(wordCount(lit("  a\t b  c "))) == 3)
    assert(str(getNthWord(lit("  a\t b  c "), 2)) == "b")
    assert(str(getNthWord(lit("a b"), 3)) == "")
    assert(str(getNthWord(lit("a b"), 0)) == "")
  }

  test("excludeNthWord eats trailing whitespace; word 1 also leading") {
    assert(str(excludeNthWord(lit(" one two three "), 1)) == "two three ")
    assert(str(excludeNthWord(lit(" one two three "), 2)) == " one three ")
    assert(str(excludeNthWord(lit(" one two three "), 3)) == " one two ")
    assert(str(excludeFirstWord(lit("  a b"))) == "b")
    assert(str(excludeLastWord(lit("a b  "))) == "a ")
    assert(str(excludeLastWord(lit("  lone  "))) == "")
  }

  test("findWord: whole-word membership, optional case folding") {
    assert(bool(findWord(lit("the cat sat"), lit("cat"))))
    assert(!bool(findWord(lit("the catalog"), lit("cat"))))
    assert(bool(findWord(lit("The CAT"), lit("cat"), ignoreCase = true)))
  }

  // ---- prefix/suffix (TestCommonPrefix/TestCommonSuffix) ------------------

  test("commonPrefix/commonSuffix, nocase keeps first argument's case") {
    assert(str(commonPrefix(lit("abcdef"), lit("abcxyz"))) == "abc")
    assert(str(commonPrefix(lit("abc"), lit("xyz"))) == "")
    assert(str(commonPrefix(lit("same"), lit("same"))) == "same")
    assert(str(commonPrefix(lit("ABCdef"), lit("abcxyz"), nocase = true)) == "ABC")
    assert(str(commonSuffix(lit("hello world"), lit("old world"))) == " world")
  }

  test("startsWith/endsWith/removeSuffix right-trim their arguments") {
    assert(bool(startsWith(lit("abc def"), lit("abc "))))
    assert(bool(endsWith(lit("abc def  "), lit("def "))))
    assert(str(removeSuffix(lit("file.txt"), lit(".txt"))) == "file")
    assert(str(removeSuffix(lit("file.txt"), lit(".csv"))) == "file.txt")
  }

  // ---- comparison ---------------------------------------------------------

  test("compareIgnoreCase/equalIgnoreCase are trailing-space-blind") {
    assert(int(compareIgnoreCase(lit("ABC  "), lit("abc"))) == 0)
    assert(int(compareIgnoreCase(lit("abc"), lit("abd"))) == -1)
    assert(int(compareIgnoreCase(lit("b"), lit("A"))) == 1)
    assert(bool(equalIgnoreCase(lit("MiXeD "), lit("mixed"))))
  }

  // ---- substitution -------------------------------------------------------

  test("substituteIncluded/Excluded and findReplace") {
    assert(str(substituteIncluded(lit("a-b.c"), "-.", "_")) == "a_b_c")
    assert(str(substituteExcluded(lit("a-b.c"), "abc", "*")) == "a*b*c")
    assert(str(findReplace(lit("a.b.c"), ".", "..")) == "a..b..c")
    assert(str(findReplace(lit("aaa"), "aa", "b")) == "ba")
  }

  // ---- distance / binary renderings ---------------------------------------

  test("editDistanceWithinRadius right-trims then bounds levenshtein") {
    assert(bool(editDistanceWithinRadius(lit("kitten  "), lit("sitting"), 3)))
    assert(!bool(editDistanceWithinRadius(lit("kitten"), lit("sitting"), 2)))
  }

  test("Register exposes std_str_* functions to spark.sql") {
    graft.functions.Register.all(spark)
    val r = spark.sql(
      """SELECT std_str_wildmatch('ABCDEF', 'A*F') AS m,
        |  std_str_wildmatch('ABCDEF', 'abc*', true) AS mi,
        |  std_str_extract('a,b,c', 2) AS e,
        |  std_str_count_words('a b  c', ' ') AS n,
        |  std_str_to_capital_case('john doe') AS cc,
        |  std_str_find_replace('a.b', '.', '-') AS fr,
        |  std_str_common_prefix('abcd', 'abxy') AS cp,
        |  std_str_edit_distance_within_radius('kitten', 'sitting', 3) AS ed
        |""".stripMargin).head
    assert(r.getBoolean(0) && r.getBoolean(1))
    assert(r.getString(2) == "b")
    assert(r.getInt(3) == 3)
    assert(r.getString(4) == "John Doe")
    assert(r.getString(5) == "a-b")
    assert(r.getString(6) == "ab")
    assert(r.getBoolean(7))
  }

  test("hex and base64 renderings round-trip") {
    val raw = encode(lit("CAT!"), "UTF-8")
    assert(str(toHexPairs(raw)) == "43415421")
    assert(str(decode(fromHexPairs(lit("43415421")), "UTF-8")) == "CAT!")
    val long = encode(lit("x" * 100), "UTF-8")
    val enc = str(encodeBase64(long))
    assert(enc.split('\n').head.length == 76)
    assert(str(decode(decodeBase64(encodeBase64(long)), "UTF-8")) == "x" * 100)
    assert(!str(encodeBase64(long, insertLF = false)).contains("\n"))
  }

  // ---- r18 parity additions -------------------------------------------------

  test("find: nth NON-OVERLAPPING occurrence, 0 when exhausted") {
    val s = lit("abcabcabc")
    assert(int(find(s, "abc", 1)) == 1)
    assert(int(find(s, "abc", 2)) == 4)
    assert(int(find(s, "abc", 3)) == 7)
    assert(int(find(s, "abc", 4)) == 0)
    // non-overlapping: "aaaa" holds two "aa", not three (slStringFind
    // skips hitLen after a match)
    assert(int(find(lit("aaaa"), "aa", 2)) == 3)
    assert(int(find(lit("aaaa"), "aa", 3)) == 0)
    assert(int(find(s, "zzz", 1)) == 0)
    assert(int(find(s, "", 1)) == 0)
  }

  test("strTranslate: length mismatch returns input unchanged") {
    assert(str(strTranslate(lit("abcd"), "ab", "xy")) == "xycd")
    assert(str(strTranslate(lit("abcd"), "abc", "xy")) == "abcd")
    assert(str(strTranslate(lit("abcd"), "", "")) == "abcd")
  }

  test("editDistance is trailing-space-blind; repeat clamps n<=0") {
    assert(int(editDistance(lit("cat  "), lit("cat"))) == 0)
    assert(int(editDistance(lit("kitten"), lit("sitting"))) == 3)
    assert(str(strRepeat(lit("ab"), 0)) == "")
    assert(str(strRepeat(lit("ab"), 3)) == "ababab")
    assert(str(strReverse(lit("abc"))) == "cba")
    assert(str(cleanSpaces(lit("  a   b\t c "))) == "a b c")
    assert(str(strFilter(lit("banana"), "an")) == "anana")
    assert(str(strFilterOut(lit("banana"), "an")) == "b")
  }
}

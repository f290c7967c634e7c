package graft

import graft.functions.{StdStr, StdUni}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Std.Str / Std.Uni pinned to the REFERENCE'S OWN unit tests
  * (`ecllibrary/teststd/str/` and `/uni/` constant assertions, ported
  * expression-for-expression for the trickiest surfaces): EditDistance's
  * trailing-space-blind contract, word segmentation counts, and the
  * prefix/suffix family's case handling.
  */
class StrReferenceVectorsSpec extends SparkSpec {
  import spark.implicits._

  private def evalAll(cases: Seq[(Column, Any)]): Unit = {
    val row = Seq(1).toDF("x")
      .select(cases.map(_._1).zipWithIndex.map { case (c, i) =>
        c.as(s"c$i")
      }: _*).head()
    cases.zipWithIndex.foreach { case ((_, expected), i) =>
      assert(row.get(i) == expected, s"vector $i: got ${row.get(i)}")
    }
  }

  /** EditDistance per TestEditDistance.ecl: trailing spaces are not part
    * of the value (ECL strings are space-padded).
    */
  private def ed(a: String, b: String): Column =
    levenshtein(rtrim(lit(a)), rtrim(lit(b)))

  test("EditDistance: TestEditDistance.ecl vectors (space-blind)") {
    evalAll(Seq(
      (ed("", ""), 0),
      (ed("", "                "), 0),
      (ed("                ", ""), 0),
      (ed("a ", "                "), 1),
      (ed("Aprs  ", "APp"), 3),
      (ed("abcd", "acbd"), 2),
      (ed("abcd", "abd"), 1),
      (ed("abcd", "abc"), 1),
      (ed("abcd", "bcd"), 1),
      (ed("abcd", "abcde"), 1),
      (ed("abcd", "aabcd"), 1),
      (ed("abcd", " abcd"), 1),
      (ed("abcd", "a bcd"), 1),
      (ed("abcd", "adcd"), 1),
      (ed("abcd", "adca"), 2),
      (ed("gavin", "aving"), 2),
      (ed("abcdefgh", "cdefgha"), 3),
      (ed("abcdefgh", "abcdfgha"), 2),
      (ed("abcd", ""), 4),
      (StdStr.editDistanceWithinRadius(lit("abcd"), lit("adca"), 2), true),
      (StdStr.editDistanceWithinRadius(lit("abcd"), lit("adca"), 1), false)))
  }

  test("word counting: TestWordCount.ecl punctuation/whitespace contract") {
    // uni/TestWordCount.ecl: punctuation runs are not words; apostrophes
    // stay inside words under ICU segmentation
    evalAll(Seq(
      (StdUni.wordCount(lit("")), 0),
      (StdUni.wordCount(lit(" ,,,, ")), 0),
      (StdUni.wordCount(lit("abc def")), 2),
      (StdUni.wordCount(lit("couldn't")), 1),
      (StdUni.wordCount(lit("  a  b  ")), 2),
      (StdStr.wordCount(lit("abc def")), 2),
      (StdStr.wordCount(lit("  a  b  ")), 2)))
  }

  test("prefix/suffix family: TestCommonPrefix/Suffix case contract") {
    // str/TestCommonPrefix.ecl: nocase returns the FIRST argument's case
    evalAll(Seq(
      (StdStr.commonPrefix(lit("DANIEL"), lit("DANNY")), "DAN"),
      (StdStr.commonPrefix(lit("daniel"), lit("DANNY"), nocase = true),
        "dan"),
      (StdStr.commonPrefix(lit("abc"), lit("xyz")), ""),
      (StdStr.commonSuffix(lit("DANIEL"), lit("MICHAEL")), "EL"),
      (StdStr.commonSuffix(lit("daniel"), lit("MICHAEL"), nocase = true),
        "el")))
  }
}

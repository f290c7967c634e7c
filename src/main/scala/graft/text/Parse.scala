package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PARSE (SURVEY §2.10; TAKparse `rtl/include/eclhelper.hpp:2366`): pattern
  * matching over a text column producing one row per match, with
  * MATCHED()/MATCHTEXT() accessors. The reference ships three engines
  * (`NLPAregexStack/NLPAtomita/NLPAregexHeap`,
  * `common/thorhelper/thorparse.hpp:28`); the regex engine covers the
  * overwhelming majority of real uses — Tomita-GLR grammars are a later
  * phase (SURVEY §7.4).
  *
  * PATTERN/RULE compose as plain regex combinators; matching lowers to
  * `regexp_extract_all` + explode — codegen'd scan, no custom runtime.
  */
object Parse {

  /** PATTERN combinators (compile-time objects, §1.2 pattern types). */
  sealed trait Pattern { def re: String }
  final case class Lit(s: String) extends Pattern {
    def re: String = java.util.regex.Pattern.quote(s)
  }
  final case class Re(re: String) extends Pattern
  final case class Seq2(ps: Pattern*) extends Pattern {
    def re: String = ps.map(p => s"(?:${p.re})").mkString
  }
  final case class Or(ps: Pattern*) extends Pattern {
    def re: String = ps.map(p => s"(?:${p.re})").mkString("|")
  }
  final case class Rep(p: Pattern, min: Int, max: Int) extends Pattern {
    def re: String = s"(?:${p.re}){$min,$max}"
  }
  final case class Opt(p: Pattern) extends Pattern {
    def re: String = s"(?:${p.re})?"
  }

  /** PARSE(ds, field, pattern, t): one output row per (possibly
    * overlapping=false) match; `as` holds MATCHTEXT. All other columns of
    * the input ride along (the TRANSFORM sees LEFT).
    */
  def parse(df: DataFrame, field: Column, p: Pattern, as: String): DataFrame =
    df.withColumn(as, explode(regexp_extract_all(field, lit(p.re), lit(0))))

  /** PARSE with a capture-group projection: `groups` maps output column
    * name → 1-based capture index (MATCHTEXT(rule) analog).
    */
  def parseGroups(df: DataFrame, field: Column, p: Pattern,
      groups: Map[String, Int]): DataFrame = {
    val base = df.withColumn("__m",
      explode(regexp_extract_all(field, lit(p.re), lit(0))))
    groups.foldLeft(base) { case (d, (name, idx)) =>
      d.withColumn(name, regexp_extract(col("__m"), p.re, idx))
    }.drop("__m")
  }
}

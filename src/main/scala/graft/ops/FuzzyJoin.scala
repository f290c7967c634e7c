package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join — "which names are within r edits
  * of each other" over an unbounded name domain, without the all-pairs
  * product a naive `levenshtein(a,b) <= r` join plans (BNLJ — the same
  * trap as the inequality joins in [[Ranges]]). The reference ships the
  * scalar (`Std.Str.EditDistance*`, `ecllibrary/std/Str.ecl:313` →
  * stringlib EditDistanceV3) but no join form; its users run ALL-join +
  * filter, quadratic in the name count.
  *
  * Lowering — deletion neighborhoods (FastSS, Bocek 2007): if
  * ed(a,b) ≤ r, aligning a and b leaves ≤ r unmatched characters on each
  * side, so deleting ≤ r characters from each reaches a COMMON string —
  * the ≤r-deletion variant sets intersect. Candidates therefore come from
  * ONE equi-join on the exploded variant strings: n·C(len,≤r) linear
  * signature rows, tiny equality groups (a 17-char variant pins its
  * sources almost uniquely), no cartesian, and — unlike q-gram count
  * filtering — NO stop-gram degeneration on formulaic common-prefix
  * domains ('Customer#000000123', URLs, SKUs), where popular grams make
  * gram-equality groups quadratic. Exact `levenshtein` refines the
  * candidates; false positives die there, false negatives cannot exist.
  *
  * The whole signature is Catalyst expressions (substr/concat lambda
  * transforms — codegen'd); r ≤ 2 keeps the variant count at
  * 1 + len + len²/2 (combinatorial beyond that — and beyond r=2 you want
  * phonetic/embedding similarity, not edit distance).
  */
object FuzzyJoin {

  /** All strings obtainable by deleting exactly one character. */
  private def del1(c: Column): Column =
    transform(sequence(lit(1), length(c)),
      i => concat(c.substr(lit(1), i - 1), c.substr(i + 1, length(c))))

  /** Distinct ≤r-deletion neighborhood (includes the string itself). */
  private[graft] def deletionVariants(c: Column, radius: Int): Column = {
    require(radius >= 1 && radius <= 2, "radius 1 or 2 supported")
    val d1 = del1(c)
    val all =
      if (radius == 1) concat(array(c), d1)
      else concat(array(c), d1, flatten(transform(d1, s => del1(s))))
    array_distinct(all)
  }

  /** Distinct values of `name` paired within edit distance ≤ `radius`:
    * (a, b, dist), a < b lexicographically.
    */
  def editDistanceSelfJoin(df: DataFrame, name: Column, radius: Int): DataFrame = {
    val names = df.select(name.cast("string").as("nm"))
      .filter(col("nm").isNotNull).distinct()
    val sigs = names.select(col("nm"),
      explode(deletionVariants(col("nm"), radius)).as("sig"))
    sigs.select(col("nm").as("a"), col("sig"))
      .join(sigs.select(col("nm").as("b"), col("sig")), Seq("sig"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
      .withColumn("dist", levenshtein(col("a"), col("b")))
      .filter(col("dist") <= radius)
  }
}

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

  /** Signature rows (nm, sig). radius=1 takes a codegen path: the nested
    * `transform`/`array_distinct` lambda pipeline is a CodegenFallback in
    * Spark (interpreted per row, allocating the variant array), measured
    * ~1 s of the q217 stage at sf0.1 — `explode(sequence)` + substr/concat
    * stays inside WholeStageCodegen. Position 0 emits the string itself;
    * deleting any char of a run of equal chars yields the same variant, so
    * only the run head (`c[i] != c[i-1]`) is kept — the same distinct set
    * `array_distinct` produced (and duplicates would only add candidate
    * rows that the final distinct kills, never change the result).
    */
  private def signatureRows(names: DataFrame, radius: Int): DataFrame =
    if (radius == 1)
      names
        .select(col("nm"), explode(sequence(lit(0), length(col("nm")))).as("i"))
        .filter(col("i") <= 1 ||
          expr("substr(nm, i, 1) <> substr(nm, i-1, 1)"))
        .select(col("nm"),
          when(col("i") === 0, col("nm"))
            .otherwise(concat(expr("substr(nm, 1, i-1)"),
              expr("substr(nm, i+1, length(nm))"))).as("sig"))
    else
      names.select(col("nm"),
        explode(deletionVariants(col("nm"), radius)).as("sig"))

  /** Distinct values of `name` paired within edit distance ≤ `radius`:
    * (a, b, dist), a < b lexicographically.
    *
    * Candidates join on `xxhash64(sig)` — 8 bytes per row through the
    * exchange instead of the variant string (guide §2.3 narrower types);
    * a hash collision can only ADD candidate pairs, and any added pair
    * either truly has ed ≤ radius (a correct output row regardless of
    * which signature produced it) or dies in the exact refine — results
    * are unchanged. The signature frame feeds both join sides, so it is
    * persisted (TAKsplit, as in TextOps.lshJaccardPairs); the refine uses
    * the threshold form of `levenshtein`, whose banded DP early-exits
    * instead of filling the full matrix.
    *
    * Persist hygiene (r19 verdict #8): the candidate pair set — tiny next
    * to the signature frame (it survives the a<b + distinct collapse) — is
    * materialized EAGERLY via localCheckpoint, which lets the signature
    * persist be released before returning instead of accumulating one
    * CacheManager entry per invocation until LRU eviction (at cluster
    * scale, somebody else's memory). The call is therefore eager by
    * contract; the exact levenshtein refine still runs lazily on top of
    * the checkpointed candidates. Checkpoint blocks are freed by the
    * ContextCleaner once the result is unreachable.
    */
  /** Hashed signature frame for `name` at `radius` (nm, sig=xxhash64). */
  private[graft] def signatures(df: DataFrame, name: Column,
      radius: Int): DataFrame = {
    val names = df.select(name.cast("string").as("nm"))
      .filter(col("nm").isNotNull).distinct()
    signatureRows(names, radius)
      .select(col("nm"), xxhash64(col("sig")).as("sig"))
  }

  /** Candidate (a, b) pairs from the signature equi-join, a < b,
    * distinct. Exposed for the plan-contract spec (the public operator
    * materializes this eagerly, so its own executed plan no longer shows
    * the join).
    */
  private[graft] def candidateJoin(sigs: DataFrame): DataFrame =
    sigs.select(col("nm").as("a"), col("sig"))
      .join(sigs.select(col("nm").as("b"), col("sig")), Seq("sig"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()

  def editDistanceSelfJoin(df: DataFrame, name: Column, radius: Int): DataFrame = {
    val sigs = signatures(df, name, radius)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs =
      try candidateJoin(sigs).localCheckpoint(true)
      finally sigs.unpersist(blocking = false)
    pairs
      .withColumn("dist", levenshtein(col("a"), col("b"), radius))
      .filter(col("dist") >= 0 && col("dist") <= radius)
  }
}

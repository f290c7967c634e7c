package graft

import graft.ops.FuzzyJoin
import org.apache.spark.sql.functions._

/** Deletion-neighborhood fuzzy join: differential completeness against
  * the naive quadratic join on adversarial small strings (mixed lengths,
  * empty-adjacent, radius 2), signature-size bounds, and the plan
  * contract (equi-join on the variant, no nested loop).
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(names: Seq[String], r: Int): Set[(String, String, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val dn = names.distinct
    (for {
      a <- dn; b <- dn if a < b
      dist = lev(a, b) if dist <= r
    } yield (a, b, dist)).toSet
  }

  private def viaOp(names: Seq[String], r: Int): Set[(String, String, Int)] =
    FuzzyJoin.editDistanceSelfJoin(names.toDF("nm"), col("nm"), r)
      .as[(String, String, Int)].collect().toSet

  test("radius 1 == naive on mixed-length strings including 1-char and dups") {
    val names = Seq("cat", "cut", "cart", "ca", "c", "x", "cat", "dog",
      "dig", "dug", "doge", "a", "ab", "abc")
    assert(viaOp(names, 1) == naive(names, 1))
  }

  test("radius 2 == naive (substitution+insertion mixes, transposed chars)") {
    val names = Seq("kitten", "sitten", "sittin", "sitting", "mitten",
      "bitten", "kitchen", "kitteh", "ktiten", "kit", "kite", "bite")
    assert(viaOp(names, 2) == naive(names, 2))
  }

  test("radius 2 == naive on formulaic common-prefix ids (the stop-gram " +
      "domain that defeats q-gram filtering)") {
    val names = (0 until 60).map(i => f"Customer#$i%09d")
    assert(viaOp(names, 2) == naive(names, 2))
  }

  test("deletion-variant count is 1 + n + C(n,2) at radius 2, deduped") {
    val df = Seq("abcde").toDF("nm")
      .select(size(FuzzyJoin.deletionVariants(col("nm"), 2)).as("n"))
    // 1 + 5 + 10 = 16 (all distinct for a repeat-free string)
    assert(df.collect().head.getInt(0) == 16)
    val dup = Seq("aaaa").toDF("nm")
      .select(size(FuzzyJoin.deletionVariants(col("nm"), 2)).as("n"))
    // aaaa → {aaaa, aaa, aa}: deletions collapse
    assert(dup.collect().head.getInt(0) == 3)
  }

  test("plan contract: signature join is an equi-join — no BNLJ/cartesian") {
    // the public operator materializes the candidate join eagerly (persist
    // hygiene), so inspect the join plan it constructs, pre-checkpoint
    val plan = FuzzyJoin.candidateJoin(FuzzyJoin.signatures(
        Tables.customer(spark, sf), col("c_name"), 1))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") &&
      !plan.contains("CartesianProduct"), s"plan:\n$plan")
    assert(plan.contains("Generate explode"), s"plan:\n$plan")
  }

  // r19 verdict #8 (persist hygiene): the signature persist must not
  // accumulate one CacheManager entry per invocation — repeated calls in a
  // long session would pin blocks until LRU eviction. The operator now
  // materializes the (tiny) candidate pair set and releases the signature
  // cache before returning.
  test("persist hygiene: no CacheManager entries survive the call") {
    spark.sharedState.cacheManager.clearCache()
    val names = Seq("cat", "cut", "cart", "dog", "dig").toDF("nm")
    (1 to 3).foreach { _ =>
      val out = FuzzyJoin.editDistanceSelfJoin(names, col("nm"), 1)
      assert(out.count() > 0)
    }
    assert(spark.sharedState.cacheManager.isEmpty,
      "signature persist leaked a CacheManager entry")
  }
}

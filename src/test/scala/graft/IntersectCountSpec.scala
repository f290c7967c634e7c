package graft

import graft.functions.SortedIntersectCount
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** The sorted-merge intersection kernel: equal to
  * size(array_intersect(...)) on every sorted distinct-array input,
  * including nulls-last and empty arrays, under both codegen and
  * interpreted evaluation.
  */
class IntersectCountSpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  private def kernel(aCol: String, bCol: String) =
    GraftBridge.column(SortedIntersectCount(
      GraftBridge.expression(col(aCol)), GraftBridge.expression(col(bCol))))

  test("randomized: merge-count == size(array_intersect) on sorted " +
      "distinct arrays") {
    val word = Gen.oneOf("a", "b", "ab", "ba", "x", "yz", "zz", "q1", "")
    val arr = Gen.containerOf[Set, String](word).map(_.toSeq)
    Seq.tabulate(3)(_ => samples(Gen.zip(arr, arr), 40)).foreach { pairs =>
      val df = pairs.zipWithIndex
        .map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("id", "ra", "rb")
        .select(col("id"), array_sort(col("ra")).as("a"),
          array_sort(col("rb")).as("b"))
      val got = df.select(col("id"), kernel("a", "b").as("k"),
          size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
        .as[(Long, Long, Long)].collect()
      got.foreach { case (id, k, ref) =>
        assert(k == ref, s"row $id: kernel $k != array_intersect $ref")
      }
    }
  }

  test("nulls-last sorted arrays: null counts as a value, matching " +
      "array_intersect") {
    val df = Seq(
      (1L, Seq[String]("a", "b", null), Seq[String]("b", null)),
      (2L, Seq[String](null), Seq[String]("z")),
      (3L, Seq[String](), Seq[String]("a")),
      (4L, Seq[String](null), Seq[String](null))
    ).toDF("id", "ra", "rb")
      .select(col("id"), array_sort(col("ra")).as("a"),
        array_sort(col("rb")).as("b"))
    val got = df.select(col("id"), kernel("a", "b").as("k"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (id, k, ref) => assert(k == ref, s"row $id") }
  }

  test("interpreted eval matches codegen (nullSafeEval path)") {
    // route through a literal-free filter that Catalyst can't constant-fold,
    // then force interpreted projection via the expression's eval directly
    val a = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString("a"),
        org.apache.spark.unsafe.types.UTF8String.fromString("c")))
    val b = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString("a"),
        org.apache.spark.unsafe.types.UTF8String.fromString("b"),
        org.apache.spark.unsafe.types.UTF8String.fromString("c")))
    assert(graft.functions.IntersectCount.sortedCount(a, b) == 2L)
  }

  test("jaccardSets values are unchanged by the kernel swap (vs the " +
      "explicit array_intersect formulation)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "a completely different sentence with no overlap here"),
      (4L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val sets = graft.text.TextOps.shingleSet(docs, col("doc_id"),
      col("text"), 3)
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L))
      .toDF("doc_a", "doc_b")
    val got = graft.text.TextOps.jaccardSets(pairs, sets)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("jac"))
      .as[(Long, Long, Long, Double)].collect().toSet
    val ref = pairs
      .join(sets.select(col("doc_id").as("doc_a"), col("sset").as("set_a")),
        "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sset").as("set_b")),
        "doc_b")
      .withColumn("inter",
        size(array_intersect(col("set_a"), col("set_b"))).cast("long"))
      .withColumn("jac", col("inter").cast("double") /
        (size(col("set_a")) + size(col("set_b")) - col("inter"))
          .cast("double"))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("jac"))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == ref)
    // identical docs 1 and 4: jaccard exactly 1.0
    assert(got.exists { case (a, b, _, j) => a == 1L && b == 4L && j == 1.0 })
  }

  test("SQL-registered sorted_intersect_count resolves and computes") {
    graft.functions.Register.all(spark)
    val r = spark.sql(
      "SELECT sorted_intersect_count(array('a','b','c'), array('b','c','d'))")
      .collect().head.getLong(0)
    assert(r == 2L)
  }
}

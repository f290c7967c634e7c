package graft

import graft.functions.MinhashSigExpr
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** The MinHash codegen kernel: value-identical to the HOF
  * `transform(sequence, i => array_min(transform(sset, md5(i|s))))`
  * formulation the DuckDB oracles reproduce.
  */
class MinhashKernelSpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  private def hofSig(numHashes: Int) =
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      array_min(transform(col("sset"), s =>
        md5(concat(i.cast("string"), lit("|"), s)))))

  private def kernelSig(numHashes: Int) =
    GraftBridge.column(MinhashSigExpr(
      GraftBridge.expression(col("sset")), numHashes))

  test("randomized: kernel == HOF md5 minima, including unicode and " +
      "multi-word shingles") {
    val word = Gen.oneOf("alpha", "beta", "γράμμα", "日本語 テキスト", "x y z",
      "", "|", "0|pipe-collision-shape", "ZZ top")
    val arr = Gen.nonEmptyContainerOf[Set, String](word).map(_.toSeq)
    val rows = samples(arr, 60).zipWithIndex.map { case (a, i) => (i.toLong, a) }
    val df = rows.toDF("id", "sset")
    val got = df.select(col("id"), kernelSig(8).as("sig"))
      .as[(Long, Seq[String])].collect().toMap
    val ref = df.select(col("id"), hofSig(8).as("sig"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got == ref)
  }

  test("null shingles are skipped like array_min; all-null set yields " +
      "null elements") {
    val df = Seq(
      (1L, Seq[String]("a", null, "b")),
      (2L, Seq[String](null, null))
    ).toDF("id", "sset")
    val got = df.select(col("id"), kernelSig(4).as("sig"))
      .as[(Long, Seq[String])].collect().toMap
    val ref = df.select(col("id"), hofSig(4).as("sig"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got == ref)
    assert(got(2L).forall(_ == null))
  }

  test("downstream band keys are unchanged by the kernel swap") {
    val docs = Seq(
      (1L, "one two three four five six"),
      (2L, "one two three four five seven"),
      (3L, "totally different words here now")
    ).toDF("doc_id", "text")
    val sets = graft.text.TextOps.shingleSet(docs, col("doc_id"),
      col("text"), 3)
    val viaKernel = graft.text.TextOps.lshBandKeys(
      graft.text.TextOps.minhashSig(sets, 8), 8, 2)
      .as[(Long, Long, String)].collect().toSet
    val viaHof = graft.text.TextOps.lshBandKeys(
      sets.withColumn("sig", hofSig(8)), 8, 2)
      .as[(Long, Long, String)].collect().toSet
    assert(viaKernel == viaHof)
  }
}

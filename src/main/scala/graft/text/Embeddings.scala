package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two paths:
  *  - [[cosineTopK]]: brute-force exact cosine top-k of a (small) query set
  *    against the corpus — the baseline. The query side is broadcast; the
  *    corpus is streamed once. Exact decimal accumulation makes scores
  *    bit-identical across engines and partitionings.
  *  - [[rpLshBucket]]: random-hyperplane LSH bucketing — the scale path:
  *    sign-bit sketch per vector, candidates = same bucket, refine with
  *    exact cosine within buckets only.
  *
  * Hyperplanes are derived deterministically from md5 so the DuckDB oracle
  * reproduces them exactly (no RNG state to ship).
  */
object Embeddings {

  /** Explode vectors to (idCol, pos, v): the join-friendly layout. */
  private def explodeVec(df: DataFrame, id: Column, vec: Column,
      idName: String): DataFrame =
    df.select(id.as(idName), posexplode(vec).as(Seq("pos", "v")))

  /** Exact-decimal sum over an array of doubles — the codegen'd scalar
    * analog of groupBy+sum(decimal): same addends, same exact result, no
    * explode/shuffle.
    */
  private def decimalArraySum(arr: Column): Column =
    aggregate(arr,
      lit(0).cast(DecimalType(38, 12)),
      (acc, x) => (acc + x.cast(DecimalType(30, 12))).cast(DecimalType(38, 12)))

  /** Exact L2 norm per vector, decimal-accumulated (order-independent). */
  def norms(df: DataFrame, id: Column, vec: Column): DataFrame =
    df.select(id.as("vec_id"),
      sqrt(decimalArraySum(transform(vec, v =>
        v.cast("double") * v.cast("double"))).cast("double")).as("norm"))

  /** Exact cosine between two vector columns: decimal dot product over the
    * zipped per-position products (all in whole-stage codegen).
    */
  def dotExact(a: Column, b: Column): Column =
    decimalArraySum(zip_with(a, b,
      (x, y) => x.cast("double") * y.cast("double"))).cast("double")

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors by cosine similarity (self excluded). Scores are exact-decimal
    * dot products over a broadcast query side; ties broken by corpus id.
    * Output: (q_id, c_id, rank).
    */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, qid: Column,
      cid: Column, qvec: Column, cvec: Column, k: Int): DataFrame = {
    // Spark's higher-order array functions are interpreted (no codegen) —
    // a per-pair aggregate() fold benched 4× slower than this explode +
    // hash-aggregate shape, which stays columnar end-to-end.
    val qx = explodeVec(queries, qid, qvec, "q_id")
    val cx = explodeVec(corpus, cid, cvec, "c_id")
    val qn = norms(queries, qid, qvec).withColumnRenamed("vec_id", "q_id")
      .withColumnRenamed("norm", "q_norm")
    val cn = norms(corpus, cid, cvec).withColumnRenamed("vec_id", "c_id")
      .withColumnRenamed("norm", "c_norm")
    val dots = cx.join(broadcast(qx), Seq("pos"))
      .filter(col("q_id") =!= col("c_id"))
      .groupBy(col("q_id"), col("c_id"))
      .agg(sum((qx("v").cast("double") * cx("v").cast("double"))
        .cast(DecimalType(30, 12))).cast("double").as("dot"))
    val scored = dots
      .join(broadcast(qn), "q_id").join(cn, "c_id")
      .withColumn("cos", col("dot") / (col("q_norm") * col("c_norm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("rank").cast("long").as("rank"))
  }

  /** Exact cosine top-k over PRE-SELECTED candidate pairs (the refine step
    * after LSH bucketing): each input row carries both vectors; dot and
    * norms use the same decimal accumulation as [[cosineTopK]]. Output:
    * (q_id, c_id, rank).
    */
  def cosinePairsTopK(pairs: DataFrame, qid: Column, cid: Column,
      qvec: Column, cvec: Column, k: Int): DataFrame = {
    val base = pairs.select(qid.as("q_id"), cid.as("c_id"),
      qvec.as("q_emb"), cvec.as("c_emb"))
    val dots = base
      .select(col("q_id"), col("c_id"),
        posexplode(zip_with(col("q_emb"), col("c_emb"),
          (a, b) => a.cast("double") * b.cast("double"))).as(Seq("pos", "prod")))
      .groupBy(col("q_id"), col("c_id"))
      .agg(sum(col("prod").cast(DecimalType(30, 12))).cast("double").as("dot"))
    val qn = norms(base.select(col("q_id"), col("q_emb")).distinct(),
      col("q_id"), col("q_emb"))
      .withColumnRenamed("vec_id", "q_id").withColumnRenamed("norm", "q_norm")
    val cn = norms(base.select(col("c_id"), col("c_emb")).distinct(),
      col("c_id"), col("c_emb"))
      .withColumnRenamed("vec_id", "c_id").withColumnRenamed("norm", "c_norm")
    val scored = dots.join(qn, "q_id").join(cn, "c_id")
      .withColumn("cos", col("dot") / (col("q_norm") * col("c_norm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("rank").cast("long").as("rank"))
  }

  /** Deterministic ±1 hyperplane component for (plane, pos): +1 iff the
    * first hex digit of md5("<salt>p<plane>_<pos>") is even. `salt`
    * namespaces independent hash tables (multi-table amplification).
    */
  def planeSign(plane: Int, pos: Column, salt: String = ""): Column = {
    val digit = conv(substring(md5(concat(lit(s"${salt}p${plane}_"),
      pos.cast("string"))), 1, 1), 16, 10).cast("int")
    when(digit % 2 === 0, 1).otherwise(-1)
  }

  /** Random-hyperplane LSH bucket id (numPlanes sign bits) per vector.
    * Output: (vec_id, bucket). One explode + one groupBy — linear scans,
    * shuffle size = one row per vector.
    */
  def rpLshBucket(df: DataFrame, id: Column, vec: Column,
      numPlanes: Int): DataFrame = {
    val ex = explodeVec(df, id, vec, "vec_id")
    val sums = (0 until numPlanes).map { p =>
      sum((col("v").cast("double") * planeSign(p, col("pos")).cast("double"))
        .cast(DecimalType(30, 12))).as(s"d$p")
    }
    val bucket = (0 until numPlanes).map { p =>
      when(col(s"d$p") > 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)
    ex.groupBy(col("vec_id")).agg(sums.head, sums.tail: _*)
      .select(col("vec_id"), bucket.as("bucket"))
  }

  /** Multi-table RP-LSH (OR-amplification, the recall knob the single-table
    * path lacks): `numTables` independent plane sets — table t salts its
    * hyperplanes with "t<t>_" — give each vector one bucket per table.
    * A qualifying neighbor is found if the pair collides in ANY table:
    * recall 1-(1-p^b)^R instead of p^b. Still one explode + one groupBy;
    * shuffle size = numTables rows per vector. Output: (vec_id, tbl,
    * bucket).
    */
  def rpLshBucketTables(df: DataFrame, id: Column, vec: Column,
      numPlanes: Int, numTables: Int): DataFrame = {
    val ex = explodeVec(df, id, vec, "vec_id")
    val sums = for (t <- 0 until numTables; p <- 0 until numPlanes) yield
      sum((col("v").cast("double") *
        planeSign(p, col("pos"), s"t${t}_").cast("double"))
        .cast(DecimalType(30, 12))).as(s"d${t}_$p")
    val tables = (0 until numTables).map { t =>
      val bucket = (0 until numPlanes).map { p =>
        when(col(s"d${t}_$p") > 0, lit(1L << p)).otherwise(0L)
      }.reduce(_ + _)
      struct(lit(t).as("tbl"), bucket.as("bucket"))
    }
    ex.groupBy(col("vec_id")).agg(sums.head, sums.tail: _*)
      .select(col("vec_id"), explode(array(tables: _*)).as("tb"))
      .select(col("vec_id"), col("tb.tbl"), col("tb.bucket"))
  }

  /** Candidate pairs that share a bucket in at least one table, deduped —
    * the OR of the per-table collision sets. Equality join on (tbl,
    * bucket); the bucketed frame feeds both sides, so it is persisted.
    */
  def annCandidatePairs(buckets: DataFrame): DataFrame = {
    val bk = graft.ops.Shape.split(buckets)
    val a = bk.select(col("tbl"), col("bucket"), col("vec_id").as("q_id"))
    val b = bk.select(col("tbl"), col("bucket"), col("vec_id").as("c_id"))
    a.join(b, Seq("tbl", "bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id")).distinct()
  }
}

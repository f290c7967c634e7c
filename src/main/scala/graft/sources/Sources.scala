package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Sources & sinks (SURVEY §2.1-2.2): declared-schema CSV/JSON/XML
  * read/write (the reference declares record layouts — no schema inference,
  * `ICsvParameters` `rtl/include/eclhelper.hpp:2649` region), PIPE
  * read/through (`TAKpiperead` :919), and superfiles (a named union of
  * files readable as one dataset, `dali/base/dadfs.hpp:493`).
  */
object Sources {

  /** OUTPUT(..., CSV) (TAKcsvwrite :921). */
  def csvWrite(df: DataFrame, path: String, sep: String = ",",
      header: Boolean = false): Unit =
    df.write.mode("overwrite").option("sep", sep).option("header", header)
      .csv(path)

  /** DATASET(f, rec, CSV) (TAKcsvread :977): schema DECLARED, never
    * inferred — mirrors the reference's `ICsvParameters` contract.
    */
  def csvRead(spark: SparkSession, path: String, schema: StructType,
      sep: String = ",", header: Boolean = false): DataFrame =
    spark.read.schema(schema).option("sep", sep).option("header", header)
      .csv(path)

  /** OUTPUT(..., JSON) (TAKjsonwrite :1079). */
  def jsonWrite(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** DATASET(f, rec, JSON) (TAKjsonread :1080), declared schema. */
  def jsonRead(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** OUTPUT(..., XML) (TAKxmlwrite :933): one XML row-document per line
    * (to_xml pretty-prints; collapse whitespace so text() stays 1:1).
    */
  def xmlWrite(df: DataFrame, path: String, rowTag: String = "Row"): Unit = {
    import org.apache.spark.sql.functions._
    df.select(regexp_replace(
        to_xml(struct(df.columns.map(col): _*),
          java.util.Map.of("rootTag", rowTag)),
        "\\n\\s*", "").as("xml"))
      .write.mode("overwrite").text(path)
  }

  /** DATASET(f, rec, XML) (TAKxmlread :978): XPath-lite row extraction via
    * from_xml with a declared schema.
    */
  def xmlRead(spark: SparkSession, path: String, schema: StructType,
      rowTag: String = "Row"): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = spark.read.text(path)
    raw.select(from_xml(raw("value"), schema).as("r")).select("r.*")
  }

  /** PIPE(cmd) through-mode (TAKpipethrough :922): each partition's rows are
    * piped as lines through an external command; stdout lines come back as
    * rows. RDD pipe() — the one legitimately RDD-shaped op in the engine.
    */
  def pipeThrough(df: DataFrame, cmd: String): DataFrame = {
    import df.sparkSession.implicits._
    val lines = df.toJSON.rdd.pipe(cmd)
    df.sparkSession.read.json(lines.toDS())
  }

  /** Superfile read: a union of file paths presented as one dataset. */
  def superfile(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.parquet(paths: _*)
}

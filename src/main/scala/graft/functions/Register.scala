package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration: expose the ECL function layer to
  * `spark.sql(...)` so published/ad-hoc SQL queries can call it (the
  * reference exposes its whole stdlib to every ECL query; our analog is
  * session FunctionRegistry entries). Native Expressions register through
  * the catalyst path (codegen preserved); composites register as wrapped
  * column functions.
  */
object Register {

  def all(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("ecl_hash32",
      exprs => Fnv1a32(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("ecl_hash64",
      exprs => Fnv1a64(exprs.head), "scala_udf")
    spark.udf.register("ecl_clean_spaces",
      (s: String) => if (s == null) null
        else s.trim.replaceAll("\\s+", " "))
    spark.udf.register("ecl_date_t",
      (d: java.sql.Date) => if (d == null) null
        else {
          val ld = d.toLocalDate
          Integer.valueOf(ld.getYear * 10000 + ld.getMonthValue * 100 +
            ld.getDayOfMonth)
        })
  }
}

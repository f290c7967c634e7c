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
    // explicit cast to string: the expressions hash UTF-8 bytes, so a raw
    // non-string argument (ecl_hash32(42)) must be stringified first —
    // matching EclFunctions.hash32/64's column path
    reg.createOrReplaceTempFunction("ecl_hash32",
      exprs => EclHash32(org.apache.spark.sql.catalyst.expressions.Cast(
        exprs.head, org.apache.spark.sql.types.StringType)), "scala_udf")
    reg.createOrReplaceTempFunction("ecl_hash64",
      exprs => EclHash64(org.apache.spark.sql.catalyst.expressions.Cast(
        exprs.head, org.apache.spark.sql.types.StringType)), "scala_udf")
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

package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.unsafe.types.UTF8String

/** SQL-surface registration: expose the ECL function layer to
  * `spark.sql(...)` so published/ad-hoc SQL queries can call it (the
  * reference exposes its whole stdlib to every ECL query; our analog is
  * session FunctionRegistry entries). Native Expressions register through
  * the catalyst path (codegen preserved); composites register as wrapped
  * column functions.
  */
object Register {

  /** StdStr's pattern/separator args are plan-time literals (as in ECL);
    * fold the argument expression to recover them at registration time.
    */
  private def litStr(e: Expression): String = e.eval() match {
    case null              => ""
    case s: UTF8String     => s.toString
    case other             => other.toString
  }
  private def litInt(e: Expression): Int = e.eval() match {
    case n: Number => n.intValue
    case other     => other.toString.toInt
  }
  private def litBool(e: Expression): Boolean = e.eval() match {
    case b: java.lang.Boolean => b.booleanValue
    case other                => other.toString.toBoolean
  }
  private def c(e: Expression): Column = GraftBridge.column(e)

  def all(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry

    // Std.Str surface for spark.sql(...): composed built-in Columns, so the
    // SQL path codegens identically to the Column path.
    def registerColumnFn(name: String)(build: Seq[Expression] => Column): Unit =
      reg.createOrReplaceTempFunction(name,
        exprs => GraftBridge.resolvedExpression(build(exprs)), "scala_udf")

    registerColumnFn("std_str_wildmatch") { e =>
      StdStr.wildMatch(c(e(0)), litStr(e(1)), if (e.size > 2) litBool(e(2)) else false)
    }
    registerColumnFn("std_str_contains") { e =>
      StdStr.strContains(c(e(0)), litStr(e(1)), if (e.size > 2) litBool(e(2)) else false)
    }
    registerColumnFn("std_str_extract") { e =>
      StdStr.extract(c(e(0)), litInt(e(1)))
    }
    registerColumnFn("std_str_count_words") { e =>
      StdStr.countWords(c(e(0)), litStr(e(1)), if (e.size > 2) litBool(e(2)) else false)
    }
    registerColumnFn("std_str_get_nth_word") { e =>
      StdStr.getNthWord(c(e(0)), litInt(e(1)))
    }
    registerColumnFn("std_str_find_replace") { e =>
      StdStr.findReplace(c(e(0)), litStr(e(1)), litStr(e(2)))
    }
    registerColumnFn("std_str_to_capital_case") { e => StdStr.toCapitalCase(c(e(0))) }
    registerColumnFn("std_str_to_title_case") { e => StdStr.toTitleCase(c(e(0))) }
    registerColumnFn("std_str_common_prefix") { e => StdStr.commonPrefix(c(e(0)), c(e(1))) }
    registerColumnFn("std_str_edit_distance_within_radius") { e =>
      StdStr.editDistanceWithinRadius(c(e(0)), c(e(1)), litInt(e(2)))
    }
    registerColumnFn("std_str_equal_ignore_case") { e =>
      StdStr.equalIgnoreCase(c(e(0)), c(e(1)))
    }

    // Std.Date surface (Date_t yyyymmdd ints)
    registerColumnFn("std_date_adjust_date") { e =>
      StdDate.adjustDate(c(e(0)), c(e(1)), c(e(2)), c(e(3)))
    }
    registerColumnFn("std_date_adjust_calendar") { e =>
      StdDate.adjustCalendar(c(e(0)), c(e(1)), c(e(2)), c(e(3)))
    }
    registerColumnFn("std_date_days_between") { e =>
      StdDate.daysBetween(c(e(0)), c(e(1)))
    }
    registerColumnFn("std_date_months_between") { e =>
      StdDate.monthsBetween(c(e(0)), c(e(1)), if (e.size > 2) litBool(e(2)) else false)
    }
    registerColumnFn("std_date_years_between") { e =>
      StdDate.yearsBetween(c(e(0)), c(e(1)))
    }
    registerColumnFn("std_date_day_of_week") { e => StdDate.dayOfWeek(c(e(0))) }
    registerColumnFn("std_date_iso_week_date") { e =>
      StdDate.isoWeekDate(c(e(0)), if (e.size > 1) litBool(e(1)) else false)
    }
    registerColumnFn("std_date_to_string") { e =>
      StdDate.dateToString(c(e(0)), litStr(e(1)))
    }
    registerColumnFn("std_date_from_string") { e =>
      StdDate.fromStringToDate(c(e(0)), litStr(e(1)))
    }
    registerColumnFn("std_date_from_julian") { e =>
      StdDate.fromJulianDate(c(e(0)))
    }
    registerColumnFn("std_date_to_julian") { e =>
      StdDate.toJulianDate(c(e(0)))
    }
    registerColumnFn("std_date_match_string") { e =>
      StdDate.matchDateString(c(e(0)), litStr(e(1)).split(';').toSeq)
    }

    // Std.Date timezone layer (literal-map lookups)
    registerColumnFn("std_tz_offset") { e =>
      StdTimezone.tzOffset(c(e(0)),
        if (e.size > 1) c(e(1)) else org.apache.spark.sql.functions.lit(""))
    }
    registerColumnFn("std_tz_seconds_between") { e =>
      StdTimezone.secondsBetweenTZ(c(e(0)), c(e(1)),
        if (e.size > 2) c(e(2)) else org.apache.spark.sql.functions.lit(""),
        if (e.size > 3) c(e(3)) else org.apache.spark.sql.functions.lit(""))
    }
    registerColumnFn("std_tz_to_local") { e =>
      StdTimezone.toLocalTime(c(e(0)), c(e(1)))
    }

    // Std.Uni locale/normalization layer + type transfer (UDF-backed)
    registerColumnFn("std_uni_clean_accents") { e => StdUni.cleanAccents(c(e(0))) }
    registerColumnFn("std_uni_normalize") { e =>
      StdUni.normalizeForm(c(e(0)), litStr(e(1)))
    }
    registerColumnFn("std_uni_compare_at_strength") { e =>
      StdUni.compareAtStrength(c(e(0)), c(e(1)), litInt(e(2)))
    }
    registerColumnFn("std_uni_locale_compare_at_strength") { e =>
      StdUni.localeCompareAtStrength(c(e(0)), c(e(1)), litStr(e(2)), litInt(e(3)))
    }
    registerColumnFn("std_uni_locale_upper") { e =>
      StdUni.localeToUpperCase(c(e(0)), litStr(e(1)))
    }
    registerColumnFn("std_uni_locale_lower") { e =>
      StdUni.localeToLowerCase(c(e(0)), litStr(e(1)))
    }
    registerColumnFn("std_uni_word_count") { e =>
      StdUni.wordCount(c(e(0)), if (e.size > 1) litStr(e(1)) else "")
    }
    registerColumnFn("ecl_transfer_double_to_bits") { e =>
      EclFunctions.transferDoubleToBits(c(e(0)))
    }
    registerColumnFn("ecl_transfer_bits_to_double") { e =>
      EclFunctions.transferBitsToDouble(c(e(0)))
    }
    // explicit cast to string: the expressions hash UTF-8 bytes, so a raw
    // non-string argument (ecl_hash32(42)) must be stringified first —
    // matching EclFunctions.hash32/64's column path
    reg.createOrReplaceTempFunction("ecl_hash32",
      exprs => EclHash32(org.apache.spark.sql.catalyst.expressions.Cast(
        exprs.head, org.apache.spark.sql.types.StringType)), "scala_udf")
    reg.createOrReplaceTempFunction("ecl_hash64",
      exprs => EclHash64(org.apache.spark.sql.catalyst.expressions.Cast(
        exprs.head, org.apache.spark.sql.types.StringType)), "scala_udf")
    // codegen vector kernels (VecMath.scala) for spark.sql(...) callers:
    // vec_dot(a, b) → double; vec_mat_dots(v, m) → array<double>
    reg.createOrReplaceTempFunction("vec_dot",
      exprs => VecDot(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_mat_dots",
      exprs => VecMatDots(exprs(0), exprs(1)), "scala_udf")
    // sorted-set intersection count (IntersectCount.scala) — inputs must
    // be array_sort-ed, distinct-element string arrays
    reg.createOrReplaceTempFunction("sorted_intersect_count",
      exprs => SortedIntersectCount(exprs(0), exprs(1)), "scala_udf")
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

package graft

import graft.analysis.DataPatterns
import org.apache.spark.sql.Row

/** Std.DataPatterns semantics (ref `ecllibrary/std/DataPatterns/Profile.ecl`
  * docs): fill/nil contract, exact cardinality, modes (>1 occurrence, top
  * 5), low-cardinality breakdown, palette patterns, best-type inference,
  * numeric stats, Benford first-digit distribution.
  */
class DataPatternsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1, "Alpha", "red", 10.0, true),
    (2, "Beta9", "red", 20.0, false),
    (3, "Gamma", "blue", 30.0, true),
    (4, "", "red", 0.0, true),       // empty string + zero are nil
    (5, "Alpha", "blue", 50.0, false)
  ).toDF("id", "name", "color", "score", "flag")

  private lazy val prof = DataPatterns.profile(df).collect()
    .map(r => r.getAs[String]("attribute") -> r).toMap

  test("fill contract: empty string and zero are nil, booleans always filled") {
    assert(prof("id").getAs[Long]("fill_count") == 5)
    assert(prof("name").getAs[Long]("fill_count") == 4)
    assert(prof("score").getAs[Long]("fill_count") == 4)
    assert(prof("flag").getAs[Long]("fill_count") == 5)
    assert(prof("name").getAs[Double]("fill_rate") == 80.0)
    assert(prof("id").getAs[Long]("rec_count") == 5)
  }

  test("cardinality is exact over non-nil values; breakdown under limit") {
    assert(prof("color").getAs[Long]("cardinality") == 2)
    assert(prof("name").getAs[Long]("cardinality") == 3) // Alpha dup, '' nil
    val bd = prof("color").getSeq[Row](prof("color").fieldIndex("cardinality_breakdown"))
    assert(bd.map(r => (r.getString(0), r.getLong(1))).toList ==
      List(("red", 3L), ("blue", 2L)))
  }

  test("modes: only values occurring more than once, most frequent first") {
    val m = prof("color").getSeq[Row](prof("color").fieldIndex("modes"))
    assert(m.map(r => (r.getString(0), r.getLong(1))).toList ==
      List(("red", 3L), ("blue", 2L)))
    val mn = prof("name").getSeq[Row](prof("name").fieldIndex("modes"))
    assert(mn.map(_.getString(0)).toList == List("Alpha"))
    // id values are unique -> no mode
    assert(prof("id").getSeq[Row](prof("id").fieldIndex("modes")).isEmpty)
  }

  test("patterns use the A/a/9/B palette with deterministic examples") {
    val pp = prof("name").getSeq[Row](prof("name").fieldIndex("popular_patterns"))
    assert(pp.head.getString(0) == "Aaaaa") // 3 of Alpha/Gamma/Alpha
    assert(pp.head.getLong(1) == 3)
    assert(pp.map(_.getString(0)).contains("Aaaa9"))
    val fp = prof("flag").getSeq[Row](prof("flag").fieldIndex("popular_patterns"))
    assert(fp.map(_.getString(0)).toList == List("B"))
  }

  test("best-type inference: bounded ints, bools, strings") {
    assert(prof("id").getAs[String]("best_attribute_type") == "unsigned1")
    assert(prof("flag").getAs[String]("best_attribute_type") == "boolean")
    assert(prof("name").getAs[String]("best_attribute_type") == "string5")
    assert(prof("score").getAs[String]("best_attribute_type") == "real8")
    assert(prof("id").getAs[String]("given_attribute_type") == "integer4")
  }

  test("numeric stats ignore nils and zero-out non-numerics") {
    assert(prof("score").getAs[Boolean]("is_numeric"))
    assert(prof("score").getAs[Double]("numeric_min") == 10.0)
    assert(prof("score").getAs[Double]("numeric_max") == 50.0)
    assert(prof("score").getAs[Double]("numeric_mean") == 27.5)
    assert(!prof("color").getAs[Boolean]("is_numeric"))
    assert(prof("color").getAs[Double]("numeric_max") == 0.0)
  }

  test("correlations: numeric pairs, symmetric, descending") {
    val c = prof("id").getSeq[Row](prof("id").fieldIndex("correlations"))
    assert(c.map(_.getString(0)).toSet == Set("score"))
    val cs = prof("score").getSeq[Row](prof("score").fieldIndex("correlations"))
    assert(cs.map(_.getString(0)).toSet == Set("id"))
  }

  test("exactCardLimit gate: high-card attrs report approx card, skip modes") {
    // id (5 distinct) exceeds a limit of 3 → approx cardinality path;
    // color (2 distinct) stays exact with modes intact
    val p = DataPatterns.profile(df, exactCardLimit = 3L).collect()
      .map(r => r.getAs[String]("attribute") -> r).toMap
    // HLL at tiny n is exact in practice; the contract is ±~2%
    val idCard = p("id").getAs[Long]("cardinality")
    assert(idCard >= 4 && idCard <= 6)
    assert(p("id").getSeq[Row](p("id").fieldIndex("modes")).isEmpty)
    assert(p("color").getAs[Long]("cardinality") == 2)
    assert(p("color").getSeq[Row](p("color").fieldIndex("modes")).nonEmpty)
    // patterns still computed for gated attributes (raw-melt path)
    assert(p("id").getSeq[Row](p("id").fieldIndex("popular_patterns")).nonEmpty)
    // best-type evidence unaffected by the gate (pass-1 sourced)
    assert(p("id").getAs[String]("best_attribute_type") == "unsigned1")
  }

  test("benford: digit distribution plus expected row") {
    val b = Seq(11.0, 12.0, 13.0, 21.0, 22.0, 31.0, 105.0, 0.19, 0.0)
      .toDF("x")
    val rows = DataPatterns.benford(b, Seq("x")).collect()
    val x = rows.find(_.getString(0) == "x").get
    val n = x.getAs[Long]("num_values")
    assert(n == 8) // 0.0 has no significant digit
    // leading digits: 1,1,1,2,2,3,1,1 -> d1 = 5/8
    assert(math.abs(x.getAs[Double]("d_1") - 62.5) < 1e-9)
    assert(math.abs(x.getAs[Double]("d_2") - 25.0) < 1e-9)
    val exp = rows.find(_.getString(0) == "--EXPECTED--").get
    assert(math.abs(exp.getAs[Double]("d_1") - 30.1029995) < 1e-3)
    assert(exp.getAs[Long]("num_values") == 0)
  }
}

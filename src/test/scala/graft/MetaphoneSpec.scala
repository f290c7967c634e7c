package graft

import graft.functions.Metaphone._

/** Double Metaphone pinned to the reference's OWN regression vectors
  * (`testing/regress/ecl/key/metaphone.xml` and
  * `ecllibrary/teststd/Metaphone/TestMetaphone.ecl`) plus structural
  * invariants.
  */
class MetaphoneSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  test("reference regression vectors: primary/secondary/double") {
    // metaphone.xml key file rows
    assert(primary("Algernon") == "ALKRNN")
    assert(secondary("Algernon") == "ALJRNN")
    assert(dbl("Algernon") == "ALKRNNALJRNN")
    assert(primary("Englebert") == "ANKLPRT")
    assert(secondary("Englebert") == "ANKLPRT")
    assert(primary("Cholmondley") == "XLMNTL")
    assert(secondary("Cholmondley") == "XLMNTL")
    assert(primary("Farquar") == "FRKR")
    assert(secondary("Farquar") == "FRKR")
  }

  test("classic encodings and invariants") {
    assert(primary("Smith") == "SM0" && secondary("Smith") == "XMT")
    // case-blind, non-letters stripped, null/empty safe
    assert(encode("ALGERNON") == encode("algernon"))
    assert(encode("O'Brien") == encode("OBrien"))
    assert(encode("") == (("", "")))
    assert(encode(null) == (("", "")))
    // homophones share a primary code
    assert(primary("Smith") == primary("Smyth"))
    assert(primary("Philip") == primary("Filip"))
    // codes use only the metaphone alphabet
    Seq("Katherine", "Jackson", "Xavier", "Quixote", "Wright").foreach { w =>
      val (a, b) = encode(w)
      assert((a + b).forall("ABCDEFGHIJKLMNOPQRSTUVWXYZ0".contains(_)), w)
    }
  }

  test("q147 oracle vectors stay in sync with the encoder") {
    graft.functions.Metaphone.oracleVectors.foreach { case (w, p, s) =>
      assert(encode(w) == ((p, s)), w)
    }
  }

  test("column UDFs encode distributed string columns") {
    val df = Seq("Algernon", "Englebert", "Farquar").toDF("name")
      .repartition(2)
    val got = df.select(col("name"), primaryCol(col("name")).as("p"),
        doubleCol(col("name")).as("d"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(got("Algernon") == (("ALKRNN", "ALKRNNALJRNN")))
    assert(got("Farquar") == (("FRKR", "FRKRFRKR")))
  }
}

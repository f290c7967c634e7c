package graft

import graft.functions.Metaphone3._

/** Metaphone-3 knob semantics (ref `ecllibrary/std/Metaphone3.ecl`
  * parameter contract — the algorithm body is an external-library proxy
  * there, so behavior is pinned by this engine's own vectors).
  */
class Metaphone3Spec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  test("q148 oracle vectors stay in sync with the encoder") {
    oracleVectors.foreach { case (w, p, sd, pv, px, p3) =>
      assert(primary(w) == p, s"primary($w)")
      assert(secondary(w) == sd, s"secondary($w)")
      assert(primary(w, encodeVowels = true) == pv, s"vowels($w)")
      assert(primary(w, encodeExact = true) == px, s"exact($w)")
      assert(primary(w, maxLength = 3) == p3, s"len3($w)")
    }
  }

  test("encodeVowels folds interior vowel runs to single A marks") {
    // default drops interior vowels entirely; the knob keeps one A per run
    assert(primary("Beauchamp") == primary("Bchmp").replace("A", "A"))
    assert(primary("Katherine", encodeVowels = true).count(_ == 'A') >
      primary("Katherine").count(_ == 'A'))
    // a vowel RUN is one A, not one per letter (EAU in Beauchamp)
    val pv = primary("Beauchamp", encodeVowels = true)
    assert(pv.startsWith("PA") && !pv.startsWith("PAA"))
  }

  test("encodeExact separates voiced/unvoiced pairs that default merges") {
    assert(primary("Bob") == primary("Pop")) // default: both PP
    assert(primary("Bob", encodeExact = true) !=
      primary("Pop", encodeExact = true))
    assert(primary("Vickers") == primary("Fickers"))
    assert(primary("Vickers", encodeExact = true) !=
      primary("Fickers", encodeExact = true))
  }

  test("maxLength truncates; 0 means the default cap of 8") {
    assert(primary("Schwarzenegger", maxLength = 4).length <= 4)
    assert(primary("Schwarzenegger", encodeVowels = true).length <= 8)
    assert(primary("Schwarzenegger", maxLength = 20).length > 4)
  }

  test("phonetic classes and silent letters") {
    assert(primary("Smith") == primary("Smyth"))
    assert(primary("Nation").endsWith("XN")) // -TION
    assert(primary("Passion").endsWith("XN")) // -SSION
    assert(primary("Climb") == "KLM") // silent final B
    assert(primary("Light") == "LT") // silent GH
    assert(primary("Wright") == "RT") // silent initial W
    assert(encode("") == (("", "")) && encode(null) == (("", "")))
  }

  test("column UDFs encode distributed string columns") {
    val got = Seq("Nation", "Bob").toDF("w").repartition(2)
      .select(col("w"), primaryCol(col("w")).as("p"),
        primaryCol(col("w"), encodeExact = true).as("px"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(got("Nation") == (("NXN", "NXN")))
    assert(got("Bob") == (("PP", "BB")))
  }
}

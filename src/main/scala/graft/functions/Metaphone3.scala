package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Std.Metaphone3 surface (reference `ecllibrary/std/Metaphone3.ecl`):
  * `primary` / `secondary` / `double` with the Metaphone-3 parameter set —
  * `encodeVowels` (non-initial vowel runs encode as 'A'), `encodeExact`
  * (voiced/unvoiced consonant pairs stay distinct: B/P, D/T, G/K, V/F,
  * Z/S, J), and `maxLength` (key truncation, 0 → the algorithm's default
  * of 8).
  *
  * The reference binds these entry points to an EXTERNAL library proxy
  * (`plugins/proxies/lib_metaphone3.ecllib`) — the algorithm body is not
  * in its tree and it ships no regression vectors for it (Metaphone 3
  * itself is a commercial product; only its parameter semantics and
  * improvements are published). This is therefore a from-scratch encoder
  * implementing the PUBLISHED contract — same API, same knob semantics,
  * phonetic rules composed from the public Metaphone-3 description
  * (vowel-run folding, voiced/unvoiced normalization, -TION/-SION → XN,
  * silent-letter clusters) on this engine's own rule machinery. Codes are
  * pinned as regression vectors (q148, Metaphone3Spec), not claimed
  * bit-compatible with the commercial library.
  *
  * Runs as a scalar UDF: pure JVM string code, partition-parallel, no
  * shuffle — scan-speed at any corpus size.
  */
object Metaphone3 {

  private def isVowel(c: Char): Boolean = "AEIOUY".indexOf(c) >= 0

  /** Both Metaphone-3 codes of a word under the given knobs. */
  def encode(input: String, encodeVowels: Boolean = false,
      encodeExact: Boolean = false, maxLength: Int = 0): (String, String) = {
    if (input == null) return ("", "")
    val s = input.toUpperCase.filter(c => c >= 'A' && c <= 'Z')
    if (s.isEmpty) return ("", "")
    val len = s.length
    val max = if (maxLength <= 0) 8 else maxLength
    val p = new StringBuilder
    val q = new StringBuilder
    def at(i: Int): Char = if (i >= 0 && i < len) s.charAt(i) else 0
    def in(i: Int, n: Int, opts: String*): Boolean =
      i >= 0 && i + n <= len && opts.contains(s.substring(i, i + n))
    def add(both: String): Unit = { p.append(both); q.append(both) }
    def add2(pr: String, se: String): Unit = { p.append(pr); q.append(se) }
    // voiced/unvoiced pair: exact mode keeps the voiced form
    def vx(voiced: String, unvoiced: String): String =
      if (encodeExact) voiced else unvoiced

    var i = 0
    // silent initial clusters
    if (in(0, 2, "GN", "KN", "PN", "WR", "PS", "MN")) i = 1
    if (at(0) == 'X') { add("S"); i = 1 }

    while (i < len && (p.length < max || q.length < max)) {
      val c = s.charAt(i)
      c match {
        case 'A' | 'E' | 'I' | 'O' | 'U' | 'Y' if c != 'Y' || !isConsY(s, i) =>
          // vowel run: initial always encodes; interior runs only under
          // encodeVowels — one 'A' per run
          val runStart = i == 0 || !isVowel(at(i - 1))
          if (runStart && (i == 0 || encodeVowels)) add("A")
          i += 1

        case 'B' =>
          // final MB: silent B (LAMB, CLIMB)
          if (at(i - 1) == 'M' && i == len - 1) i += 1
          else { add(vx("B", "P")); i += (if (at(i + 1) == 'B') 2 else 1) }

        case 'C' =>
          if (in(i, 2, "CH")) {
            // initial CH before a consonant is hard (CHRIS, CHLOE);
            // otherwise CH is the affricate with a hard alternate
            if (i == 0 && !isVowel(at(2)) && at(2) != 0) add("K")
            else if (in(0, 3, "SCH")) add("X")
            else add2("X", "K")
            i += 2
          } else if (in(i, 2, "CI", "CE", "CY")) {
            add("S"); i += 1
          } else if (in(i, 2, "CK")) {
            add("K"); i += 2
          } else { add("K"); i += (if (at(i + 1) == 'C') 2 else 1) }

        case 'D' =>
          if (in(i, 2, "DG") && in(i + 2, 1, "E", "I", "Y")) {
            add(vx("J", "J")); i += 3 // EDGE, JUDGING
          } else { add(vx("D", "T")); i += (if (in(i, 2, "DD", "DT")) 2 else 1) }

        case 'F' =>
          add("F"); i += (if (at(i + 1) == 'F') 2 else 1)

        case 'G' =>
          if (at(i + 1) == 'H') {
            if (i > 0 && !isVowel(at(i - 1))) { add(vx("G", "K")); i += 2 }
            else if (i == 0) {
              if (isVowel(at(2))) { add(vx("G", "K")); i += 2 }
              else i += 2
            } else i += 2 // interior GH after vowel: silent (LIGHT, WEIGH)
          } else if (at(i + 1) == 'N') {
            // interior GN: silent G with a pronounced alternate (SIGNED)
            add2("N", vx("GN", "KN")); i += 2
          } else if (in(i + 1, 1, "E", "I", "Y")) {
            add2("J", vx("G", "K")); i += 1 // GEORGE vs GET ambiguity
          } else { add(vx("G", "K")); i += (if (at(i + 1) == 'G') 2 else 1) }

        case 'H' =>
          // H is a sound only between/before vowels
          if ((i == 0 || isVowel(at(i - 1))) && isVowel(at(i + 1))) {
            add("H"); i += 2
          } else i += 1

        case 'J' =>
          add2("J", if (encodeExact) "J" else "A"); // JOSE alternate
          i += (if (at(i + 1) == 'J') 2 else 1)

        case 'K' =>
          add("K"); i += (if (at(i + 1) == 'K') 2 else 1)

        case 'L' =>
          add("L"); i += (if (at(i + 1) == 'L') 2 else 1)

        case 'M' =>
          add("M"); i += (if (at(i + 1) == 'M') 2 else 1)

        case 'N' =>
          add("N"); i += (if (at(i + 1) == 'N') 2 else 1)

        case 'P' =>
          if (at(i + 1) == 'H') { add("F"); i += 2 }
          else { add("P"); i += (if (in(i + 1, 1, "P", "B")) 2 else 1) }

        case 'Q' =>
          add("K"); i += (if (at(i + 1) == 'Q') 2 else 1)

        case 'R' =>
          add("R"); i += (if (at(i + 1) == 'R') 2 else 1)

        case 'S' =>
          if (in(i, 4, "SION") || in(i, 5, "SSION")) {
            add("XN"); i = i + (if (at(i + 1) == 'S') 5 else 4)
          } else if (at(i + 1) == 'H') { add("X"); i += 2 }
          else if (i == 0 && in(i, 2, "SM", "SN", "SL", "SW")) {
            add2("S", "X"); i += 1 // germanic alternates (SMITH → XMT)
          } else {
            add(if (encodeExact && isVowel(at(i - 1)) && isVowel(at(i + 1)))
              "Z" else "S")
            i += (if (at(i + 1) == 'S') 2 else 1)
          }

        case 'T' =>
          if (in(i, 4, "TION")) { add("XN"); i += 4 }
          else if (in(i, 2, "TH")) {
            add2("0", if (encodeExact) "0" else "T"); i += 2
          } else if (in(i, 3, "TCH")) { add("X"); i += 3 }
          else { add("T"); i += (if (in(i + 1, 1, "T", "D")) 2 else 1) }

        case 'V' =>
          add(vx("V", "F")); i += (if (at(i + 1) == 'V') 2 else 1)

        case 'W' =>
          if (isVowel(at(i + 1))) { add2("A", "F"); i += 1 } // WAGNER alt
          else i += 1 // silent W (WROTE handled at start; SAW)

        case 'X' =>
          add("KS"); i += (if (in(i + 1, 1, "C", "X")) 2 else 1)

        case 'Y' => // consonant Y (YELLOW): glide folds into vowel handling
          if (isVowel(at(i + 1))) { if (encodeVowels) add("A") }
          i += 1

        case 'Z' =>
          if (at(i + 1) == 'H') { add("J"); i += 2 }
          else { add(vx("Z", "S")); i += (if (at(i + 1) == 'Z') 2 else 1) }

        case _ => i += 1
      }
    }
    (p.toString.take(max), q.toString.take(max))
  }

  /** Y acting as a consonant (starts a syllable before a vowel). */
  private def isConsY(s: String, i: Int): Boolean =
    s.charAt(i) == 'Y' && i + 1 < s.length && isVowel(s.charAt(i + 1)) &&
      (i == 0 || !isVowel(s.charAt(i - 1)))

  def primary(s: String, encodeVowels: Boolean = false,
      encodeExact: Boolean = false, maxLength: Int = 0): String =
    encode(s, encodeVowels, encodeExact, maxLength)._1
  def secondary(s: String, encodeVowels: Boolean = false,
      encodeExact: Boolean = false, maxLength: Int = 0): String =
    encode(s, encodeVowels, encodeExact, maxLength)._2
  /** Metaphone3.double: primary immediately followed by secondary. */
  def dbl(s: String, encodeVowels: Boolean = false,
      encodeExact: Boolean = false, maxLength: Int = 0): String = {
    val (a, b) = encode(s, encodeVowels, encodeExact, maxLength); a + b
  }

  // Column forms (scalar UDFs — phonetic encoding has no Catalyst analog)
  def primaryCol(c: Column, encodeVowels: Boolean = false,
      encodeExact: Boolean = false, maxLength: Int = 0): Column =
    udf((s: String) => primary(s, encodeVowels, encodeExact, maxLength))
      .apply(c)
  def secondaryCol(c: Column, encodeVowels: Boolean = false,
      encodeExact: Boolean = false, maxLength: Int = 0): Column =
    udf((s: String) => secondary(s, encodeVowels, encodeExact, maxLength))
      .apply(c)
  def doubleCol(c: Column, encodeVowels: Boolean = false,
      encodeExact: Boolean = false, maxLength: Int = 0): Column =
    udf((s: String) => dbl(s, encodeVowels, encodeExact, maxLength)).apply(c)

  /** Pinned regression vectors for the q148 oracle: (word,
    * primary(default), secondary(default), primary(encodeVowels),
    * primary(encodeExact), primary(maxLength=3)). The reference ships no
    * Metaphone3 vectors (external-library proxy), so these LITERALS pin
    * this engine's encoding as its behavioral contract — an encoder change
    * that shifts any code fails both Metaphone3Spec and the q148 oracle.
    */
  val oracleVectors: Seq[(String, String, String, String, String, String)] =
    Seq(
      ("Algernon", "ALJRNN", "ALKRNN", "ALJARNAN", "ALJRNN", "ALJ"),
      ("Englebert", "ANKLPRT", "ANKLPRT", "ANKLAPAR", "ANGLBRT", "ANK"),
      ("Cholmondley", "XLMNTL", "KLMNTL", "XALMANTL", "XLMNDL", "XLM"),
      ("Farquar", "FRKR", "FRKR", "FARKAR", "FRKR", "FRK"),
      ("Smith", "SM0", "XMT", "SMA0", "SM0", "SM0"),
      ("Katherine", "K0RN", "KTRN", "KA0ARANA", "K0RN", "K0R"),
      ("Jackson", "JKSN", "AKSN", "JAKSAN", "JKSN", "JKS"),
      ("Thompson", "0MPSN", "TMPSN", "0AMPSAN", "0MPSN", "0MP"),
      ("Wright", "RT", "RT", "RAT", "RT", "RT"),
      ("Nation", "NXN", "NXN", "NAXN", "NXN", "NXN"),
      ("Passion", "PXN", "PXN", "PAXN", "PXN", "PXN"),
      ("Judge", "JJ", "AJ", "JAJ", "JJ", "JJ"),
      ("Climb", "KLM", "KLM", "KLAM", "KLM", "KLM"),
      ("Light", "LT", "LT", "LAT", "LT", "LT"),
      ("George", "JRJ", "KRK", "JARJA", "JRJ", "JRJ"),
      ("Vickers", "FKRS", "FKRS", "FAKARS", "VKRS", "FKR"),
      ("Fickers", "FKRS", "FKRS", "FAKARS", "FKRS", "FKR"),
      ("Bob", "PP", "PP", "PAP", "BB", "PP"),
      ("Pop", "PP", "PP", "PAP", "PP", "PP"),
      ("Zhao", "J", "J", "JA", "J", "J"))
}

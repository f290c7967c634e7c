package graft

import graft.functions.{EclFunctions, EclHash}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property tests for the ECL semantics layer (SURVEY §5 adoption:
  * "property tests for semantics-layer functions mirroring the rtl unit
  * tests"). Generated inputs run through real Spark plans in batches;
  * plain ScalaCheck Gen sampling (the scalatest bridge artifact is not in
  * the offline cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val asciiStr = Gen.listOf(Gen.choose(' ', '~')).map(_.mkString)

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  test("fnv1 is prefix-composable: hash(a+b) folds from hash(a)") {
    samples(Gen.zip(asciiStr, asciiStr), 200).foreach { case (a, b) =>
      val ab = a.getBytes("UTF-8")
      var h = EclHash.hash32(ab, ab.length)
      // FNV-1: multiply FIRST, then xor (APPLY_FNV32, eclrtl.cpp:3906)
      b.getBytes("UTF-8").foreach(x => h = (h * EclHash.Prime32) ^ (x & 0xff))
      val full = (a + b).getBytes("UTF-8")
      assert(h == EclHash.hash32(full, full.length))
    }
  }

  test("eclSubstring always returns exactly the requested width") {
    val cases = for {
      s <- Gen.listOfN(8, Gen.alphaChar).map(_.mkString)
      a <- Gen.choose(1, 12); len <- Gen.choose(1, 6)
    } yield (s, a, a + len - 1)
    val sample = Gen.listOfN(60, cases).sample.get
    val df = sample.map(_._1).toDF("s")
    sample.groupBy(c => (c._2, c._3)).foreach { case ((a, b), _) =>
      val widths = df.select(length(EclFunctions.eclSubstring(col("s"), a, b)))
        .as[Int].collect()
      assert(widths.forall(_ == b - a + 1), s"[$a..$b] widths: ${widths.toSet}")
    }
  }

  test("eclStrEq is blind to trailing spaces but not leading ones") {
    val words = Gen.listOfN(40, Gen.alphaStr.suchThat(_.nonEmpty)).sample.get
    val df = words.map(w => (w, w + "   ", " " + w)).toDF("w", "wt", "wl")
    val r = df.select(
      EclFunctions.eclStrEq(col("w"), col("wt")).as("t"),
      EclFunctions.eclStrEq(col("w"), col("wl")).as("l")).collect()
    assert(r.forall(_.getBoolean(0)))
    assert(r.forall(!_.getBoolean(1)))
  }

  test("toFixedString is idempotent at the same width and always width-n") {
    val strs = Gen.listOfN(50, asciiStr).sample.get
    val df = strs.toDF("s")
    val once = df.select(EclFunctions.toFixedString(col("s"), 10).as("f"))
    val twice = once.select(EclFunctions.toFixedString(col("f"), 10).as("f"))
    assert(once.as[String].collect().toSeq == twice.as[String].collect().toSeq)
    assert(once.select(length(col("f"))).as[Int].collect().forall(_ == 10))
  }

  test("Date_t roundtrips through fromDateT for arbitrary valid dates") {
    val dates = for {
      y <- Gen.choose(1970, 2100); m <- Gen.choose(1, 12)
      d <- Gen.choose(1, 28)
    } yield y * 10000 + m * 100 + d
    val sample = Gen.listOfN(80, dates).sample.get
    val df = sample.toDF("dt")
    val back = df.select(EclFunctions.toDateT(
      EclFunctions.fromDateT(col("dt"))).as("rt")).as[Int].collect()
    assert(back.toSeq == sample)
  }

  test("H3 is total: every (lat,lng,res) indexes validly, poles included") {
    val pts = for {
      lat <- Gen.choose(-90.0, 90.0); lng <- Gen.choose(-180.0, 180.0)
      res <- Gen.choose(0, 15)
    } yield (lat, lng, res)
    (samples(pts, 400) ++ Seq((90.0, 0.0, 15), (-90.0, 0.0, 15),
      (90.0, 180.0, 0), (-90.0, -180.0, 9), (0.0, 180.0, 7),
      (0.0, -180.0, 7))).foreach { case (la, ln, r) =>
      val c = graft.functions.H3.latLngToCell(la, ln, r)
      assert(graft.functions.H3.isValid(c), s"($la,$ln,$r)")
      assert(graft.functions.H3.resolution(c) == r)
      val (cla, cln) = graft.functions.H3.cellToLatLng(c)
      assert(cla >= -90.0 && cla <= 90.0 && cln >= -180.0 && cln <= 180.0)
      assert(graft.functions.H3.cellToBoundary(c).size == 6)
      if (r > 0)
        assert(graft.functions.H3.resolution(
          graft.functions.H3.parent(c, r - 1)) == r - 1)
    }
  }

  test("PhoneNumber.parse is total over arbitrary garbage") {
    val junk = Gen.oneOf(
      Gen.listOf(Gen.choose(' ', '~')).map(_.mkString),
      Gen.listOf(Gen.oneOf('+', '0', '1', '9', '(', ')', '-', ' ', '.'))
        .map(_.mkString),
      Gen.const(null: String).map(_ => "\u0000\uFFFF\n\t"))
    val regions = Gen.oneOf("US", "GB", "ZZ", "", "us", "de", "XXXXX")
    samples(Gen.zip(junk, regions), 400).foreach { case (n, r) =>
      val p = graft.functions.PhoneNumber.parse(n, r) // must not throw
      assert(p.error >= 0 && p.error <= 5)
      assert(p.lineType >= 0 && p.lineType <= 11)
      if (p.valid) assert(p.number.startsWith("+") && p.countryCode > 0)
    }
  }

  test("Nlp analyzers emit well-formed XML for arbitrary input") {
    val texts = Gen.listOf(Gen.frequency(
      8 -> Gen.choose(' ', '~'), 1 -> Gen.oneOf('<', '>', '&', '"'),
      1 -> Gen.oneOf('\u00e9', '\u4e2d', '\u200b'))).map(_.mkString)
    val db = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
    samples(texts, 150).foreach { t =>
      Seq("parse-en-us", "corporate", "telephone", "bogus").foreach { a =>
        val xml = graft.text.Nlp.analyzeText(a, t)
        db.parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
      }
    }
  }
}

package graft

import graft.text.Nlp
import org.scalatest.funsuite.AnyFunSuite

/** nlp plugin analog (ref `plugins/nlp/README.md` example analyzers):
  * pinned analyzer behaviors + well-formedness of the emitted XML (the
  * contract downstream FROMXML parsing depends on).
  */
class NlpSpec extends AnyFunSuite {

  private def parseXml(s: String) =
    javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(s.getBytes("UTF-8")))

  test("parse-en-us: ICU sentence segmentation beats naive period-splitting") {
    val xml = Nlp.analyzeText("parse-en-us",
      "Dr. Smith went to Washington. He arrived at 3 p.m. sharp. Done.")
    val doc = parseXml(xml)
    // ICU keeps "3 p.m. sharp" one sentence (lowercase continuation);
    // "Dr. Smith" does split (capitalized continuation) — pinned: 4
    // sentences where naive period-splitting would produce 6
    assert(doc.getElementsByTagName("sentence").getLength == 4,
      s"unexpected segmentation: $xml")
    // tokens include words AND punctuation (parse-tree contract)
    assert(xml.contains("<token>Dr</token>") ||
      xml.contains("<token>Dr.</token>"))
    assert(xml.contains("<token>.</token>") || xml.contains("Done"))
  }

  test("parse-en-us: token stream covers words, numbers, punctuation") {
    val xml = Nlp.analyzeText("parse-en-us",
      "The quick brown fox jumped over the lazy boy.")
    val doc = parseXml(xml)
    assert(doc.getElementsByTagName("sentence").getLength == 1)
    val toks = doc.getElementsByTagName("token")
    val texts = (0 until toks.getLength).map(toks.item(_).getTextContent)
    assert(texts.count(_.exists(Character.isLetter)) == 9)
    assert(texts.contains("."))
    // XML-hostile text escapes cleanly
    val esc = Nlp.analyzeText("parse-en-us", "a < b & c > d.")
    parseXml(esc) // must not throw
  }

  test("corporate: entity + suffix spans") {
    val xml = Nlp.analyzeText("corporate",
      "TAI has bought the American Medical Records Processing. " +
        "Acme Widgets Inc and Foo Bar Holdings were sold to Baz GmbH.")
    val doc = parseXml(xml)
    val names = {
      val nl = doc.getElementsByTagName("name")
      (0 until nl.getLength).map(nl.item(_).getTextContent)
    }
    assert(names.exists(_.endsWith("Acme Widgets")))
    assert(names.exists(_.endsWith("Foo Bar")))
    assert(names.exists(_.endsWith("Baz")))
    assert(doc.getElementsByTagName("company").getLength == 3)
  }

  test("telephone: candidates validated and E.164-normalized") {
    val xml = Nlp.analyzeText("telephone",
      "Call (650) 253-0000 today, or +44 20 7946 0958 from the UK. " +
        "Room 12345 is not a phone.")
    val doc = parseXml(xml)
    val phones = doc.getElementsByTagName("phone")
    assert(phones.getLength == 2, xml)
    val e164s = (0 until phones.getLength)
      .map(phones.item(_).getAttributes.getNamedItem("e164").getNodeValue)
    assert(e164s.contains("+16502530000") && e164s.contains("+442079460958"))
  }

  test("unknown analyzer: error document, not an exception") {
    val xml = Nlp.analyzeText("no-such-analyzer", "text")
    assert(xml.contains("unknown analyzer") &&
      xml.contains("no-such-analyzer"))
    parseXml(xml)
  }

  test("null/empty input: well-formed empty documents") {
    assert(Nlp.analyzeText("parse-en-us", null) == "<text/>")
    assert(Nlp.analyzeText("corporate", null) == "<companies/>")
    assert(parseXml(Nlp.analyzeText("telephone", ""))
      .getElementsByTagName("phone").getLength == 0)
    assert(parseXml(Nlp.analyzeText("parse-en-us", "")) != null)
  }
}

package graft.text

import com.ibm.icu.text.BreakIterator
import com.ibm.icu.util.ULocale

/** Text-analyzer service — the nlp plugin analog
  * (ref `plugins/nlp/lib_nlp.ecllib`, `nlp.cpp` — a wrapper around
  * VisualText's external nlp-engine; `plugins/nlp/README.md` documents the
  * contract: `AnalyzeText(analyzerName, text)` returns the analyzer's
  * emitted TEXT, conventionally XML that downstream ECL parses into
  * records with `FROMXML`). The engine itself is an external dependency,
  * not reference code; this analog implements the README's example
  * analyzers natively:
  *   - `parse-en-us` — sentence + token segmentation as an XML parse
  *     tree, via ICU4J BreakIterators (the same segmentation engine
  *     backing [[graft.functions.StdUni]]);
  *   - `corporate` — corporate-entity spans by capitalized-name +
  *     corporate-suffix matching;
  *   - `telephone` — phone-number spans validated + E.164-normalized
  *     through [[graft.functions.PhoneNumber]];
  * and mirrors the plugin's unknown-analyzer failure mode (an error
  * document rather than an exception — the engine logs and returns
  * empty).
  *
  * Scale shape: pure per-row string → string; composes with `xpath_*`
  * column functions for downstream extraction, so analyzer output feeds
  * ordinary scan-speed projections — no shuffle anywhere.
  */
object Nlp {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** `nlp.AnalyzeText(analyzerName, textToAnalyze)` (lib_nlp.ecllib). */
  def analyzeText(analyzer: String, text: String): String = analyzer match {
    case "parse-en-us" => parseEn(text)
    case "corporate" => corporate(text)
    case "telephone" => telephone(text)
    case other => s"""<error analyzer="${esc(other)}">unknown analyzer</error>"""
  }

  /** Sentence/token parse tree. ICU's sentence iterator handles
    * abbreviation edges ("Dr.", "p.m.") that naive period-splitting gets
    * wrong; tokens are non-whitespace segments (punctuation kept as
    * tokens, as a parse tree requires).
    */
  private def parseEn(text: String): String = {
    if (text == null) return "<text/>"
    val sb = new StringBuilder("<text>")
    val si = BreakIterator.getSentenceInstance(ULocale.US)
    si.setText(text)
    var sStart = si.first()
    var sEnd = si.next()
    var n = 0
    while (sEnd != BreakIterator.DONE) {
      val sentence = text.substring(sStart, sEnd)
      if (sentence.trim.nonEmpty) {
        n += 1
        sb.append(s"""<sentence n="$n">""")
        val wi = BreakIterator.getWordInstance(ULocale.US)
        wi.setText(sentence)
        var wStart = wi.first()
        var wEnd = wi.next()
        while (wEnd != BreakIterator.DONE) {
          val tok = sentence.substring(wStart, wEnd)
          if (tok.trim.nonEmpty)
            sb.append(s"<token>${esc(tok)}</token>")
          wStart = wEnd
          wEnd = wi.next()
        }
        sb.append("</sentence>")
      }
      sStart = sEnd
      sEnd = si.next()
    }
    sb.append("</text>").toString
  }

  /** Corporate-entity spans: one-or-more capitalized words followed by a
    * corporate suffix (the README's `corporate` analyzer demonstration).
    */
  private val CorpRx =
    ("((?:[A-Z][\\w&.-]*\\s+)*[A-Z][\\w&.-]*)\\s+" +
      "(Inc|Incorporated|Corp|Corporation|Ltd|Limited|LLC|PLC|Co|Company|" +
      "Group|Holdings|AG|GmbH|S\\.A\\.)\\.?(?=\\s|$|[,;:])").r

  private def corporate(text: String): String = {
    if (text == null) return "<companies/>"
    val hits = CorpRx.findAllMatchIn(text).map { m =>
      s"<company><name>${esc(m.group(1))}</name>" +
        s"<suffix>${esc(m.group(2))}</suffix></company>"
    }.mkString
    s"<companies>$hits</companies>"
  }

  /** Phone spans: candidate digit-runs validated through the
    * region-metadata parser; valid hits carry their E.164 form.
    */
  private val PhoneCandRx =
    "(\\+?[0-9][0-9 ().-]{5,18}[0-9])".r

  private def telephone(text: String): String = {
    if (text == null) return "<phones/>"
    val hits = PhoneCandRx.findAllMatchIn(text).flatMap { m =>
      val p = graft.functions.PhoneNumber.parse(m.group(1), "US")
      if (p.valid)
        Some(s"""<phone e164="${esc(p.number)}" region="${p.regionCode}">""" +
          esc(m.group(1).trim) + "</phone>")
      else None
    }.mkString
    s"<phones>$hits</phones>"
  }

  // ---- Spark Column surface ----------------------------------------------

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.udf

  private lazy val analyzeUdf =
    udf((analyzer: String, text: String) => analyzeText(analyzer, text))

  def analyzeTextCol(analyzer: Column, text: Column): Column =
    analyzeUdf(analyzer, text)
}

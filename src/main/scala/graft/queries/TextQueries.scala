package graft.queries

import graft.{QueryDef, Tables}
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Training-data text pipeline: exact dedup, quality scoring, language ID,
  * token counting, fingerprinting, shingling, MinHash+LSH near-dup
  * candidates, exact Jaccard verification, SimHash + hamming near-dup.
  * All md5-based so the DuckDB oracle reproduces hashes exactly.
  */
object TextQueries {

  /** Shared oracle CTEs: tokenized words with positions + 3-shingles. */
  private val WordsCte =
    """base AS (SELECT doc_id, trim(text) AS t FROM documents),
      |wp AS (
      |  SELECT doc_id,
      |    UNNEST(string_split_regex(t, '\s+')) AS word,
      |    UNNEST(range(len(string_split_regex(t, '\s+')))) AS pos
      |  FROM base),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM (
      |  SELECT doc_id,
      |    word || ' ' || LEAD(word,1) OVER w || ' ' || LEAD(word,2) OVER w AS shingle
      |  FROM wp WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      |  QUALIFY shingle IS NOT NULL))""".stripMargin

  private val MinhashCte =
    s"""$WordsCte,
       |m AS (
       |  SELECT doc_id, s.i,
       |    MIN(md5(CAST(s.i AS VARCHAR) || '|' || shingle)) AS h
       |  FROM sh CROSS JOIN (SELECT UNNEST(range(8)) AS i) s
       |  GROUP BY doc_id, s.i),
       |bands AS (
       |  SELECT doc_id, i // 2 AS band, md5(STRING_AGG(h, '' ORDER BY i)) AS bk
       |  FROM m GROUP BY doc_id, i // 2),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id)""".stripMargin

  private def docShingles(s: org.apache.spark.sql.SparkSession, dir: String) =
    TextOps.shingles(Tables.documents(s, dir), col("doc_id"), col("text"), 3)

  /** Hand-derived RFC 3986 canonicalization vectors (input → canonical)
    * covering every rule in TextOps.UrlCanonPatterns: case folding,
    * default ports, fragments, tracking params in each query position,
    * dup slashes, trailing slash, emptied query.
    */
  private val UrlVectors: Seq[(String, String)] = Seq(
    "HTTP://Example.COM/Path/To/Page" -> "http://example.com/Path/To/Page",
    "https://Example.com:443/a"       -> "https://example.com/a",
    "http://example.com:80/"          -> "http://example.com",
    "http://example.com:8080/a"       -> "http://example.com:8080/a",
    "https://a.com/page#Section-2"    -> "https://a.com/page",
    "https://a.com/p?utm_source=x&utm_medium=y" -> "https://a.com/p",
    "https://a.com/p?id=7&utm_campaign=z" -> "https://a.com/p?id=7",
    "https://a.com/p?utm_source=x&id=7"   -> "https://a.com/p?id=7",
    "https://a.com/p?fbclid=AbC123"       -> "https://a.com/p",
    "https://a.com/p?gclid=1&q=spark&utm_term=t" -> "https://a.com/p?q=spark",
    "https://a.com//b///c"            -> "https://a.com/b/c",
    "https://a.com/b/c/"              -> "https://a.com/b/c",
    "https://A.com/p?"                -> "https://a.com/p",
    "https://a.com/p?utm_source=x#frag" -> "https://a.com/p",
    "http://a.com:80"                 -> "http://a.com",
    "https://a.com/p?a=1&b=2#x"       -> "https://a.com/p?a=1&b=2")

  val defs: Seq[QueryDef] = Seq(

    // ---- PII audit + scrub: the redaction pass every training pipeline
    // runs before anything else. The corpus carries no natural PII, so the
    // query synthesizes it deterministically on BOTH engines (the q106
    // literal-vector pattern), then counts pre-scrub and fingerprints the
    // scrubbed text. Patterns are RE2-compatible so DuckDB applies the
    // identical expressions (with 'g' — DuckDB replaces first-only by
    // default, Spark replaces all).
    QueryDef("q70_pii_scrub", {
      val Seq(email, ssn, phone, ip) = TextOps.PiiPatterns.map(_._1)
      s"""WITH aug AS (SELECT doc_id,
         |  text || CASE
         |    WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
         |    WHEN doc_id % 3 = 1 THEN ' call (555) 123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' or 123-45-6789'
         |    ELSE ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
         |  END AS t FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '$email')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(t, '$ssn')) AS BIGINT) AS n_ssn,
         |  CAST(len(regexp_extract_all(t, '$phone')) AS BIGINT) AS n_phone,
         |  CAST(len(regexp_extract_all(t, '$ip')) AS BIGINT) AS n_ip,
         |  md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         |    t, '$email', '<EMAIL>', 'g'), '$ssn', '<SSN>', 'g'),
         |    '$phone', '<PHONE>', 'g'), '$ip', '<IP>', 'g')) AS scrubbed_fp
         |FROM aug ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val Seq(email, ssn, phone, ip) = TextOps.PiiPatterns.map(_._1)
      val aug = Tables.documents(s, dir).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com now")))
          .when(col("doc_id") % 3 === 1,
            concat(lit(" call (555) 123-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
              lit(" or 123-45-6789")))
          .otherwise(concat(lit(" from 10.0."),
            (col("doc_id") % 256).cast("string"), lit(".7")))).as("t"))
      aug.select(col("doc_id"),
          TextOps.piiCount(col("t"), email).as("n_email"),
          TextOps.piiCount(col("t"), ssn).as("n_ssn"),
          TextOps.piiCount(col("t"), phone).as("n_phone"),
          TextOps.piiCount(col("t"), ip).as("n_ip"),
          md5(TextOps.scrubPii(col("t"))).as("scrubbed_fp"))
        .orderBy(col("doc_id"))
    },

    // ---- benchmark decontamination: training docs sharing any 8-gram
    // with the (broadcast) eval split. Eval set = doc_id % 97 == 0.
    QueryDef("q71_decontaminate", {
      val leads = (1 to 7).map(j => s"LEAD(word,$j) OVER w").mkString(" || ' ' || ")
      s"""WITH $WordsCte,
         |g8 AS (SELECT DISTINCT doc_id, shingle FROM (
         |  SELECT doc_id, word || ' ' || $leads AS shingle
         |  FROM wp WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
         |  QUALIFY shingle IS NOT NULL)),
         |ev AS (SELECT DISTINCT shingle FROM g8 WHERE doc_id % 97 = 0),
         |h AS (SELECT t.doc_id, COUNT(DISTINCT t.shingle) AS n
         |      FROM g8 t JOIN ev ON ev.shingle = t.shingle
         |      WHERE t.doc_id % 97 <> 0 GROUP BY t.doc_id)
         |SELECT d.doc_id, CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
         |LEFT JOIN h ON h.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    }) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      TextOps.decontaminate(
          docs.filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0),
          col("doc_id"), col("text"), 8)
        .orderBy(col("doc_id"))
    },

    // ---- cross-document duplicate passages: 5-grams in >= 2 docs. One
    // linear gram shuffle (exact variant; winnow anchors are the sampled
    // scale path, q97).
    QueryDef("q73_dup_passages", {
      val leads = (1 to 4).map(j => s"LEAD(word,$j) OVER w").mkString(" || ' ' || ")
      s"""WITH $WordsCte,
         |p5 AS (SELECT doc_id, shingle FROM (
         |  SELECT doc_id, word || ' ' || $leads AS shingle
         |  FROM wp WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
         |  QUALIFY shingle IS NOT NULL))
         |SELECT shingle,
         |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(COUNT(*) AS BIGINT) AS n_occ,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM p5 GROUP BY shingle HAVING COUNT(DISTINCT doc_id) >= 2
         |ORDER BY shingle""".stripMargin
    }) { (s, dir) =>
      TextOps.duplicatePassages(Tables.documents(s, dir),
          col("doc_id"), col("text"), 5)
        .orderBy(col("shingle"))
    },

    // ---- BM25 relevance scoring (data-curation quality/relevance
    // feature). Per-term scores are raw double math, identical expression
    // trees on both engines; the per-doc sum routes through DECIMAL(25,6)
    // so summation order can't smear low bits.
    QueryDef("q74_bm25",
      """WITH w AS (SELECT doc_id,
        |    UNNEST(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents),
        |dls AS (SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS dl
        |  FROM documents),
        |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dls),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w
        |  WHERE term IN ('spark', 'hash', 'join', 'window')
        |  GROUP BY doc_id, term),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |s AS (SELECT tf.doc_id,
        |    ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
        |             / (CAST(df AS DOUBLE) + 0.5))
        |    * (CAST(tf AS DOUBLE) * 2.2)
        |    / (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 *
        |        (CAST(dl AS DOUBLE)
        |         / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))) AS sc
        |  FROM tf JOIN dfreq USING (term) JOIN dls USING (doc_id)
        |  CROSS JOIN stats)
        |SELECT doc_id, CAST(CAST(SUM(CAST(sc AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS bm25
        |FROM s GROUP BY doc_id ORDER BY bm25 DESC, doc_id""".stripMargin) { (s, dir) =>
      TextOps.bm25(Tables.documents(s, dir), col("doc_id"), col("text"),
          Seq("spark", "hash", "join", "window"))
        .orderBy(col("bm25").desc, col("doc_id"))
    },

    // ---- the FLAGSHIP composite: a full curation pipeline in one plan.
    // quality filter → lang-ID → exact dedup (min-id per fingerprint) →
    // near-dup component dedup (LSH edges + connected components, keep
    // component min) → drop the eval split + 8-gram-contaminated docs →
    // deterministic 50% hash sample → PII-scrubbed content fingerprint.
    // Every stage reuses an individually-gated operator (q80-q99 family);
    // this gate proves they COMPOSE — the "documents in, training set
    // out" contract a pipeline user actually runs.
    QueryDef("q76_curation_pipeline", {
      val stops = TextOps.EnStopwords.map(w => s"'$w'").mkString(",")
      val leads8 = (1 to 7).map(j => s"LEAD(word,$j) OVER w").mkString(" || ' ' || ")
      val scrub = TextOps.PiiPatterns.foldLeft("text") {
        case (e, (p, r)) => s"regexp_replace($e, '$p', '$r', 'g')"
      }
      s"""WITH RECURSIVE
         |docs_q AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE len(string_split_regex(trim(text), '\\s+')) >= 50
         |    AND CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |          w -> w IN ($stops))) AS DOUBLE)
         |        / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE)
         |          >= 0.03),
         |docs_f AS (
         |  SELECT doc_id, text FROM (
         |    SELECT doc_id, text,
         |      md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
         |    FROM docs_q)
         |  QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY fp)),
         |${MinhashCte.replace("FROM documents)", "FROM docs_f)")},
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
         |i AS (
         |  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
         |  FROM cand c
         |  JOIN sh a ON a.doc_id = c.doc_a
         |  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
         |  GROUP BY c.doc_a, c.doc_b),
         |e AS (
         |  SELECT i.doc_a, i.doc_b
         |  FROM i
         |  JOIN sz sa ON sa.doc_id = i.doc_a
         |  JOIN sz sb ON sb.doc_id = i.doc_b
         |  WHERE CAST(i.inter AS DOUBLE)
         |    / CAST(sa.sz + sb.sz - i.inter AS DOUBLE) >= 0.5),
         |sym AS (SELECT doc_a AS a, doc_b AS b FROM e
         |        UNION ALL SELECT doc_b, doc_a FROM e),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM docs_f
         |  UNION
         |  SELECT s.b, r.r FROM reach r JOIN sym s ON s.a = r.id),
         |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
         |nd AS (SELECT d.doc_id, d.text FROM docs_f d
         |       JOIN comp c ON c.id = d.doc_id AND c.id = c.component),
         |train AS (SELECT doc_id, text FROM nd WHERE doc_id % 97 <> 0),
         |basea AS (SELECT doc_id, trim(text) AS t FROM documents),
         |wpa AS (
         |  SELECT doc_id,
         |    UNNEST(string_split_regex(t, '\\s+')) AS word,
         |    UNNEST(range(len(string_split_regex(t, '\\s+')))) AS pos
         |  FROM basea),
         |g8 AS (SELECT DISTINCT doc_id, shingle FROM (
         |  SELECT doc_id, word || ' ' || $leads8 AS shingle
         |  FROM wpa WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
         |  QUALIFY shingle IS NOT NULL)),
         |ev AS (SELECT DISTINCT shingle FROM g8 WHERE doc_id % 97 = 0),
         |clean AS (SELECT t.doc_id, t.text FROM train t WHERE NOT EXISTS (
         |  SELECT 1 FROM g8 g JOIN ev ON ev.shingle = g.shingle
         |  WHERE g.doc_id = t.doc_id)),
         |sampled AS (SELECT doc_id, text FROM clean
         |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
         |        % 100 < 50)
         |SELECT doc_id, md5($scrub) AS content_fp
         |FROM sampled ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      // 1+2: quality + language gate (scan-speed scalar predicates)
      val qual = docs.filter(size(TextOps.words(col("text"))) >= 50 &&
        TextOps.langIdEn(col("text")) === "en")
      // 3: exact dedup — min doc_id per content fingerprint
      val fpd = qual.select(col("doc_id"), col("text"),
        TextOps.fingerprint(col("text")).as("fp"))
      val mins = fpd.groupBy("fp").agg(min(col("doc_id")).as("mn"))
      val base = graft.ops.Shape.split(fpd.join(mins, "fp")
        .filter(col("doc_id") === col("mn")).select("doc_id", "text"))
      // 4: near-dup components over the survivors, keep component min
      val sets = graft.ops.Shape.split(TextOps.shingleSet(
        base, col("doc_id"), col("text"), 3))
      val bands = graft.ops.Shape.split(
        TextOps.lshBandKeys(TextOps.minhashSig(sets, 8), 8, 2))
      val edges = TextOps.lshJaccardPairs(bands, sets, 0.5)
      val comp = graft.ops.Graph.connectedComponents(
        base, col("doc_id"), edges, col("doc_a"), col("doc_b"))
      val nd = base.join(comp.filter(col("id") === col("component"))
        .select(col("id").as("doc_id")), "doc_id")
      // 5: decontamination — drop the eval split and overlapping docs
      val train = nd.filter(col("doc_id") % 97 =!= 0)
      val hits = TextOps.decontaminate(train,
        docs.filter(col("doc_id") % 97 === 0), col("doc_id"), col("text"), 8)
      val clean = train.join(
        hits.filter(col("n_hits") === 0).select("doc_id"), "doc_id")
      // 6+7: deterministic sample, PII-scrubbed content fingerprint
      clean.filter(graft.ops.Sorting.hashSamplePred(col("doc_id"), lit(50)))
        .select(col("doc_id"),
          md5(TextOps.scrubPii(col("text"))).as("content_fp"))
        .orderBy(col("doc_id"))
    },

    // ---- exact dedup: content-hash clusters, keep min doc_id -------------
    QueryDef("q80_dedup_exact",
      """SELECT md5(text) AS fp, COUNT(*) AS n, MIN(doc_id) AS keeper
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .groupBy(md5(col("text")).as("fp"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keeper"))
        .orderBy(col("fp"))
    },

    // ---- quality scoring signals -----------------------------------------
    QueryDef("q81_quality",
      """WITH d AS (SELECT doc_id, text,
        |    string_split_regex(trim(text), '\s+') AS ws FROM documents)
        |SELECT doc_id,
        |  CAST(len(ws) AS BIGINT) AS n_tokens,
        |  CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
        |    / CAST(len(ws) AS DOUBLE) AS mean_token_len,
        |  CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to','in','is','that','it','for'))) AS DOUBLE)
        |    / CAST(len(ws) AS DOUBLE) AS stopword_ratio,
        |  CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
        |    / CAST(length(text) AS DOUBLE) AS punct_ratio
        |FROM d ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id") +: TextOps.qualityColumns(col("text")): _*)
        .orderBy(col("doc_id"))
    },

    // ---- language ID (stopword-ratio heuristic) vs labeled lang ----------
    QueryDef("q82_langid",
      """WITH d AS (SELECT lang,
        |    string_split_regex(trim(text), '\s+') AS ws FROM documents),
        |p AS (SELECT lang,
        |  CASE WHEN len(ws) > 0 AND
        |    CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to','in','is','that','it','for'))) AS DOUBLE)
        |      / CAST(len(ws) AS DOUBLE) >= 0.03
        |  THEN 'en' ELSE 'und' END AS pred FROM d)
        |SELECT lang, pred, COUNT(*) AS n FROM p
        |GROUP BY lang, pred ORDER BY lang, pred""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("lang"), TextOps.langIdEn(col("text")).as("pred"))
        .groupBy(col("lang"), col("pred")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("pred"))
    },

    // ---- BPE-ish token counting ------------------------------------------
    QueryDef("q83_tokens",
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|\S')) AS BIGINT) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextOps.tokenCount(col("text")).cast("long").as("n_bpe"))
        .orderBy(col("doc_id"))
    },

    // ---- q189: training-sequence packing manifest (GPT-style document
    // concatenation into fixed context windows; the global token offset is
    // the two-pass Positions prefix sum, NEVER a single-partition window).
    QueryDef("q189_sequence_pack",
      """WITH t AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|\S')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |    SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t WHERE n_tokens > 0)
        |SELECT doc_id, n_tokens, CAST(cum - n_tokens AS BIGINT) AS tok_offset,
        |  CAST(FLOOR((cum - n_tokens) / 2048.0) AS BIGINT) AS seq_first,
        |  CAST(FLOOR((cum - 1) / 2048.0) AS BIGINT) AS seq_last
        |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.text.TextOps.packSequences(Tables.documents(s, dir),
          col("doc_id"), graft.text.TextOps.tokenCount(col("text")), 2048)
        .orderBy(col("doc_id"))
    },

    // ---- content fingerprint ---------------------------------------------
    QueryDef("q84_fingerprint",
      """SELECT doc_id,
        |  md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    },

    // ---- winnowing fingerprints (Schleimer'03 local-minimum selection) ---
    // Character 8-gram hashes, window 16; emit each doc's FIRST 10
    // fingerprints (sorted-distinct) — the partial-content-reuse signature
    // the whole-doc hash (q84) can't give. The oracle replays the same
    // md5-prefix hashes and sliding minima with list comprehensions.
    QueryDef("q97_winnow",
      """WITH b AS (SELECT doc_id,
        |    regexp_replace(trim(text), '\s+', ' ', 'g') AS t
        |  FROM documents WHERE doc_id < 100),
        |g AS (SELECT doc_id,
        |    list_transform(range(1, greatest(length(t) - 6, 1)),
        |      i -> ('0x' || substr(md5(substr(t, CAST(i AS INTEGER), 8)), 1, 15))::BIGINT)
        |      AS gh,
        |    length(t) AS n
        |  FROM b),
        |w AS (SELECT doc_id,
        |    CASE WHEN len(gh) >= 16 THEN
        |      list_sort(list_distinct(list_transform(range(1, len(gh) - 14),
        |        j -> list_min(list_slice(gh, CAST(j AS INTEGER), CAST(j + 15 AS INTEGER))))))
        |    ELSE [] END AS fps
        |  FROM g WHERE n >= 8)
        |SELECT doc_id, CAST(unnest(list_slice(fps, 1, 10)) AS BIGINT) AS fp
        |FROM w ORDER BY doc_id, fp""".stripMargin) { (s, dir) =>
      TextOps.winnow(
          Tables.documents(s, dir).filter(col("doc_id") < 100),
          col("doc_id"), col("text"), k = 8, window = 16)
        .select(col("doc_id"),
          explode(slice(col("fingerprints"), 1, 10)).as("fp"))
        .orderBy(col("doc_id"), col("fp"))
    },

    // ---- word 3-shingling (the n-gram substrate) -------------------------
    QueryDef("q85_shingle_stats",
      s"""WITH $WordsCte
         |SELECT doc_id, COUNT(*) AS n_shingles FROM sh
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docShingles(s, dir)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
        .orderBy(col("doc_id"))
    },

    // ---- MinHash (8 seeds) + LSH (4 bands × 2) candidate pairs -----------
    QueryDef("q86_minhash_lsh",
      s"""WITH $MinhashCte
         |SELECT doc_a, doc_b FROM cand ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      // array-wise pipeline: shingle set → signature → band keys all run in
      // one scalar projection; bands persist (TAKsplit) for the self-join
      val bands = graft.ops.Shape.split(TextOps.lshBandKeys(
        TextOps.minhashSig(TextOps.shingleSet(
          Tables.documents(s, dir), col("doc_id"), col("text"), 3), 8), 8, 2))
      TextOps.lshCandidates(bands)
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // ---- exact n-gram Jaccard over the LSH candidates --------------------
    QueryDef("q87_jaccard",
      s"""WITH $MinhashCte,
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
         |i AS (
         |  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
         |  FROM cand c
         |  JOIN sh a ON a.doc_id = c.doc_a
         |  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
         |  GROUP BY c.doc_a, c.doc_b)
         |SELECT c.doc_a, c.doc_b,
         |  CAST(COALESCE(i.inter, 0) AS DOUBLE)
         |    / CAST(sa.sz + sb.sz - COALESCE(i.inter, 0) AS DOUBLE) AS jac
         |FROM cand c
         |LEFT JOIN i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
         |JOIN sz sa ON sa.doc_id = c.doc_a
         |JOIN sz sb ON sb.doc_id = c.doc_b
         |ORDER BY c.doc_a, c.doc_b""".stripMargin) { (s, dir) =>
      // TAKsplit analogs: the packed shingle sets feed the signature AND
      // the jaccard refine; bands feed both sides of the bucket join
      val sets = graft.ops.Shape.split(TextOps.shingleSet(
        Tables.documents(s, dir), col("doc_id"), col("text"), 3))
      val bands = graft.ops.Shape.split(
        TextOps.lshBandKeys(TextOps.minhashSig(sets, 8), 8, 2))
      // bucket-local fused refine at minJac 0: every candidate pair with
      // its exact jaccard, no per-pair payload shuffle
      TextOps.lshJaccardPairs(bands, sets, 0.0)
        .select(col("doc_a"), col("doc_b"), col("jac"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // ---- unigram-LM quality score (the CCNet-style perplexity proxy):
    // score every document by the mean negative log-probability of its
    // tokens under the corpus's own add-one-smoothed unigram LM. The
    // per-token -ln routes through DECIMAL(25,15) on BOTH engines so the
    // aggregate is order-independent (the term join scatters a doc's
    // tokens across partitions). ------------------------------------------
    QueryDef("q72_unigram_lm",
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(trim(text), '\s+'), w -> w <> '')) AS t
        |  FROM documents),
        |vocab AS (SELECT t, COUNT(*) AS c FROM toks GROUP BY t),
        |tot AS (SELECT SUM(c) AS tt, COUNT(*) AS v FROM vocab)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  round(CAST(CAST(SUM(CAST(-ln((c + 1.0) / (tt + v)) AS DECIMAL(25,15)))
        |      AS VARCHAR) AS DOUBLE) / COUNT(*), 6) AS avg_neg_logp
        |FROM toks JOIN vocab USING (t) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextOps.unigramScore(Tables.documents(s, dir), col("doc_id"),
          col("text"))
        .orderBy(col("doc_id"))
    },

    // ---- temperature-scaled mixture weights (multilingual data mixing):
    // weights ∝ count^alpha with alpha=0.5 — the published recipe for
    // upsampling tail strata; sample_rate realizes the mixture with the
    // most-upsampled stratum kept whole. O(#strata) arithmetic after one
    // count aggregate. ----------------------------------------------------
    QueryDef("q79_mixture_weights",
      """WITH c AS (SELECT lang AS stratum, COUNT(*) AS n
        |  FROM documents GROUP BY lang),
        |t AS (SELECT SUM(n) AS tn, SUM(pow(n, 0.5)) AS tw FROM c),
        |w AS (SELECT stratum, n,
        |    n / CAST(tn AS DOUBLE) AS share0,
        |    pow(n, 0.5) / tw AS weight0
        |  FROM c CROSS JOIN t),
        |m AS (SELECT MAX(weight0 / share0) AS mr FROM w)
        |SELECT stratum, n, round(share0, 6) AS share,
        |  round(weight0, 6) AS weight,
        |  round((weight0 / share0) / mr, 6) AS sample_rate
        |FROM w CROSS JOIN m ORDER BY stratum""".stripMargin) { (s, dir) =>
      TextOps.mixtureWeights(Tables.documents(s, dir), col("lang"), 0.5)
        .orderBy(col("stratum"))
    },

    // ---- repetition signals (training-data quality): distinct-token ratio
    // and repeated bigram/trigram fractions — the standard "repetitious
    // document" filters. All per-row array ops, zero shuffles before the
    // final sort.
    QueryDef("q95_repetition",
      """WITH base AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |m AS (SELECT doc_id, len(toks) AS n,
        |  len(list_distinct(toks)) AS d1,
        |  len(list_distinct(list_transform(range(len(toks)-1),
        |    i -> toks[i+1] || ' ' || toks[i+2]))) AS d2,
        |  len(list_distinct(list_transform(range(len(toks)-2),
        |    i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS d3
        | FROM base WHERE len(toks) >= 3)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |  round(d1*1.0/n, 6) AS distinct_ratio,
        |  round(1 - d2*1.0/(n-1), 6) AS rep2,
        |  round(1 - d3*1.0/(n-2), 6) AS rep3
        |FROM m ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val toks = TextOps.words(col("text"))
      val n = size(toks)
      Tables.documents(s, dir)
        .select(col("doc_id"), n.as("n"), toks.as("toks"))
        .filter(col("n") >= 3)
        .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
          round(size(array_distinct(col("toks"))) * lit(1.0) / col("n"), 6)
            .as("distinct_ratio"),
          round(lit(1) - size(array_distinct(transform(
              sequence(lit(1), col("n") - 1), i => concat_ws(" ",
                element_at(col("toks"), i), element_at(col("toks"), i + 1)))))
            * lit(1.0) / (col("n") - 1), 6).as("rep2"),
          round(lit(1) - size(array_distinct(transform(
              sequence(lit(1), col("n") - 2), i => concat_ws(" ",
                element_at(col("toks"), i), element_at(col("toks"), i + 1),
                element_at(col("toks"), i + 2)))))
            * lit(1.0) / (col("n") - 2), 6).as("rep3"))
        .orderBy(col("doc_id"))
    },

    // ---- deterministic stratified hash sampling (training-data mixing):
    // downsample dominant 'en' to 10%, keep 50% of the rest. Content-
    // addressed md5 decision — reproducible on any engine/partitioning.
    QueryDef("q96_hash_sample",
      """SELECT doc_id, lang
        |FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
        |      % 100 < (CASE WHEN lang = 'en' THEN 10 ELSE 50 END)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.ops.Sorting.hashSampleBy(Tables.documents(s, dir),
          col("doc_id"), col("lang"), Map("en" -> 10), 50)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    },

    // ---- SimHash (16-bit, frequency-weighted) ----------------------------
    QueryDef("q88_simhash", {
      val bitSums = (0 until 16).map(j =>
        s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j").mkString(",\n  ")
      val fp = (0 until 16).map(j =>
        s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
      s"""WITH tok AS (
         |  SELECT doc_id, UNNEST(string_split_regex(trim(text), '\\s+')) AS word
         |  FROM documents),
         |h AS (SELECT doc_id, ('0x' || substr(md5(word), 1, 4))::BIGINT AS h FROM tok),
         |agg AS (SELECT doc_id,
         |  $bitSums
         |  FROM h GROUP BY doc_id)
         |SELECT doc_id, CAST($fp AS BIGINT) AS simhash
         |FROM agg ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      TextOps.simhash16(Tables.documents(s, dir), col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
    },

    // ---- SimHash near-dup pairs: hamming distance <= 3 -------------------
    QueryDef("q89_simhash_neardup", {
      // 60-bit fingerprint (15 md5 hex digits): 4 bands × 15 bits gives the
      // banded join 32k keys per band, so buckets stay collision-only as
      // the corpus grows. 16 bits left band buckets ~N/16 deep — the join
      // was equality-shaped but still near-quadratic work.
      val bitSums = (0 until 60).map(j =>
        s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j").mkString(",\n  ")
      val fp = (0 until 60).map(j =>
        s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
      s"""WITH tok AS (
         |  SELECT doc_id, UNNEST(string_split_regex(trim(text), '\\s+')) AS word
         |  FROM documents),
         |h AS (SELECT doc_id, ('0x' || substr(md5(word), 1, 15))::BIGINT AS h FROM tok),
         |agg AS (SELECT doc_id,
         |  $bitSums
         |  FROM h GROUP BY doc_id),
         |sh AS (SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM agg)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin
    }) { (s, dir) =>
      // banded candidate generation (TextOps.simhashNearDup): equality join
      // on (band, key) — the oracle's all-pairs SQL is the SPEC, not the plan
      val sh = TextOps.simhashWide(Tables.documents(s, dir), col("doc_id"),
        col("text"), nBits = 60)
      TextOps.simhashNearDup(sh, nBits = 60)
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // ---- near-dup CLUSTER resolution: connected components over the
    // verified (jaccard >= 0.5) LSH pair graph. Near-dup relations aren't
    // transitive, so corpus dedup labels components and keeps min-id per
    // component. Engine: alternating large-star/small-star contraction
    // (O(log n) rounds, each a bucket-local shuffle). The oracle's
    // recursive-CTE transitive closure is the SPEC, not the plan — closure
    // materializes O(component²) tuples and only DuckDB at sf0.01 can
    // afford it.
    QueryDef("q99_dedup_components",
      s"""WITH RECURSIVE $MinhashCte,
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
         |i AS (
         |  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
         |  FROM cand c
         |  JOIN sh a ON a.doc_id = c.doc_a
         |  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
         |  GROUP BY c.doc_a, c.doc_b),
         |e AS (
         |  SELECT i.doc_a, i.doc_b
         |  FROM i
         |  JOIN sz sa ON sa.doc_id = i.doc_a
         |  JOIN sz sb ON sb.doc_id = i.doc_b
         |  WHERE CAST(i.inter AS DOUBLE)
         |    / CAST(sa.sz + sb.sz - i.inter AS DOUBLE) >= 0.5),
         |sym AS (SELECT doc_a AS a, doc_b AS b FROM e
         |        UNION ALL SELECT doc_b, doc_a FROM e),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT s.b, r.r FROM reach r JOIN sym s ON s.a = r.id)
         |SELECT id AS doc_id, MIN(r) AS component,
         |  CASE WHEN id = MIN(r) THEN 1 ELSE 0 END AS is_keeper
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val sets = graft.ops.Shape.split(TextOps.shingleSet(
        Tables.documents(s, dir), col("doc_id"), col("text"), 3))
      val bands = graft.ops.Shape.split(
        TextOps.lshBandKeys(TextOps.minhashSig(sets, 8), 8, 2))
      // bucket-local fused refine: ships each set once per band, not once
      // per candidate pair (TextOps.lshJaccardPairs scaladoc)
      val edges = TextOps.lshJaccardPairs(bands, sets, 0.5)
      graft.ops.Graph.connectedComponents(
          Tables.documents(s, dir), col("doc_id"),
          edges, col("doc_a"), col("doc_b"))
        .select(col("id").as("doc_id"), col("component"),
          when(col("id") === col("component"), 1)
            .otherwise(0).cast("int").as("is_keeper"))
        .orderBy(col("doc_id"))
    },

    // ---- BPE tokenizer (Sennrich 2016): trained distributed (word-count
    // shuffle, bounded dict to the driver), encoded scan-side. The gate
    // trains 8 merges on the classic low/lower/newest/widest corpus and
    // encodes held-out words; the oracle pins the HAND-DERIVED merges and
    // tokenizations literally (the q106 vector pattern — BPE is beyond
    // SQL, determinism via lexicographic tie-breaks makes pinning sound).
    QueryDef("q166_bpe",
      """SELECT * FROM (VALUES
        |  ('low', 'low'),
        |  ('lower', 'low e r'),
        |  ('lowest', 'low est'),
        |  ('newer', 'n ew e r'),
        |  ('newest', 'newest'),
        |  ('widest', 'w i dest')) AS t(word, toks)
        |ORDER BY word""".stripMargin) { (s, dir) =>
      import s.implicits._
      val corpus = Seq(
        "low low low low low",
        "lower lower newest newest newest newest newest newest",
        "widest widest widest").toDF("text")
      val merges = graft.text.Bpe.trainOnCorpus(corpus, col("text"), 8)
      val tests = Seq("low", "lower", "lowest", "newer", "newest", "widest")
        .toDF("word")
      graft.text.Bpe.tokenize(tests, col("word"), col("word"), merges)
        .groupBy(col("doc_id").as("word"))
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("token")))),
            x => x.getField("token")), " ").as("toks"))
        .orderBy(col("word"))
    },

    // ---- context-length chunking: 12-token windows, 4-token overlap
    // (stride 8). The oracle recomputes every chunk from DuckDB's own
    // token list — chunk index, token count, and an md5 over the joined
    // window must all agree. ----------------------------------------------
    QueryDef("q167_chunk",
      """WITH base AS (SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'),
        |                w -> len(w) > 0) AS toks
        |  FROM documents),
        |c AS (SELECT doc_id, i.i AS chunk_idx,
        |    toks[i.i * 8 + 1 : i.i * 8 + 12] AS chunk
        |  FROM base, range(0, 200) i(i)
        |  WHERE i.i * 8 < len(toks))
        |SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
        |  CAST(len(chunk) AS BIGINT) AS n_tokens,
        |  md5(array_to_string(chunk, ' ')) AS chunk_fp
        |FROM c WHERE len(chunk) > 0
        |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
      TextOps.chunkByTokens(Tables.documents(s, dir), col("doc_id"),
          col("text"), size = 12, overlap = 4)
        .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
          md5(col("chunk_text")).as("chunk_fp"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // ---- HTML → text extraction: both engines wrap the document in the
    // same deterministic boilerplate (script/style/comments/tags/entities),
    // then the oracle applies the IDENTICAL RE2 pattern chain — the
    // recovered text must match byte-for-byte (fingerprinted). ------------
    QueryDef("q168_html_strip", {
      val chain = TextOps.HtmlStripPatterns.foldLeft(
        """'<html><head><script type="text/javascript">var x = 1 &lt; 2;</script>' ||
          |'<style>p { color: red }</style></head><body><h1>Doc &#39;' ||
          |CAST(doc_id AS VARCHAR) || '&#39;</h1><p>' || text ||
          |'</p><!-- trailing comment --><br/>&nbsp;&amp; done</body></html>'"""
          .stripMargin) { case (expr, (p, r)) =>
        // DuckDB single-quoted literals keep backslashes verbatim — only
        // quotes need escaping for the pattern to reach RE2 unchanged
        val pp = p.replace("'", "''")
        val rr = r.replace("'", "''")
        // regexp_replace only for regex patterns; entity literals use replace
        if (p.startsWith("&")) s"replace($expr, '$pp', '$rr')"
        else s"regexp_replace($expr, '$pp', '$rr', 'g')"
      }
      s"""SELECT doc_id,
         |  md5(trim(regexp_replace($chain, '\\s+', ' ', 'g'))) AS clean_fp
         |FROM documents ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val html = concat(
        lit("""<html><head><script type="text/javascript">var x = 1 &lt; 2;</script>"""),
        lit("<style>p { color: red }</style></head><body><h1>Doc &#39;"),
        col("doc_id").cast("string"),
        lit("&#39;</h1><p>"), col("text"),
        lit("</p><!-- trailing comment --><br/>&nbsp;&amp; done</body></html>"))
      Tables.documents(s, dir)
        .select(col("doc_id"), md5(TextOps.stripHtml(html)).as("clean_fp"))
        .orderBy(col("doc_id"))
    },

    // ---- Gopher/C4 quality rules: the corpus has no line structure, so
    // both engines append the SAME deterministic junk (bullet runs,
    // trailing ellipses, symbol spam) keyed on doc_id, then every rule
    // flag and the conjunction verdict must agree bit-for-bit. -------------
    QueryDef("q170_gopher_quality",
      """WITH aug AS (SELECT doc_id, text || CASE
        |    WHEN doc_id % 4 = 0 THEN chr(10) || '- a bullet line' ||
        |      chr(10) || '- a bullet line' || chr(10) || '- a bullet line'
        |    WHEN doc_id % 4 = 1 THEN chr(10) || 'a trailing thought...'
        |    WHEN doc_id % 4 = 2 THEN ' ### # ## # ### # ## # # #'
        |    ELSE '' END AS t
        |  FROM documents),
        |m AS (SELECT doc_id, t,
        |    list_filter(string_split_regex(trim(t), '\s+'),
        |      w -> len(w) > 0) AS ws,
        |    list_transform(list_filter(string_split(t, chr(10)),
        |      l -> len(trim(l)) > 0), l -> trim(l)) AS lines
        |  FROM aug),
        |f AS (SELECT doc_id,
        |    len(ws) AS n_words,
        |    len(regexp_replace(t, '\s', '', 'g')) * 1.0 / len(ws) AS mean_len,
        |    (len(regexp_extract_all(t, '#')) +
        |     len(regexp_extract_all(t, '\.\.\.'))) * 1.0 / len(ws) AS sym,
        |    len(list_filter(lines, l -> starts_with(l, '- ') OR
        |      starts_with(l, '* ') OR starts_with(l, '•'))) * 1.0
        |      / len(lines) AS bullet,
        |    len(list_filter(lines, l -> ends_with(l, '...'))) * 1.0
        |      / len(lines) AS ell,
        |    1.0 - len(list_distinct(lines)) * 1.0 / len(lines) AS dup,
        |    len(list_filter(ws, w -> lower(w) IN ('the','a','of','and','to',
        |      'in','is','that','it','for'))) AS n_stop
        |  FROM m)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |  round(mean_len, 6) AS mean_word_len,
        |  round(sym, 6) AS symbol_ratio,
        |  round(bullet, 6) AS bullet_line_frac,
        |  round(ell, 6) AS ellipsis_line_frac,
        |  round(dup, 6) AS dup_line_frac,
        |  CAST(n_stop AS BIGINT) AS n_stopwords,
        |  (n_words BETWEEN 50 AND 100000 AND mean_len BETWEEN 3.0 AND 10.0
        |   AND sym < 0.1 AND bullet < 0.9 AND ell < 0.3 AND dup < 0.3
        |   AND n_stop >= 2) AS gopher_pass
        |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val aug = concat(col("text"),
        when(col("doc_id") % 4 === 0,
          "\n- a bullet line\n- a bullet line\n- a bullet line")
        .when(col("doc_id") % 4 === 1, "\na trailing thought...")
        .when(col("doc_id") % 4 === 2, " ### # ## # ### # ## # # #")
        .otherwise(""))
      Tables.documents(s, dir)
        .select(col("doc_id") +: TextOps.gopherColumns(aug): _*)
        .orderBy(col("doc_id"))
    },

    // ---- C4 cross-document line dedup: boilerplate lines (injected into
    // every doc / every third doc) must vanish from ALL docs while the
    // per-doc unique tail survives; docs reassemble in original line order.
    QueryDef("q171_dedup_lines",
      """WITH aug AS (SELECT doc_id,
        |    text || chr(10) || 'Subscribe to our newsletter!' ||
        |    CASE WHEN doc_id % 3 = 0
        |      THEN chr(10) || 'All rights reserved.' ELSE '' END ||
        |    chr(10) || 'unique tail ' || CAST(doc_id AS VARCHAR) AS t
        |  FROM documents),
        |lines AS (SELECT doc_id,
        |    UNNEST(generate_series(1, len(string_split(t, chr(10))))) AS line_no,
        |    UNNEST(string_split(t, chr(10))) AS line
        |  FROM aug),
        |nz AS (SELECT doc_id, line_no, line, trim(line) AS norm
        |  FROM lines WHERE len(trim(line)) > 0),
        |boiler AS (SELECT norm FROM nz GROUP BY norm
        |  HAVING count(DISTINCT doc_id) > 1)
        |SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no) AS text
        |FROM nz WHERE norm NOT IN (SELECT norm FROM boiler)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val aug = Tables.documents(s, dir).select(col("doc_id"),
        concat(col("text"),
          lit("\nSubscribe to our newsletter!"),
          when(col("doc_id") % 3 === 0, "\nAll rights reserved.")
            .otherwise(""),
          lit("\nunique tail "), col("doc_id").cast("string")).as("text"))
      TextOps.dedupLines(aug, col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
    },

    // ---- URL canonicalization (crawl dedup prep): the oracle pins
    // hand-derived canonical forms (q106 literal-vector pattern); Spark
    // must compute them from the raw URL.
    QueryDef("q172_url_canon", {
      val rows = UrlVectors.zipWithIndex.map { case ((u, c), i) =>
        s"($i, '$u', '$c')"
      }.mkString(",\n  ")
      s"""SELECT * FROM (VALUES
         |  $rows) AS t(id, url, canon)
         |ORDER BY id""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      UrlVectors.zipWithIndex.map { case ((u, _), i) => (i, u) }
        .toDF("id", "url")
        .select(col("id"), col("url"),
          TextOps.canonicalUrl(col("url")).as("canon"))
        .orderBy(col("id"))
    },

    // ---- span-level duplicate-text REMOVAL (ExactSubstr, Lee et al.
    // 2021): q73 counts cross-doc dup passages; this gate produces the
    // CLEANED corpus — the oracle rebuilds the full cut-and-stitch
    // (gram keeper policy, overlapping-span union, empty-doc handling)
    // in SQL and the hash compares every reconstructed text.
    QueryDef("q226_dedup_spans",
      """WITH base AS (SELECT doc_id, trim(text) AS t FROM documents),
        |tw AS (SELECT doc_id,
        |  list_filter(string_split_regex(t, '\s+'), x -> length(x) > 0) AS w
        |  FROM base),
        |gp AS (SELECT doc_id, w,
        |  UNNEST(range(greatest(len(w) - 7, 0))) AS gpos FROM tw),
        |gr AS (SELECT doc_id, gpos,
        |  array_to_string(w[gpos+1:gpos+8], ' ') AS gram FROM gp),
        |dup AS (SELECT gram, min(doc_id) AS keeper FROM gr
        |  GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
        |rem AS (SELECT DISTINCT g.doc_id, g.gpos + j.j AS pos
        |  FROM gr g JOIN dup d USING (gram), range(8) j(j)
        |  WHERE g.doc_id <> d.keeper),
        |tp0 AS (SELECT doc_id, w, UNNEST(range(len(w))) AS pos FROM tw),
        |tp AS (SELECT doc_id, pos, w[pos+1] AS word FROM tp0),
        |kept AS (SELECT tp.doc_id, tp.pos, tp.word
        |  FROM tp ANTI JOIN rem USING (doc_id, pos)),
        |ck AS (SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS text_clean,
        |  COUNT(*) AS n_kept FROM kept GROUP BY doc_id)
        |SELECT b.doc_id, COALESCE(ck.text_clean, '') AS text_clean,
        |  CAST(len(w) - COALESCE(ck.n_kept, 0) AS BIGINT) AS n_removed
        |FROM base b JOIN tw USING (doc_id) LEFT JOIN ck USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin) { (s, dir) =>
      TextOps.removeDupSpans(Tables.documents(s, dir),
          col("doc_id"), col("text"), k = 8)
        .orderBy(col("doc_id"))
    },

    // ---- the REAL LLM-curation shape, end to end in ONE gate (q86/q99/
    // q226 gate the stages separately): MinHash-LSH near-dup pairs
    // (jaccard >= 0.5, bucket-local fused refine) → connected components
    // → keep min-id per near-dup cluster → ExactSubstr span removal over
    // the SURVIVING corpus (span dedup runs on what you keep — a gram
    // shared only with a dropped near-dup must NOT trigger a cut). The
    // oracle rebuilds all three stages in SQL: transitive closure for the
    // clusters (the SPEC, not the plan) feeding q226's cut-and-stitch
    // restricted to keepers; the hash compares every cleaned text.
    QueryDef("q228_curation_dedup_pipeline",
      s"""WITH RECURSIVE $MinhashCte,
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
         |i AS (
         |  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
         |  FROM cand c
         |  JOIN sh a ON a.doc_id = c.doc_a
         |  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
         |  GROUP BY c.doc_a, c.doc_b),
         |e AS (
         |  SELECT i.doc_a, i.doc_b
         |  FROM i
         |  JOIN sz sa ON sa.doc_id = i.doc_a
         |  JOIN sz sb ON sb.doc_id = i.doc_b
         |  WHERE CAST(i.inter AS DOUBLE)
         |    / CAST(sa.sz + sb.sz - i.inter AS DOUBLE) >= 0.5),
         |sym AS (SELECT doc_a AS a, doc_b AS b FROM e
         |        UNION ALL SELECT doc_b, doc_a FROM e),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT s.b, r.r FROM reach r JOIN sym s ON s.a = r.id),
         |keep AS (SELECT id AS doc_id FROM reach
         |  GROUP BY id HAVING id = MIN(r)),
         |kbase AS (SELECT base.* FROM base JOIN keep USING (doc_id)),
         |tw AS (SELECT doc_id,
         |  list_filter(string_split_regex(t, '\\s+'), x -> length(x) > 0) AS w
         |  FROM kbase),
         |gp AS (SELECT doc_id, w,
         |  UNNEST(range(greatest(len(w) - 7, 0))) AS gpos FROM tw),
         |gr AS (SELECT doc_id, gpos,
         |  array_to_string(w[gpos+1:gpos+8], ' ') AS gram FROM gp),
         |dup AS (SELECT gram, min(doc_id) AS keeper FROM gr
         |  GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
         |rem AS (SELECT DISTINCT g.doc_id, g.gpos + j.j AS pos
         |  FROM gr g JOIN dup d USING (gram), range(8) j(j)
         |  WHERE g.doc_id <> d.keeper),
         |tp0 AS (SELECT doc_id, w, UNNEST(range(len(w))) AS pos FROM tw),
         |tp AS (SELECT doc_id, pos, w[pos+1] AS word FROM tp0),
         |kept AS (SELECT tp.doc_id, tp.pos, tp.word
         |  FROM tp ANTI JOIN rem USING (doc_id, pos)),
         |ck AS (SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS text_clean,
         |  COUNT(*) AS n_kept FROM kept GROUP BY doc_id)
         |SELECT b.doc_id, COALESCE(ck.text_clean, '') AS text_clean,
         |  CAST(len(w) - COALESCE(ck.n_kept, 0) AS BIGINT) AS n_removed
         |FROM kbase b JOIN tw USING (doc_id) LEFT JOIN ck USING (doc_id)
         |ORDER BY b.doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      // stage 1 (near-dup pairs): shared shingle sets feed signature AND
      // refine; bands persist across the two LSH uses (TAKsplit analogs)
      val sets = graft.ops.Shape.split(TextOps.shingleSet(
        docs, col("doc_id"), col("text"), 3))
      val bands = graft.ops.Shape.split(
        TextOps.lshBandKeys(TextOps.minhashSig(sets, 8), 8, 2))
      val edges = TextOps.lshJaccardPairs(bands, sets, 0.5)
      // stage 2 (cluster resolution): min-id per component is the keeper
      val keepers = graft.ops.Graph.connectedComponents(
          docs, col("doc_id"), edges, col("doc_a"), col("doc_b"))
        .filter(col("id") === col("component"))
        .select(col("id").as("doc_id"))
      // stage 3 (span-level dedup) over the SURVIVING corpus only
      val surviving = docs.join(keepers, Seq("doc_id"), "left_semi")
      TextOps.removeDupSpans(surviving, col("doc_id"), col("text"), k = 8)
        .orderBy(col("doc_id"))
    }
  )
}

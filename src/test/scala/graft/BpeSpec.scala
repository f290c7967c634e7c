package graft

import graft.text.{Bpe, TextOps}
import org.apache.spark.sql.functions._

/** BPE tokenizer (merge learning, deterministic tie-breaks, encode replay)
  * plus the chunking/HTML-strip training-sample prep ops.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("BPE train: Sennrich corpus learns the hand-derived merge sequence") {
    val freq = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.train(freq, 8)
    // counts: (e,s)=9=(s,t) → lex tie-break; then (es,t)=9; (l,o)=7=(o,w);
    // (lo,w)=7; (e,w)=6=(n,e)=(w,est); (ew,est) before (n,ew) since ew<n
    assert(merges == Vector(
      ("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"),
      ("e", "w"), ("ew", "est"), ("n", "ewest"), ("d", "est")))
  }

  test("BPE encode: training words reproduce dict segmentation; held-out compose") {
    val freq = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val ranks = Bpe.train(freq, 8).zipWithIndex.toMap
    assert(Bpe.encodeWord("low", ranks) == Vector("low"))
    assert(Bpe.encodeWord("newest", ranks) == Vector("newest"))
    assert(Bpe.encodeWord("widest", ranks) == Vector("w", "i", "dest"))
    // held-out: merges must replay in RANK order, not greedy-longest
    assert(Bpe.encodeWord("lowest", ranks) == Vector("low", "est"))
    // (n,ew) is NOT a learned merge — merge 7 is (n,ewest) — so "newer"
    // stops at [n, ew, e, r]
    assert(Bpe.encodeWord("newer", ranks) == Vector("n", "ew", "e", "r"))
    // unseen symbols stay as single chars
    assert(Bpe.encodeWord("xyz", ranks) == Vector("x", "y", "z"))
    // concatenation invariant: tokens rebuild the word exactly
    Seq("lowest", "newer", "wider", "lowlow").foreach { w =>
      assert(Bpe.encodeWord(w, ranks).mkString == w)
    }
  }

  test("BPE pretokenizer splits letter runs / digit runs / symbols; text encode") {
    val ranks = Map.empty[(String, String), Int]
    assert(Bpe.encode("ab 12c!", ranks) ==
      Vector("a", "b", "1", "2", "c", "!"))
    assert(Bpe.encode(null, ranks) == Vector.empty)
  }

  test("BPE distributed train/tokenize matches the local path") {
    val corpus = Seq("low low low low low",
      "lower lower newest newest newest newest newest newest",
      "widest widest widest").toDF("text")
    val merges = Bpe.trainOnCorpus(corpus, col("text"), 8)
    assert(merges == Bpe.train(
      Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 8))
    val toks = Bpe.tokenize(Seq(("lowest newest")).toDF("t"),
      col("t"), col("t"), merges)
      .orderBy("pos").select("token").as[String].collect().toSeq
    assert(toks == Seq("low", "est", "newest"))
  }

  test("chunkByTokens: windows, overlap, short tails, empty docs") {
    val df = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens
      (2L, "x y"),
      (3L, "  ")).toDF("id", "text")
    val out = TextOps.chunkByTokens(df, col("id"), col("text"),
        size = 4, overlap = 1)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "n_tokens", "chunk_text")
      .as[(Long, Int, Long, String)].collect().toSeq
    // stride 3: starts 0,3,6,9 for doc 1 (tail chunk = 1 token)
    assert(out == Seq(
      (1L, 0, 4L, "a b c d"), (1L, 1, 4L, "d e f g"),
      (1L, 2, 4L, "g h i j"), (1L, 3, 1L, "j"),
      (2L, 0, 2L, "x y")))
  }

  test("stripHtml: scripts/styles/comments/tags/entities; idempotent on plain text") {
    val html = """<html><head><script>if (a < b) { x(); }</script>""" +
      """<style>p{}</style></head><body><h1>T</h1>""" +
      """<p>one &amp; two &lt;three&gt; &#39;four&#39;&nbsp;five</p>""" +
      """<!-- gone --></body></html>"""
    val out = Seq(html).toDF("h")
      .select(TextOps.stripHtml(col("h")).as("t")).as[String].head()
    assert(out == "T one & two <three> 'four' five")
    val plain = Seq("just words").toDF("h")
      .select(TextOps.stripHtml(col("h")).as("t")).as[String].head()
    assert(plain == "just words")
  }
}

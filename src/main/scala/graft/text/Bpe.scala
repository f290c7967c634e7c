package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units" — the PUBLIC algorithm
  * behind GPT-2/RoBERTa-style tokenizers): iteratively merge the most
  * frequent adjacent symbol pair into one symbol, then encode by replaying
  * the merges in rank order.
  *
  * Scale contract (the tokenizer-training reality at 100 TB): training
  * operates on the WORD-FREQUENCY table, not the corpus — Spark computes
  * `word → count` distributed (one shuffle, partial aggregation), and only
  * the top-`maxWords` rows reach the driver (the [[graft.text.Embeddings]]
  * ivfTrain / dictionary-probe pattern: driver work is bounded by the
  * vocabulary, never the corpus). The merge loop is pure driver-side
  * arithmetic over that bounded dict. ENCODING is the scan-shaped side:
  * merge ranks broadcast to executors, one partition-local pass, no
  * shuffle.
  *
  * Determinism: count ties break lexicographically on the pair, so the
  * merge table — and therefore every tokenization — is reproducible
  * bit-for-bit across runs and engines (the property every oracle gate
  * here relies on).
  */
object Bpe {

  /** Merge the leftmost-first, non-overlapping occurrences of `pair`. */
  private[text] def mergePair(syms: Vector[String],
      pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Learn `numMerges` merges from a word-frequency dict. Each round counts
    * adjacent pairs weighted by word frequency, merges the most frequent
    * (ties → lexicographically smallest pair), and rewrites the dict.
    * Stops early when no pair remains.
    */
  def train(wordFreq: Seq[(String, Long)], numMerges: Int)
      : Vector[(String, String)] = {
    var vocab: Vector[(Vector[String], Long)] =
      wordFreq.iterator.filter(_._1.nonEmpty)
        .map { case (w, f) => (w.map(_.toString).toVector, f) }.toVector
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.map { case (syms, f) => (mergePair(syms, best), f) }
      }
      round += 1
    }
    merges.result()
  }

  /** Encode one word by replaying merges in rank order: repeatedly merge
    * the present pair with the LOWEST rank until none applies — exactly the
    * published BPE encode loop, so train-then-encode of a training word
    * reproduces its final dict segmentation.
    */
  def encodeWord(word: String, ranks: Map[(String, String), Int])
      : Vector[String] = {
    var syms = word.map(_.toString).toVector
    var done = syms.length < 2
    while (!done) {
      var best: (String, String) = null
      var bestRank = Int.MaxValue
      var i = 0
      while (i + 1 < syms.length) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) done = true
      else {
        syms = mergePair(syms, best)
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  /** The pre-tokenizer: letter runs / digit runs / single non-space symbols
    * (the same class split [[TextOps.tokenCount]] counts with).
    */
  val PretokenRe = "[A-Za-z]+|[0-9]+|\\S"

  /** Encode free text: regex pre-tokenize, BPE-encode each pretoken. */
  def encode(text: String, ranks: Map[(String, String), Int]): Vector[String] =
    if (text == null) Vector.empty
    else PretokenRe.r.findAllIn(text).toVector.flatMap(encodeWord(_, ranks))

  // ---- DataFrame surface ---------------------------------------------------

  /** Distributed training: word counts via one shuffle, top `maxWords` by
    * (count desc, word) to the driver — the bounded-vocabulary contract —
    * then the driver merge loop. Returns the ordered merge table.
    */
  def trainOnCorpus(df: DataFrame, text: Column, numMerges: Int,
      maxWords: Int = 65536): Vector[(String, String)] = {
    val freq = df
      .select(explode(regexp_extract_all(text, lit(PretokenRe), lit(0)))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    train(freq, numMerges)
  }

  /** Tokenize a text column against a learned merge table: one row per
    * token, (doc_id, pos, token). The ranks map rides to executors in the
    * UDF closure (broadcast-sized: one entry per merge); the pass itself is
    * partition-local — no shuffle.
    */
  def tokenize(df: DataFrame, id: Column, text: Column,
      merges: Seq[(String, String)]): DataFrame = {
    val ranks = merges.zipWithIndex.toMap
    val enc = udf((s: String) => encode(s, ranks))
    df.select(id.as("doc_id"), posexplode(enc(text)).as(Seq("pos", "token")))
  }
}

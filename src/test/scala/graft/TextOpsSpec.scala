package graft

import graft.text.{Embeddings, TextOps}
import org.apache.spark.sql.functions._

/** Dedup/similarity semantics on synthetic docs with known relationships. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (4L, "completely different words entirely unrelated text here now")
  ).toDF("doc_id", "text")

  test("shingles produces k-token windows") {
    val sh = TextOps.shingles(docs.filter(col("doc_id") === 1), col("doc_id"),
      col("text"), 3)
    val set = sh.select(col("shingle")).as[String].collect().toSet
    assert(set.contains("the quick brown"))
    assert(set.contains("over the lazy"))
    assert(set.forall(_.split(" ").length == 3))
    assert(set.size == 7) // 9 tokens → 7 windows, all distinct here
  }

  test("array-wise minhash pipeline equals the row pipeline bit-for-bit") {
    val sh = TextOps.shingles(docs, col("doc_id"), col("text"), 3)
    // shingle sets = row shingles, as sets
    val rowSets = sh.collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    val arrSets = TextOps.shingleSet(docs, col("doc_id"), col("text"), 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(arrSets == rowSets)
    // signatures match minhash rows
    val rowSig = TextOps.minhash(sh, 8).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    val arrSig = TextOps.minhashSig(
        TextOps.shingleSet(docs, col("doc_id"), col("text"), 3), 8)
      .select(col("doc_id"), posexplode(col("sig")).as(Seq("i", "h")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(arrSig == rowSig)
    // band keys match
    val rowBands = TextOps.lshBands(TextOps.minhash(sh, 8), 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    val arrBands = TextOps.lshBandKeys(TextOps.minhashSig(
        TextOps.shingleSet(docs, col("doc_id"), col("text"), 3), 8), 8, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(arrBands == rowBands)
  }

  test("minhash+LSH flags near-dups and exact dups, not unrelated docs") {
    val sh = TextOps.shingles(docs, col("doc_id"), col("text"), 3)
    val cand = TextOps.lshCandidates(
      TextOps.lshBands(TextOps.minhash(sh, 8), 2))
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 3L))) // exact dup always collides
    assert(!cand.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("jaccard: exact dup = 1.0; near-dup high; computed only for pairs") {
    val sh = TextOps.shingles(docs, col("doc_id"), col("text"), 3)
    val pairs = Seq((1L, 3L), (1L, 2L)).toDF("doc_a", "doc_b")
    val m = TextOps.jaccard(pairs, sh)
      .collect().map(r => (r.getLong(r.fieldIndex("doc_a")),
        r.getLong(r.fieldIndex("doc_b"))) -> r.getDouble(r.fieldIndex("jac")))
      .toMap
    assert(m((1L, 3L)) == 1.0)
    assert(m((1L, 2L)) > 0.5 && m((1L, 2L)) < 1.0)
  }

  test("simhash: identical texts collide; unrelated text differs") {
    val sh = TextOps.simhash16(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(3L))
    assert(sh(1L) != sh(4L))
  }

  test("fingerprint is whitespace/case-insensitive") {
    val d = Seq((1L, "Hello  World"), (2L, " hello world "), (3L, "other"))
      .toDF("doc_id", "text")
    val fp = d.select(col("doc_id"), TextOps.fingerprint(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("langIdEn: english detected via stopwords, non-english → und") {
    val d = Seq((1L, "the cat sat on the mat and it is happy"),
      (2L, "zzz qqq www rrr ttt yyy uuu")).toDF("doc_id", "text")
    val out = d.select(col("doc_id"), TextOps.langIdEn(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en" && out(2L) == "und")
  }

  test("cosineTopK ranks an identical vector first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),   // same direction as 0
      (2L, Array(0.9f, 0.1f, 0.0f)),   // close
      (3L, Array(0.0f, 0.0f, 1.0f))    // orthogonal
    ).toDF("vec_id", "embedding")
    val out = Embeddings.cosineTopK(vecs.filter(col("vec_id") === 0), vecs,
      col("vec_id"), col("vec_id"), col("embedding"), col("embedding"), 2)
      .orderBy(col("rank")).as[(Long, Long, Long)].collect().toSeq
    assert(out.map(_._2) == Seq(1L, 2L))
  }

  test("winnowing: shared substrings yield common fingerprints") {
    val common = "the quick brown fox jumps over the lazy dog repeatedly"
    val docs = Seq(
      (1L, s"AAAA $common BBBB"),
      (2L, s"XXXXXX $common YYYY"), // same substring, different context
      (3L, "completely unrelated content with no overlap at all here"),
      (4L, "tiny")).toDF("doc_id", "text")
    val fps = TextOps.winnow(docs, col("doc_id"), col("text"),
        k = 8, window = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    // guarantee: a shared substring of length >= window+k-1 produces at
    // least one common fingerprint across documents
    assert((fps(1L) intersect fps(2L)).nonEmpty)
    // unrelated docs share (essentially) nothing
    assert((fps(1L) intersect fps(3L)).isEmpty)
    // shorter than k → empty fingerprint set, not an error
    assert(fps(4L).isEmpty)
    // deterministic: sorted-distinct output
    val again = TextOps.winnow(docs, col("doc_id"), col("text"), 8, 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(again == fps)
  }

  test("cosineNearDupDedup keeps the smallest id of each near-dup set") {
    // ids 0/1/2 are identical (cosine 1); 3 is orthogonal-ish; 4 negates 0
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(2.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val kept = Embeddings.cosineNearDupDedup(vecs, col("vec_id"),
        col("embedding"), tau = 0.95, numPlanes = 2, numTables = 4, dim = 4)
      .select("vec_id").as[Long].collect().toSet
    // 1 and 2 collapse into 0 (same direction); 3 and 4 survive (cos <= 0)
    assert(kept.contains(0L) && !kept.contains(1L) && !kept.contains(2L))
    assert(kept.contains(3L) && kept.contains(4L))
  }

  test("ivfAssign: spherical argmax cells, deterministic tie-break") {
    val cents = Seq(
      0L -> Array(1.0, 0.0, 0.0, 0.0),
      1L -> Array(0.0, 1.0, 0.0, 0.0))
    val vecs = Seq(
      (10L, Array(0.9f, 0.1f, 0f, 0f)),  // → cell 0
      (11L, Array(0.1f, 0.9f, 0f, 0f)),  // → cell 1
      (12L, Array(0.5f, 0.5f, 0f, 0f)),  // exact tie → lowest id cell 0
      (13L, Array(-1f, -1f, 0f, 0f))     // both dots negative, still argmax
    ).toDF("vec_id", "embedding")
    val got = Embeddings.ivfAssign(vecs, col("vec_id"), col("embedding"),
        cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 0L, 11L -> 1L, 12L -> 0L, 13L -> 0L))
  }

  test("ivfAssign matrix form (C > threshold) == unrolled form, both " +
      "precision modes, incl. ties and short vectors") {
    // 100 centroids forces the matrix-literal lowering; rebuild the same
    // assignment with the unrolled form by splitting into two 50-centroid
    // halves and taking the per-row argmax across halves manually — no:
    // simpler and airtight, compare against a driver-side replay of the
    // identical fold arithmetic.
    val dim = 8
    val cents = (0 until 100).map { c =>
      c.toLong -> Array.tabulate(dim)(j => math.sin(c * 31 + j * 7).abs + 0.01)
    }
    val vecs = (0 until 300).map { i =>
      (i.toLong, Array.tabulate(dim)(j => (math.cos(i * 13 + j * 3) * 0.5).toFloat))
    } :+ (999L, Array(0.5f, 0.5f)) // short vector: missing positions = 0
    val df = vecs.toDF("vec_id", "embedding")
    for (exact <- Seq(false, true)) {
      val got = Embeddings.ivfAssign(df, col("vec_id"), col("embedding"),
          cents, exact = exact)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expect = vecs.map { case (id, v) =>
        val dots = cents.map { case (_, cv) =>
          cv.indices.map(j =>
            (if (j < v.length) v(j).toDouble else 0.0) * cv(j)).sum
        }
        id -> cents(dots.indexOf(dots.max))._1
      }.toMap
      assert(got == expect, s"exact=$exact")
    }
  }

  test("ivfAssignHierarchical: total, deterministic, and agrees with the " +
      "flat argmax on well-separated cells") {
    // 9 centroids in 3 well-separated direction families → 3 supers; a
    // vector near any family member must land on the same cell as flat
    // assignment (hierarchy only risks disagreement near super borders)
    val dirs = Seq(
      Array(1.0, 0.0, 0.0, 0.0), Array(0.95, 0.05, 0.0, 0.0), Array(0.9, 0.0, 0.1, 0.0),
      Array(0.0, 1.0, 0.0, 0.0), Array(0.05, 0.95, 0.0, 0.0), Array(0.0, 0.9, 0.1, 0.0),
      Array(0.0, 0.0, 1.0, 0.0), Array(0.0, 0.05, 0.95, 0.0), Array(0.1, 0.0, 0.9, 0.0))
    val cents = dirs.zipWithIndex.map { case (d, i) => i.toLong -> d }
    val vecs = (0 until 90).map { i =>
      val d = dirs(i % 9)
      (i.toLong, d.map(x => (x * 0.98 + 0.005).toFloat))
    }.toDF("vec_id", "embedding")
    val flat = Embeddings.ivfAssign(vecs, col("vec_id"), col("embedding"), cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hier = Embeddings.ivfAssignHierarchical(
        vecs, col("vec_id"), col("embedding"), cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // totality + determinism
    assert(hier.size == 90 && hier.values.forall(c => c >= 0 && c < 9))
    val hier2 = Embeddings.ivfAssignHierarchical(
        vecs, col("vec_id"), col("embedding"), cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hier == hier2)
    // far from super borders, the two-level argmax equals the flat one
    assert(hier == flat, s"diverged: ${hier.toSet.diff(flat.toSet)}")
  }

  test("ivfAssignAuto routes C > HierThreshold through the TWO-LEVEL " +
      "quantizer (the q227 oracle gate's branch), C <= through flat") {
    // plan-shape witness: hierarchical has TWO argmax levels
    // (array_position for the super pick, then for the child pick);
    // flat has exactly one
    val vecs = (0 until 10).map(i =>
      (i.toLong, Array.tabulate(4)(j => (i + j + 1).toFloat)))
      .toDF("vec_id", "embedding")
    def positions(c: Int): Int = {
      val cents = (0 until c).map(j =>
        j.toLong -> Array.tabulate(4)(k => ((j + k) % 5 + 1).toDouble))
      val plan = Embeddings.ivfAssignAuto(vecs, col("vec_id"),
        col("embedding"), cents, exact = true)
        .queryExecution.analyzed.toString
      "array_position".r.findAllIn(plan).size
    }
    // (the super-pick argmax is inlined at each of its two use sites, so
    // the two-level plan shows 4 array_position nodes; flat shows 1)
    assert(positions(Embeddings.HierThreshold + 16) >= 2,
      "C=144 did not route through the two-level quantizer")
    assert(positions(8) == 1, "C=8 should stay on the flat argmax")
  }

  test("ivfTrain: deterministic, converging, dead cells keep centroids") {
    // two tight clusters around (1,0,..) and (0,1,..) plus a far-out init
    // exemplar that captures nothing after round 1
    val vecs = (0 until 30).map { i =>
      val base = if (i % 2 == 0) Array(10f, 1f, 0f, 0f)
      else Array(1f, 10f, 0f, 0f)
      (i.toLong, base.zipWithIndex.map { case (v, j) =>
        v + ((i * 7 + j) % 3) * 0.1f })
    }.toDF("vec_id", "embedding")
    val init = Embeddings.ivfInitHashSample(vecs, col("vec_id"),
      col("embedding"), 3)
    assert(init.size == 3 && init.map(_._1) == init.map(_._1).sorted)
    val t1 = Embeddings.ivfTrain(vecs, col("vec_id"), col("embedding"),
      init, iters = 2)
    val t2 = Embeddings.ivfTrain(vecs, col("vec_id"), col("embedding"),
      init, iters = 2)
    // bit-identical across runs (decimal sums, no RNG)
    assert(t1.map(_._1) == t2.map(_._1))
    assert(t1.zip(t2).forall { case ((_, a), (_, b)) => a.sameElements(b) })
    // centroids are unit vectors
    t1.foreach { case (_, c) =>
      assert(math.abs(c.map(x => x * x).sum - 1.0) < 1e-9) }
    // trained assignment separates the two clusters
    val cells = Embeddings.ivfAssign(vecs, col("vec_id"), col("embedding"), t1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the clusters never share a cell (k=3 on 2 clusters may split one —
    // a legitimate local optimum — but must not merge across clusters)
    val evenCells = (0 until 30 by 2).map(i => cells(i.toLong)).toSet
    val oddCells = (1 until 30 by 2).map(i => cells(i.toLong)).toSet
    assert(evenCells.intersect(oddCells).isEmpty)
    // a dead cell keeps its previous centroid rather than vanishing
    val farInit = init :+ (999L, Array(-1.0, -1.0, -1.0, -1.0))
    val t3 = Embeddings.ivfTrain(vecs, col("vec_id"), col("embedding"),
      farInit, iters = 1)
    assert(t3.size == 4 && t3.exists(_._1 == 999L))
  }

  test("planesFor scales bucket count with corpus size") {
    import Embeddings.planesFor
    // occupancy target holds: corpus / 2^planes <= target (within 2x)
    for (n <- Seq(1000L, 100000L, 10000000L, 10000000000L)) {
      val p = planesFor(n, 64)
      assert(n.toDouble / math.pow(2, p) <= 64.0, s"n=$n planes=$p")
      assert(n.toDouble / math.pow(2, p) > 16.0 || p == 1, s"n=$n planes=$p")
    }
    // 10x corpus → ~3-4 more planes, never fewer
    assert(planesFor(20000) > planesFor(2000))
    assert(planesFor(5) == 1 && planesFor(1L << 62) == 56)
  }

  test("rpLshBucketAuto derives the plane count from the corpus itself") {
    // 300 vectors at target 64 → planesFor = 3 → bucket ids fit in 3 bits;
    // the auto path must produce the SAME buckets as an explicit
    // rpLshBucket(numPlanes = planesFor(n)).
    val vecs = (0 until 300).map { i =>
      (i.toLong, Array.tabulate(4)(j => ((i * 7 + j * 3) % 11 - 5).toFloat))
    }.toDF("vec_id", "embedding")
    val auto = Embeddings.rpLshBucketAuto(vecs, col("vec_id"),
        col("embedding"), dim = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val explicitP = Embeddings.rpLshBucket(vecs, col("vec_id"),
        col("embedding"), Embeddings.planesFor(300), dim = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(auto == explicitP)
    assert(auto.values.forall(b => b >= 0 && b < 8)) // 3 planes → 8 buckets
    // a 10× corpus widens the bucket id space (default tracks corpus size)
    assert(Embeddings.planesFor(3000) > Embeddings.planesFor(300))
  }

  test("rpLshBucket: identical vectors share a bucket") {
    val vecs = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (1L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Array(-1.0f, -2.0f, -3.0f, -4.0f))).toDF("vec_id", "embedding")
    val b = Embeddings.rpLshBucket(vecs, col("vec_id"), col("embedding"), 8,
        dim = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(0L) == b(1L))
    assert(b(0L) != b(2L)) // opposite vector flips every sign bit
    // declared dim must match the data — a mismatch would silently hash
    // into wrong buckets, so the guard fails loudly instead
    assertThrows[RuntimeException] {
      Embeddings.rpLshBucket(vecs, col("vec_id"), col("embedding"), 8,
        dim = 64).collect()
    }
  }

  test("scrubPii redacts every pattern class; SSN survives next to a phone") {
    val df = Seq(
      "call (555) 123-4567 or mail bob.smith+x@ex-ample.org ssn 123-45-6789 ip 10.0.255.7")
      .toDF("t")
    val out = df.select(TextOps.scrubPii(col("t"))).as[String].head()
    assert(out == "call <PHONE> or mail <EMAIL> ssn <SSN> ip <IP>")
    val counts = df.select(
      TextOps.PiiPatterns.map { case (p, _) => TextOps.piiCount(col("t"), p) }: _*)
      .as[(Long, Long, Long, Long)].head()
    assert(counts == ((1L, 1L, 1L, 1L)))
  }

  test("decontaminate: overlap flags, clean docs 0, short docs included as 0") {
    val train = Seq(
      (1L, "a b c d e f g h tail words here"), // shares the 8-gram prefix
      (2L, "totally different words with no overlap at all whatsoever"),
      (3L, "too short")).toDF("doc_id", "text")
    val eval_ = Seq((100L, "a b c d e f g h and more")).toDF("doc_id", "text")
    val hits = TextOps.decontaminate(train, eval_, col("doc_id"), col("text"), 8)
      .as[(Long, Long)].collect().toMap
    assert(hits(1L) >= 1L && hits(2L) == 0L && hits(3L) == 0L)
    assert(hits.size == 3)
  }

  test("unigramScore: add-one-smoothed corpus LM, exact hand computation") {
    val docs = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val got = TextOps.unigramScore(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    // vocab a:2 b:1 c:1, T=4, V=3 → p(a)=3/7, p(b)=p(c)=2/7
    val pa = -math.log(3.0 / 7); val pb = -math.log(2.0 / 7)
    assert(got(0)._2 == 3 &&
      math.abs(got(0)._3 - (2 * pa + pb) / 3) < 1e-6)
    assert(got(1)._2 == 1 && math.abs(got(1)._3 - pb) < 1e-6)
    // junk (rare tokens) scores strictly higher than fluent repetition
    assert(got(1)._3 > got(0)._3)
  }

  test("mixtureWeights: alpha tempering upsamples the tail, max rate is 1") {
    val df = (Seq.fill(9)("en") ++ Seq("fr")).toDF("lang")
    val w = TextOps.mixtureWeights(df, col("lang"), 0.5)
      .orderBy("stratum").as[(String, Long, Double, Double, Double)].collect()
    val en = w(0); val fr = w(1)
    // counts 9/1, alpha .5 → w0 3/1 → weights .75/.25; shares .9/.1
    assert(en._2 == 9 && fr._2 == 1)
    assert(math.abs(en._4 - 0.75) < 1e-6 && math.abs(fr._4 - 0.25) < 1e-6)
    // rates: fr (most upsampled) keeps every row; en samples to match
    assert(fr._5 == 1.0)
    assert(math.abs(en._5 - (0.75 / 0.9) / 2.5) < 1e-6)
    // realized mixture: n*rate proportions equal the tempered weights
    val mix = Seq(en._2 * en._5, fr._2 * fr._5)
    assert(math.abs(mix(0) / mix.sum - 0.75) < 1e-6)
  }

  test("gopherColumns: each rule fires on its own pathological document") {
    val good = (1 to 60).map(i => s"lexeme$i the a of").mkString(" ")
    val docs = Seq(
      (1L, good),                                   // passes everything
      (2L, "too short the a"),                      // n_words < 50
      (3L, good + " " + Seq.fill(40)("#").mkString(" ")), // symbol spam
      (4L, good + "\n- x\n- x\n- x\n- x\n- x\n- x\n- x\n- x\n- x\n- x"),
      (5L, (1 to 60).map(_ => "supercalifragilistic").mkString(" "))
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id") +:
        TextOps.gopherColumns(col("text")): _*)
      .orderBy("doc_id").collect()
    def pass(i: Int) = out(i).getBoolean(out(i).length - 1)
    assert(pass(0), "clean doc must pass")
    assert(!pass(1), "short doc must fail word-count bound")
    assert(!pass(2), "symbol spam must fail symbol_ratio")
    // doc 4: ten identical bullet lines among 11 → dup_line_frac and
    // bullet pressure; dup rule fires (10 dups / 11 lines)
    assert(!pass(3), "duplicate bullet lines must fail")
    assert(!pass(4), "no stopwords + 20-char words must fail")
    // spot-check the ratio arithmetic on the clean doc: 240 words, one
    // stopword triple per group of four
    assert(out(0).getLong(1) == 240 && out(0).getLong(7) == 180)
  }

  test("duplicatePassages counts occurrences and distinct docs per gram") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over it"),
      (2L, "see the quick brown fox jumps high"),
      (3L, "the quick brown fox jumps the quick brown fox jumps")).toDF("doc_id", "text")
    val out = TextOps.duplicatePassages(docs, col("doc_id"), col("text"), 5)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("the quick brown fox jumps") == ((3L, 4L, 1L, 3L)))
  }

  test("removeDupSpans: keeper doc untouched, spans cut elsewhere, " +
      "overlap unions, short docs pass, full-dup doc -> empty string") {
    val docs = Seq(
      (1L, "a b c d e f g h t1"),        // keeper of gram "a..h"
      (2L, "x a b c d e f g h"),         // loses the 8-token span -> "x"
      (3L, "only seven words here not enough grams"), // < 8 tokens
      (4L, "a b c d e f g h i"),         // loses gram0's span, keeps "i"
      (5L, "z b c d e f g h i")          // loses gram "b..i" -> "z"
    ).toDF("doc_id", "text")
    val got = graft.text.TextOps
      .removeDupSpans(docs, col("doc_id"), col("text"), k = 8)
      .as[(Long, String, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(got(1L) == ("a b c d e f g h t1", 0L)) // keeper keeps all
    assert(got(2L) == ("x", 8L))
    assert(got(3L) == ("only seven words here not enough grams", 0L))
    // doc4 is keeper of "b..i" so only gram0's positions 0..7 go
    assert(got(4L) == ("i", 8L))
    assert(got(5L) == ("z", 8L))
    // a doc that is ENTIRELY duplicated text comes back empty, not missing
    val dup6 = docs.unionAll(Seq((6L, "a b c d e f g h")).toDF("doc_id", "text"))
    val g6 = graft.text.TextOps
      .removeDupSpans(dup6, col("doc_id"), col("text"), k = 8)
      .filter(col("doc_id") === 6).as[(Long, String, Long)].collect().head
    assert(g6 == ((6L, "", 8L)))
  }

  test("dedupLines drops cross-doc boilerplate, keeps order and within-doc dups") {
    val docs = Seq(
      (1L, "alpha one\nSubscribe now!\nalpha two\nalpha two"),
      (2L, "beta one\n  Subscribe now!  \nbeta two"),
      (3L, "gamma only\n\n  \ngamma end")
    ).toDF("doc_id", "text")
    val out = TextOps.dedupLines(docs, col("doc_id"), col("text"))
      .as[(Long, String)].collect().toMap
    // 'Subscribe now!' appears (trim-normalized) in docs 1 and 2 → gone
    assert(out(1L) == "alpha one\nalpha two\nalpha two",
      "boilerplate dropped, within-doc dup kept, order preserved")
    assert(out(2L) == "beta one\nbeta two")
    // blank/whitespace lines are dropped in reassembly
    assert(out(3L) == "gamma only\ngamma end")
  }

  test("dedupLines maxDocs threshold keeps lines under the bound") {
    val docs = Seq(
      (1L, "shared\nu1"), (2L, "shared\nu2"), (3L, "only here\nu3")
    ).toDF("doc_id", "text")
    val keep2 = TextOps.dedupLines(docs, col("doc_id"), col("text"),
        maxDocs = 2)
      .as[(Long, String)].collect().toMap
    assert(keep2(1L) == "shared\nu1", "2 docs <= maxDocs=2 survives")
    val keep1 = TextOps.dedupLines(docs, col("doc_id"), col("text"))
      .as[(Long, String)].collect().toMap
    assert(keep1(1L) == "u1" && keep1(2L) == "u2")
  }

  test("canonicalUrl applies each RFC 3986 normalization") {
    val cases = Seq(
      "HTTP://Example.COM/Path" -> "http://example.com/Path",
      "https://a.com:443/x" -> "https://a.com/x",
      "http://a.com:80/" -> "http://a.com",
      "http://a.com:8080/x" -> "http://a.com:8080/x", // non-default kept
      "https://a.com/p#frag" -> "https://a.com/p",
      "https://a.com/p?utm_source=x&id=1" -> "https://a.com/p?id=1",
      "https://a.com/p?id=1&gclid=z" -> "https://a.com/p?id=1",
      "https://a.com/p?fbclid=z" -> "https://a.com/p",
      "https://a.com//x///y/" -> "https://a.com/x/y",
      "https://a.com/p?" -> "https://a.com/p")
    val out = cases.map(_._1).zipWithIndex.map { case (u, i) => (i, u) }
      .toDF("i", "url")
      .select(col("i"), TextOps.canonicalUrl(col("url")).as("c"))
      .orderBy("i").as[(Int, String)].collect().map(_._2)
    out.zip(cases).foreach { case (got, (in, want)) =>
      assert(got == want, s"canonicalUrl($in)")
    }
  }

  test("packSequences: contiguous offsets, consistent sequence ranges, " +
      "zero-token docs occupy no stream positions") {
    val docs = Seq(
      (1L, "a b c"),            // 3 tokens
      (2L, ""),                 // 0 tokens — dropped
      (3L, "d e f g h"),        // 5 tokens
      (4L, "i j"),              // 2 tokens
      (5L, "k l m n o p q r")   // 8 tokens
    ).toDF("doc_id", "text")
    val out = TextOps.packSequences(docs, col("doc_id"),
        TextOps.tokenCount(col("text")), window = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    // stream layout: d1 [0,3), d3 [3,8), d4 [8,10), d5 [10,18); window 4
    assert(out.toSeq == Seq(
      (1L, 3L, 0L, 0L, 0L),   // fits window 0
      (3L, 5L, 3L, 0L, 1L),   // straddles 0→1
      (4L, 2L, 8L, 2L, 2L),
      (5L, 8L, 10L, 2L, 4L))) // spans windows 2..4
    // properties: offsets contiguous in doc order; ranges consistent
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._3 + a._2, "offsets must be contiguous")
    }
    out.foreach { case (_, n, off, first, last) =>
      assert(first == off / 4 && last == (off + n - 1) / 4)
    }
  }

  test("lshJaccardPairs (bucket-local fused refine) == the join lowering " +
      "on the full sf0.001 corpus, at minJac 0 and 0.5") {
    val corpus = graft.Tables.documents(spark, sf)
    val sets = TextOps.shingleSet(corpus, col("doc_id"), col("text"), 3)
    val bands = TextOps.lshBandKeys(TextOps.minhashSig(sets, 8), 8, 2)
    val joinRows = TextOps.jaccardSets(TextOps.lshCandidates(bands), sets)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("jac"))
      .as[(Long, Long, Long, Double)].collect().toSet
    val fusedAll = TextOps.lshJaccardPairs(bands, sets, 0.0)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(fusedAll == joinRows,
      s"fused != join lowering: only-fused=${(fusedAll -- joinRows).take(3)} " +
        s"only-join=${(joinRows -- fusedAll).take(3)}")
    val fusedHalf = TextOps.lshJaccardPairs(bands, sets, 0.5)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(fusedHalf == joinRows.filter(_._4 >= 0.5))
    // orientation + distinctness invariants
    assert(fusedAll.forall(p => p._1 < p._2))
    assert(fusedAll.map(p => (p._1, p._2)).size == fusedAll.size)
    // skew guard: maxBucket=2 forces (almost) every bucket through the
    // distributed join path, maxBucket=3 mixes both paths in one run —
    // values must be identical to the unguarded bucket-local result
    assert(TextOps.lshJaccardPairs(bands, sets, 0.0, maxBucket = 2)
      .as[(Long, Long, Long, Double)].collect().toSet == joinRows,
      "hot-bucket join path diverges from the bucket-local values")
    assert(TextOps.lshJaccardPairs(bands, sets, 0.0, maxBucket = 3)
      .as[(Long, Long, Long, Double)].collect().toSet == joinRows,
      "mixed small/hot routing diverges from the bucket-local values")
  }

  test("lshJaccardPairs on an EMPTY corpus: zero rows from both routes, " +
      "no failure (the degenerate start of any pipeline run)") {
    val sets = Seq.empty[(Long, Seq[String])].toDF("doc_id", "sset")
    val bands = Seq.empty[(Long, Long, String)].toDF("doc_id", "band", "bk")
    assert(TextOps.lshJaccardPairs(bands, sets, 0.5).count() == 0)
    assert(TextOps.lshJaccardPairs(bands, sets, 0.5, maxBucket = 1)
      .count() == 0)
  }

  test("lshJaccardPairs on two empty sets: BOTH paths fail loudly (ANSI " +
      "0/0 — a silent drop would make the output depend on maxBucket " +
      "routing)") {
    // two docs with empty shingle sets sharing a band bucket (caller
    // bypassing shingleSet's size>0 filter)
    val sets = Seq((1L, Seq.empty[String]), (2L, Seq.empty[String]))
      .toDF("doc_id", "sset")
    val bands = Seq((1L, 0L, "k"), (2L, 0L, "k")).toDF("doc_id", "band", "bk")
    def run(maxBucket: Int): Unit =
      TextOps.lshJaccardPairs(bands, sets, 0.5, maxBucket).collect()
    val eBucket = intercept[Exception](run(1024)) // bucket-local path
    val eJoin = intercept[Exception](run(1)) // forced join path
    def msg(e: Throwable): String =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(_.toString).mkString(" | ")
    assert(msg(eBucket).contains("jaccard undefined"), msg(eBucket))
    assert(msg(eJoin).contains("DIVIDE_BY_ZERO"), msg(eJoin))
    // non-ANSI parity: the join lowering's 0/0 fails its >= filter and
    // the pair is silently dropped — BOTH paths must drop it (failOnError
    // captured at construction, Spark's own arithmetic pattern)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      def pairs(maxBucket: Int) =
        TextOps.lshJaccardPairs(bands, sets, 0.5, maxBucket)
          .select(col("doc_a"), col("doc_b"), col("inter"))
          .as[(Long, Long, Long)].collect().toSet
      assert(pairs(1) == Set.empty,
        "non-ANSI join path unexpectedly kept the 0/0 pair")
      assert(pairs(1024) == Set.empty,
        "non-ANSI bucket-local path diverges from the join lowering")
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }

  test("Simhash kernel == the explode/agg formulation (the oracle's SQL) " +
      "on the full sf0.001 corpus, at 60 and 16 bits") {
    val docs = graft.Tables.documents(spark, sf)
    def aggForm(nBits: Int): Map[Long, Long] = {
      val tok = docs.select(col("doc_id"),
          explode(TextOps.words(col("text"))).as("word"))
        .withColumn("h", TextOps.hashHex(col("word"), nBits / 4))
      val bitSums = (0 until nBits).map { j =>
        sum(when(shiftright(col("h"), j) % 2 === 1, 1).otherwise(-1))
          .as(s"s$j")
      }
      val fp = (0 until nBits).map { j =>
        when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L)
      }.reduce(_ + _)
      tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
        .select(col("doc_id"), fp.as("simhash"))
        .as[(Long, Long)].collect().toMap
    }
    for (nBits <- Seq(60, 16)) {
      val kernel = TextOps.simhashWide(docs, col("doc_id"), col("text"), nBits)
        .as[(Long, Long)].collect().toMap
      assert(kernel == aggForm(nBits),
        s"kernel != agg formulation at $nBits bits")
    }
    // degenerate docs: empty / whitespace-only / single-token — empty token
    // arrays emit NO row (the explode-of-empty contract)
    val edge = Seq((1L, ""), (2L, "   "), (3L, "one"), (4L, "a b a"))
      .toDF("doc_id", "text")
    val k = TextOps.simhashWide(edge, col("doc_id"), col("text"), 16)
      .as[(Long, Long)].collect().toMap
    assert(k.keySet == Set(3L, 4L), s"empty-doc contract broken: $k")
  }
}

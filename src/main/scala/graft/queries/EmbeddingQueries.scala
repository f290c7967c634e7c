package graft.queries

import graft.{QueryDef, Tables}
import graft.text.Embeddings
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table: brute-force exact cosine
  * top-k (baseline) and random-hyperplane LSH bucketing (the scale path).
  * Decimal-exact accumulation keeps scores bit-identical to the oracle.
  */
object EmbeddingQueries {

  /** Oracle fragment: exploded vectors + exact norms. */
  private val VecCte =
    """cx AS (SELECT vec_id AS c_id,
      |    UNNEST(embedding) AS v, UNNEST(range(64)) AS pos FROM embeddings),
      |cn AS (SELECT c_id, sqrt(CAST(SUM(CAST(
      |    CAST(v AS DOUBLE) * CAST(v AS DOUBLE) AS DECIMAL(30,12))) AS DOUBLE)) AS c_norm
      |  FROM cx GROUP BY c_id)""".stripMargin

  /** One spherical k-means round (the `ivfInitHashSample` + `ivfTrain`
    * iters=1 + `ivfAssign` chain) unrolled in SQL — shared by q98b and
    * the SemDeDup gate q215. Ends with `d2` (vec × trained-centroid dots).
    * `limitSql` is the exemplar count: q98b pins 8 (its engine side pins
    * c=8 at every SF); q215 derives the ADAPTIVE count so the oracle
    * tracks `semDeDupAuto`'s C = max(8, ⌈N/256⌉) at ANY rehearsal SF —
    * the r15 sf0.3 sweep caught the previous hardcoded 8 diverging once
    * the corpus crossed 2048 vectors (engine 24 cells vs oracle 8).
    */
  private def ivfTrainCteFor(limitSql: String) =
    s"""init AS (SELECT c_id AS ex_id FROM (SELECT DISTINCT c_id FROM cx)
      |  ORDER BY md5(CAST(c_id AS VARCHAR)), c_id LIMIT $limitSql),""".stripMargin +
    """
      |u0 AS (SELECT cx.c_id AS ex_id, cx.pos,
      |    CAST(cx.v AS DOUBLE) / cn.c_norm AS u
      |  FROM cx JOIN cn USING (c_id) JOIN init ON init.ex_id = cx.c_id),
      |d1 AS (SELECT a.c_id AS vec_id, b.ex_id, CAST(SUM(CAST(
      |    CAST(a.v AS DOUBLE) * b.u AS DECIMAL(30,12))) AS DOUBLE) AS dot
      |  FROM cx a JOIN u0 b ON a.pos = b.pos GROUP BY 1, 2),
      |cells1 AS (SELECT vec_id, ex_id AS cell FROM (
      |  SELECT vec_id, ex_id, ROW_NUMBER() OVER (PARTITION BY vec_id
      |    ORDER BY dot DESC, ex_id) AS rn FROM d1) WHERE rn = 1),
      |mexp AS (SELECT cells1.cell, a.pos,
      |    CAST(CAST(SUM(CAST(CAST(a.v AS DOUBLE) AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE)
      |      / COUNT(*) AS m
      |  FROM cx a JOIN cells1 ON cells1.vec_id = a.c_id GROUP BY 1, 2),
      |mnorm AS (SELECT cell, sqrt(CAST(SUM(CAST(m * m AS DECIMAL(30,12)))
      |    AS DOUBLE)) AS norm FROM mexp GROUP BY cell),
      |u1 AS (SELECT mexp.cell AS ex_id, pos, m / norm AS u
      |  FROM mexp JOIN mnorm USING (cell)
      |  UNION ALL
      |  SELECT u0.ex_id, u0.pos, u0.u FROM u0
      |  WHERE u0.ex_id NOT IN (SELECT DISTINCT cell FROM cells1)),
      |d2 AS (SELECT a.c_id AS vec_id, b.ex_id, CAST(SUM(CAST(
      |    CAST(a.v AS DOUBLE) * b.u AS DECIMAL(30,12))) AS DOUBLE) AS dot
      |  FROM cx a JOIN u1 b ON a.pos = b.pos GROUP BY 1, 2)""".stripMargin

  private val IvfTrainCte = ivfTrainCteFor("8")

  /** q215's variant: the exemplar count the engine's `semDeDupAuto`
    * derives — max(8, ⌈N/256⌉) — computed BY the oracle from the same
    * table, so the gate holds at any SF instead of only N ≤ 2048.
    */
  private val IvfTrainCteAdaptive = ivfTrainCteFor(
    "(SELECT GREATEST(8, CAST(CEIL(COUNT(*) / 256.0) AS BIGINT)) FROM embeddings)")

  val defs: Seq[QueryDef] = Seq(

    // ---- brute-force exact cosine top-5 for 20 query vectors -------------
    QueryDef("q90_cosine_knn",
      s"""WITH $VecCte,
         |qx AS (SELECT c_id AS q_id, v, pos FROM cx WHERE c_id < 20),
         |qn AS (SELECT c_id AS q_id, c_norm AS q_norm FROM cn WHERE c_id < 20),
         |dots AS (
         |  SELECT q_id, c_id, CAST(SUM(CAST(
         |    CAST(qx.v AS DOUBLE) * CAST(cx.v AS DOUBLE) AS DECIMAL(30,12))) AS DOUBLE) AS dot
         |  FROM qx JOIN cx USING (pos) WHERE q_id <> c_id
         |  GROUP BY q_id, c_id),
         |scored AS (
         |  SELECT q_id, c_id, dot / (q_norm * c_norm) AS cos
         |  FROM dots JOIN qn USING (q_id) JOIN cn USING (c_id))
         |SELECT q_id, c_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS BIGINT) AS rank
         |FROM scored QUALIFY rank <= 5
         |ORDER BY q_id, rank""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Embeddings.cosineTopK(
        emb.filter(col("vec_id") < 20), emb,
        col("vec_id"), col("vec_id"), col("embedding"), col("embedding"), 5)
        .orderBy(col("q_id"), col("rank"))
    },

    // ---- random-hyperplane LSH buckets (8 sign bits per vector) ----------
    QueryDef("q91_rp_lsh", {
      val sums = (0 until 8).map { p =>
        s"""SUM(CAST(CAST(v AS DOUBLE) * (CASE WHEN
           |    ('0x' || substr(md5('p${p}_' || CAST(pos AS VARCHAR)), 1, 1))::BIGINT % 2 = 0
           |    THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)
           |    AS DECIMAL(30,12))) AS d$p""".stripMargin
      }.mkString(",\n  ")
      val bucket = (0 until 8).map(p =>
        s"CASE WHEN d$p > 0 THEN ${1L << p} ELSE 0 END").mkString(" + ")
      s"""WITH ex AS (SELECT vec_id,
         |    UNNEST(embedding) AS v, UNNEST(range(64)) AS pos FROM embeddings),
         |s AS (SELECT vec_id,
         |  $sums
         |  FROM ex GROUP BY vec_id)
         |SELECT vec_id, CAST($bucket AS BIGINT) AS bucket
         |FROM s ORDER BY vec_id""".stripMargin
    }) { (s, dir) =>
      Embeddings.rpLshBucket(Tables.embeddings(s, dir),
          col("vec_id"), col("embedding"), 8)
        .orderBy(col("vec_id"))
    },

    // ---- bucketed ANN: exact cosine top-3 WITHIN each LSH bucket ---------
    QueryDef("q92_ann_bucketed", {
      val sums = (0 until 8).map { p =>
        s"""SUM(CAST(CAST(v AS DOUBLE) * (CASE WHEN
           |    ('0x' || substr(md5('p${p}_' || CAST(pos AS VARCHAR)), 1, 1))::BIGINT % 2 = 0
           |    THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)
           |    AS DECIMAL(30,12))) AS d$p""".stripMargin
      }.mkString(",\n  ")
      val bucket = (0 until 8).map(p =>
        s"CASE WHEN d$p > 0 THEN ${1L << p} ELSE 0 END").mkString(" + ")
      s"""WITH $VecCte,
         |ex AS (SELECT vec_id,
         |    UNNEST(embedding) AS v, UNNEST(range(64)) AS pos FROM embeddings),
         |s AS (SELECT vec_id,
         |  $sums
         |  FROM ex GROUP BY vec_id),
         |bk AS (SELECT vec_id, CAST($bucket AS BIGINT) AS bucket FROM s),
         |pairs AS (
         |  SELECT a.vec_id AS q_id, b.vec_id AS c_id
         |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
         |dots AS (
         |  SELECT p.q_id, p.c_id, CAST(SUM(CAST(
         |    CAST(qa.v AS DOUBLE) * CAST(ca.v AS DOUBLE) AS DECIMAL(30,12))) AS DOUBLE) AS dot
         |  FROM pairs p
         |  JOIN cx qa ON qa.c_id = p.q_id
         |  JOIN cx ca ON ca.c_id = p.c_id AND ca.pos = qa.pos
         |  GROUP BY p.q_id, p.c_id),
         |scored AS (
         |  SELECT d.q_id, d.c_id, d.dot / (qn.c_norm * cn.c_norm) AS cos
         |  FROM dots d
         |  JOIN cn qn ON qn.c_id = d.q_id
         |  JOIN cn ON cn.c_id = d.c_id)
         |SELECT q_id, c_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS BIGINT) AS rank
         |FROM scored QUALIFY rank <= 3
         |ORDER BY q_id, rank""".stripMargin
    }) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val bk = Embeddings.rpLshBucket(emb, col("vec_id"), col("embedding"), 8)
      // norms fold once per vector BEFORE the pair join (not once per pair)
      val withB = emb.join(bk, "vec_id")
        .withColumn("__n", Embeddings.normExact(col("embedding")))
      val q = withB.select(col("vec_id").as("qv_id"), col("embedding").as("q_emb"),
        col("__n").as("q_n"), col("bucket"))
      val c = withB.select(col("vec_id").as("cv_id"), col("embedding").as("c_emb"),
        col("__n").as("c_n"), col("bucket").as("bucket_c"))
      val pairs = q.join(c, col("bucket") === col("bucket_c") &&
        col("qv_id") =!= col("cv_id"))
      Embeddings.cosinePairsTopKNormed(pairs, col("qv_id"), col("cv_id"),
          col("q_emb"), col("c_emb"), col("q_n"), col("c_n"), 3)
        .orderBy(col("q_id"), col("rank"))
    },

    // ---- multi-table ANN: 2 independent LSH tables (OR-amplified recall),
    // candidates from ANY table's bucket collision, exact top-3 refine ------
    QueryDef("q93_ann_multitable", {
      // 10 planes → 1024 buckets per table: with label-clustered vectors the
      // candidate set reduces to (mostly) true cluster-internal pairs; at 6
      // planes the 64 coarse buckets merged clusters and the refine step did
      // near-quadratic work (93 s → ~10 s at sf0.1).
      def sumsFor(t: Int) = (0 until 10).map { p =>
        s"""SUM(CAST(CAST(v AS DOUBLE) * (CASE WHEN
           |    ('0x' || substr(md5('t${t}_p${p}_' || CAST(pos AS VARCHAR)), 1, 1))::BIGINT % 2 = 0
           |    THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)
           |    AS DECIMAL(30,12))) AS d${t}_$p""".stripMargin
      }.mkString(",\n  ")
      def bucketFor(t: Int) = (0 until 10).map(p =>
        s"CASE WHEN d${t}_$p > 0 THEN ${1L << p} ELSE 0 END").mkString(" + ")
      s"""WITH $VecCte,
         |ex AS (SELECT vec_id,
         |    UNNEST(embedding) AS v, UNNEST(range(64)) AS pos FROM embeddings),
         |s AS (SELECT vec_id,
         |  ${sumsFor(0)},
         |  ${sumsFor(1)}
         |  FROM ex GROUP BY vec_id),
         |bk AS (
         |  SELECT vec_id, 0 AS tbl, CAST(${bucketFor(0)} AS BIGINT) AS bucket FROM s
         |  UNION ALL
         |  SELECT vec_id, 1 AS tbl, CAST(${bucketFor(1)} AS BIGINT) AS bucket FROM s),
         |pairs AS (
         |  SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS c_id
         |  FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bucket = b.bucket
         |  WHERE a.vec_id <> b.vec_id),
         |dots AS (
         |  SELECT p.q_id, p.c_id, CAST(SUM(CAST(
         |    CAST(qa.v AS DOUBLE) * CAST(ca.v AS DOUBLE) AS DECIMAL(30,12))) AS DOUBLE) AS dot
         |  FROM pairs p
         |  JOIN cx qa ON qa.c_id = p.q_id
         |  JOIN cx ca ON ca.c_id = p.c_id AND ca.pos = qa.pos
         |  GROUP BY p.q_id, p.c_id),
         |scored AS (
         |  SELECT d.q_id, d.c_id, d.dot / (qn.c_norm * cn.c_norm) AS cos
         |  FROM dots d
         |  JOIN cn qn ON qn.c_id = d.q_id
         |  JOIN cn ON cn.c_id = d.c_id)
         |SELECT q_id, c_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS BIGINT) AS rank
         |FROM scored QUALIFY rank <= 3
         |ORDER BY q_id, rank""".stripMargin
    }) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val bk = Embeddings.rpLshBucketTables(emb,
        col("vec_id"), col("embedding"), numPlanes = 10, numTables = 2)
      val withN = emb.select(col("vec_id"), col("embedding"),
        Embeddings.normExact(col("embedding")).as("__n"))
      val pairs = Embeddings.annCandidatePairs(bk)
        .join(withN.select(col("vec_id").as("q_id"),
          col("embedding").as("q_emb"), col("__n").as("q_n")), "q_id")
        .join(withN.select(col("vec_id").as("c_id"),
          col("embedding").as("c_emb"), col("__n").as("c_n")), "c_id")
      Embeddings.cosinePairsTopKNormed(pairs, col("q_id"), col("c_id"),
          col("q_emb"), col("c_emb"), col("q_n"), col("c_n"), 3)
        .orderBy(col("q_id"), col("rank"))
    },

    // ---- IVF ANN: spherical coarse quantizer (argmax dot to exemplar
    // centroids, ties → lowest id); QUERY-DRIVEN search — each of the 20
    // query vectors probes only its own cell (the inverted-file list),
    // exact cosine top-3 refine on those candidates. Exemplars are the 8
    // lowest-id vectors — deterministic stand-ins for trained centroids
    // (assignment and search machinery identical either way). Cost per
    // query = one cell's occupancy, never all same-cell pairs.
    QueryDef("q98_ivf_ann",
      s"""WITH $VecCte,
         |exd AS (
         |  SELECT a.c_id AS vec_id, b.c_id AS ex_id, CAST(SUM(CAST(
         |    CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE) AS DECIMAL(30,12))) AS DOUBLE) AS dot
         |  FROM cx a JOIN cx b ON a.pos = b.pos AND b.c_id < 8
         |  GROUP BY 1, 2),
         |cells AS (
         |  SELECT vec_id, ex_id AS cell FROM (
         |    SELECT vec_id, ex_id,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id
         |        ORDER BY dot DESC, ex_id) AS rn
         |    FROM exd) WHERE rn = 1),
         |pairs AS (
         |  SELECT a.vec_id AS q_id, b.vec_id AS c_id
         |  FROM cells a JOIN cells b ON a.cell = b.cell
         |  WHERE a.vec_id < 20 AND a.vec_id <> b.vec_id),
         |dots AS (
         |  SELECT p.q_id, p.c_id, CAST(SUM(CAST(
         |    CAST(qa.v AS DOUBLE) * CAST(ca.v AS DOUBLE) AS DECIMAL(30,12))) AS DOUBLE) AS dot
         |  FROM pairs p
         |  JOIN cx qa ON qa.c_id = p.q_id
         |  JOIN cx ca ON ca.c_id = p.c_id AND ca.pos = qa.pos
         |  GROUP BY p.q_id, p.c_id),
         |scored AS (
         |  SELECT d.q_id, d.c_id, d.dot / (qn.c_norm * cn.c_norm) AS cos
         |  FROM dots d
         |  JOIN cn qn ON qn.c_id = d.q_id
         |  JOIN cn ON cn.c_id = d.c_id)
         |SELECT q_id, c_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS BIGINT) AS rank
         |FROM scored QUALIFY rank <= 3
         |ORDER BY q_id, rank""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0),
          r.getSeq[Float](1).map(_.toDouble).toArray))
        .sortBy(_._1).toSeq
      val cells = graft.ops.Shape.split(
        Embeddings.ivfAssign(emb, col("vec_id"), col("embedding"), cents))
      val withN = emb.select(col("vec_id"), col("embedding"),
        Embeddings.normExact(col("embedding")).as("__n"))
      val pairs = cells.filter(col("vec_id") < 20)
        .select(col("cell"), col("vec_id").as("q_id"))
        .join(cells.select(col("cell"), col("vec_id").as("c_id")), "cell")
        .filter(col("q_id") =!= col("c_id"))
        .join(withN.select(col("vec_id").as("q_id"),
          col("embedding").as("q_emb"), col("__n").as("q_n")), "q_id")
        .join(withN.select(col("vec_id").as("c_id"),
          col("embedding").as("c_emb"), col("__n").as("c_n")), "c_id")
      Embeddings.cosinePairsTopKNormed(pairs, col("q_id"), col("c_id"),
          col("q_emb"), col("c_emb"), col("q_n"), col("c_n"), 3)
        .orderBy(col("q_id"), col("rank"))
    },

    // ---- IVF with TRAINED centroids: one full spherical k-means round —
    // md5-hash-sample init (RNG-free), unitize, assign, decimal-exact
    // per-cell means, re-unitize, reassign — unrolled verbatim in the
    // oracle. Gates ivfInitHashSample + ivfTrain + ivfAssign end-to-end:
    // a drifted mean, norm, or tie-break anywhere flips assignments. ------
    QueryDef("q98b_ivf_trained",
      s"""WITH $VecCte,
         |$IvfTrainCte
         |SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM (
         |  SELECT vec_id, ex_id AS cell, ROW_NUMBER() OVER (
         |    PARTITION BY vec_id ORDER BY dot DESC, ex_id) AS rn FROM d2)
         |WHERE rn = 1 ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val init = Embeddings.ivfInitHashSample(emb,
        col("vec_id"), col("embedding"), 8)
      val cents = Embeddings.ivfTrain(emb,
        col("vec_id"), col("embedding"), init, iters = 1)
      Embeddings.ivfAssign(emb, col("vec_id"), col("embedding"), cents)
        .orderBy(col("vec_id"))
    },

    // ---- SemDeDup: cluster-then-exact-pairwise semantic dedup.
    // The oracle's exemplar LIMIT is the ADAPTIVE C (IvfTrainCteAdaptive),
    // so the gate holds at rehearsal SFs past 2048 vectors too (r15). ------
    // The trained-IVF chain (q98b) assigns cells; EVERY within-cell pair
    // gets an exact decimal cosine; a vector dies iff a smaller-id
    // cellmate is ≥ tau. The oracle unrolls the full chain — a drift in
    // training, assignment, norm, or the dominance policy flips survivors.
    QueryDef("q215_semdedup",
      s"""WITH $VecCte,
         |$IvfTrainCteAdaptive,
         |cells2 AS (SELECT vec_id, ex_id AS cell FROM (
         |  SELECT vec_id, ex_id, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY dot DESC, ex_id) AS rn FROM d2) WHERE rn = 1),
         |pd AS (SELECT a.c_id AS q_id, b.c_id AS r_id, CAST(SUM(CAST(
         |    CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE) AS DECIMAL(30,12)))
         |    AS DOUBLE) AS dot
         |  FROM cx a JOIN cells2 ca ON ca.vec_id = a.c_id
         |       JOIN cells2 cb ON cb.cell = ca.cell
         |       JOIN cx b ON b.c_id = cb.vec_id AND b.pos = a.pos
         |  WHERE a.c_id > b.c_id GROUP BY 1, 2),
         |removed AS (SELECT DISTINCT pd.q_id FROM pd
         |  JOIN cn n1 ON n1.c_id = pd.q_id JOIN cn n2 ON n2.c_id = pd.r_id
         |  WHERE pd.dot / (n1.c_norm * n2.c_norm) >= 0.35)
         |SELECT cells2.vec_id, CAST(cells2.cell AS BIGINT) AS cell
         |FROM cells2
         |WHERE cells2.vec_id NOT IN (SELECT q_id FROM removed)
         |ORDER BY cells2.vec_id""".stripMargin) { (s, dir) =>
      // adaptive C = max(8, ⌈N/256⌉), and the oracle derives the SAME
      // count from the table (IvfTrainCteAdaptive) — the gate holds at
      // any SF while the within-cell quadratic stays linear overall
      Embeddings.semDeDupAuto(Tables.embeddings(s, dir),
          col("vec_id"), col("embedding"), 0.35)
        .orderBy(col("vec_id"))
    },

    // ---- TWO-LEVEL IVF quantizer (C=144 > HierThreshold=128): the
    // production assignment path at 100 TB scale, hash-verified. The
    // oracle unrolls the WHOLE hierarchical chain in SQL: 144 md5-sampled
    // unitized exemplars, the driver-side spherical Lloyd over them (3
    // iterations, s=ceil(sqrt(144))=12 supers — decimal scale-12 terms so
    // both engines compute identical values), then the per-row two-level
    // argmax (nearest live super, then nearest child of that super).
    // ivfAssignAuto routes C=144 through ivfAssignHierarchical — the
    // require() makes the branch explicit; EmbeddingsSpec additionally
    // pins the two-level plan shape. ----------------------------------
    QueryDef("q227_ivf_two_level", {
      // one Lloyd iteration: assign each exemplar to its first-max super
      // (exact DECIMAL dot comparison), then per-super decimal mean →
      // re-unitize; empty supers keep their previous vector
      def lloyd(k: Int) = {
        val p = k - 1
        s"""g$k AS (SELECT c.ex_id, s.si,
           |    SUM(CAST(c.u * s.u AS DECIMAL(30,12))) AS dot
           |  FROM cent c JOIN sup$p s USING (pos) GROUP BY 1, 2),
           |a$k AS (SELECT ex_id, si FROM (SELECT ex_id, si,
           |    ROW_NUMBER() OVER (PARTITION BY ex_id
           |      ORDER BY dot DESC, si) AS rn FROM g$k) WHERE rn = 1),
           |m$k AS (SELECT a$k.si, c.pos,
           |    CAST(CAST(SUM(CAST(c.u AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS m
           |  FROM cent c JOIN a$k USING (ex_id) GROUP BY 1, 2),
           |n$k AS (SELECT si, sqrt(CAST(SUM(CAST(m * m AS DECIMAL(30,12)))
           |    AS DOUBLE)) AS nrm FROM m$k GROUP BY si),
           |sup$k AS (SELECT m$k.si, pos, m / nrm AS u
           |  FROM m$k JOIN n$k USING (si)
           |  UNION ALL SELECT s.si, s.pos, s.u FROM sup$p s
           |  WHERE s.si NOT IN (SELECT si FROM a$k))""".stripMargin
      }
      s"""WITH $VecCte,
         |init AS (SELECT c_id AS ex_id FROM (SELECT DISTINCT c_id FROM cx)
         |  ORDER BY md5(CAST(c_id AS VARCHAR)), c_id LIMIT 144),
         |cent AS (SELECT cx.c_id AS ex_id, cx.pos,
         |    CAST(cx.v AS DOUBLE) / cn.c_norm AS u
         |  FROM cx JOIN cn USING (c_id) JOIN init ON init.ex_id = cx.c_id),
         |s0ids AS (SELECT ex_id,
         |    CAST(ROW_NUMBER() OVER (ORDER BY ex_id) AS INTEGER) - 1 AS si
         |  FROM (SELECT DISTINCT ex_id FROM cent ORDER BY ex_id LIMIT 12)),
         |s0n AS (SELECT si, sqrt(CAST(SUM(CAST(u * u AS DECIMAL(30,12)))
         |    AS DOUBLE)) AS nrm
         |  FROM cent JOIN s0ids USING (ex_id) GROUP BY si),
         |sup0 AS (SELECT s0ids.si, cent.pos, cent.u / s0n.nrm AS u
         |  FROM cent JOIN s0ids USING (ex_id) JOIN s0n USING (si)),
         |${lloyd(1)},
         |${lloyd(2)},
         |${lloyd(3)},
         |rd AS (SELECT e.c_id AS vec_id, s.si, CAST(SUM(CAST(
         |    CAST(e.v AS DOUBLE) * s.u AS DECIMAL(30,12))) AS DOUBLE) AS dot
         |  FROM cx e JOIN sup3 s USING (pos)
         |  WHERE s.si IN (SELECT si FROM a3) GROUP BY 1, 2),
         |rs AS (SELECT vec_id, si FROM (SELECT vec_id, si,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY dot DESC, si) AS rn FROM rd) WHERE rn = 1),
         |cd AS (SELECT e.c_id AS vec_id, c.ex_id, CAST(SUM(CAST(
         |    CAST(e.v AS DOUBLE) * c.u AS DECIMAL(30,12))) AS DOUBLE) AS dot
         |  FROM cx e JOIN rs ON rs.vec_id = e.c_id
         |  JOIN a3 ON a3.si = rs.si
         |  JOIN cent c ON c.ex_id = a3.ex_id AND c.pos = e.pos
         |  GROUP BY 1, 2)
         |SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM (
         |  SELECT vec_id, ex_id AS cell, ROW_NUMBER() OVER (
         |    PARTITION BY vec_id ORDER BY dot DESC, ex_id) AS rn FROM cd)
         |WHERE rn = 1 ORDER BY vec_id""".stripMargin
    }) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val init = Embeddings.ivfInitHashSample(emb,
        col("vec_id"), col("embedding"), 144)
      val cents = Embeddings.ivfTrain(emb,
        col("vec_id"), col("embedding"), init, iters = 0)
      require(cents.size > Embeddings.HierThreshold,
        s"q227 must exercise the two-level branch (C=${cents.size})")
      Embeddings.ivfAssignAuto(emb, col("vec_id"), col("embedding"), cents,
          exact = true)
        .orderBy(col("vec_id"))
    },

    // ---- embedding-cosine near-dup DEDUP: RP-LSH candidates, exact cosine
    // refine >= tau, greedy smaller-id-wins removal, survivors out ---------
    QueryDef("q94_cosine_dedup", {
      def sumsFor(t: Int) = (0 until 10).map { p =>
        s"""SUM(CAST(CAST(v AS DOUBLE) * (CASE WHEN
           |    ('0x' || substr(md5('t${t}_p${p}_' || CAST(pos AS VARCHAR)), 1, 1))::BIGINT % 2 = 0
           |    THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)
           |    AS DECIMAL(30,12))) AS d${t}_$p""".stripMargin
      }.mkString(",\n  ")
      def bucketFor(t: Int) = (0 until 10).map(p =>
        s"CASE WHEN d${t}_$p > 0 THEN ${1L << p} ELSE 0 END").mkString(" + ")
      s"""WITH $VecCte,
         |ex AS (SELECT vec_id,
         |    UNNEST(embedding) AS v, UNNEST(range(64)) AS pos FROM embeddings),
         |s AS (SELECT vec_id,
         |  ${sumsFor(0)},
         |  ${sumsFor(1)}
         |  FROM ex GROUP BY vec_id),
         |bk AS (
         |  SELECT vec_id, 0 AS tbl, CAST(${bucketFor(0)} AS BIGINT) AS bucket FROM s
         |  UNION ALL
         |  SELECT vec_id, 1 AS tbl, CAST(${bucketFor(1)} AS BIGINT) AS bucket FROM s),
         |pairs AS (
         |  SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS c_id
         |  FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bucket = b.bucket
         |  WHERE a.vec_id > b.vec_id),
         |dots AS (
         |  SELECT p.q_id, p.c_id, CAST(SUM(CAST(
         |    CAST(qa.v AS DOUBLE) * CAST(ca.v AS DOUBLE) AS DECIMAL(30,12))) AS DOUBLE) AS dot
         |  FROM pairs p
         |  JOIN cx qa ON qa.c_id = p.q_id
         |  JOIN cx ca ON ca.c_id = p.c_id AND ca.pos = qa.pos
         |  GROUP BY p.q_id, p.c_id),
         |removed AS (
         |  SELECT DISTINCT d.q_id AS vec_id
         |  FROM dots d
         |  JOIN cn qn ON qn.c_id = d.q_id
         |  JOIN cn ON cn.c_id = d.c_id
         |  WHERE d.dot / (qn.c_norm * cn.c_norm) >= 0.25)
         |SELECT e.vec_id FROM embeddings e
         |WHERE e.vec_id NOT IN (SELECT vec_id FROM removed)
         |ORDER BY e.vec_id""".stripMargin
    }) { (s, dir) =>
      Embeddings.cosineNearDupDedup(Tables.embeddings(s, dir),
          col("vec_id"), col("embedding"), tau = 0.25,
          numPlanes = 10, numTables = 2)
        .select(col("vec_id"))
        .orderBy(col("vec_id"))
    },

    // ---- corpus-ADAPTIVE bucketed ANN: plane count derived from the
    // corpus size itself (planesFor: smallest p with 64·2^p >= n) so bucket
    // occupancy — and the quadratic within-bucket refine — stays ~constant
    // at ANY scale. The fixed-plane q92 gate measured 17.5× growth per 10×
    // data at sf1 (SCALE_NOTES.md); this is the plan users should run. The
    // oracle derives the SAME plane count with an integer-exact scalar
    // subquery and gates each plane's bit by p < np — static SQL, adaptive
    // behavior. ------------------------------------------------------------
    QueryDef("q92b_ann_adaptive", {
      val maxP = 12 // oracle's static sum budget: supports n <= 64·2^12
      val sums = (0 until maxP).map { p =>
        s"""SUM(CAST(CAST(v AS DOUBLE) * (CASE WHEN
           |    ('0x' || substr(md5('p${p}_' || CAST(pos AS VARCHAR)), 1, 1))::BIGINT % 2 = 0
           |    THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)
           |    AS DECIMAL(30,12))) AS d$p""".stripMargin
      }.mkString(",\n  ")
      val bucket = (0 until maxP).map(p =>
        s"CASE WHEN $p < np AND d$p > 0 THEN ${1L << p} ELSE 0 END")
        .mkString(" + ")
      s"""WITH $VecCte,
         |cnt AS (SELECT COUNT(*) AS n FROM embeddings),
         |params AS (SELECT GREATEST(1, MIN(t.p)) AS np
         |  FROM range(0, 40) t(p), cnt
         |  WHERE 64 * (1::BIGINT << t.p) >= cnt.n),
         |ex AS (SELECT vec_id,
         |    UNNEST(embedding) AS v, UNNEST(range(64)) AS pos FROM embeddings),
         |s AS (SELECT vec_id,
         |  $sums
         |  FROM ex GROUP BY vec_id),
         |bk AS (SELECT vec_id, CAST($bucket AS BIGINT) AS bucket
         |  FROM s, params),
         |pairs AS (
         |  SELECT a.vec_id AS q_id, b.vec_id AS c_id
         |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
         |dots AS (
         |  SELECT p.q_id, p.c_id, CAST(SUM(CAST(
         |    CAST(qa.v AS DOUBLE) * CAST(ca.v AS DOUBLE) AS DECIMAL(30,12))) AS DOUBLE) AS dot
         |  FROM pairs p
         |  JOIN cx qa ON qa.c_id = p.q_id
         |  JOIN cx ca ON ca.c_id = p.c_id AND ca.pos = qa.pos
         |  GROUP BY p.q_id, p.c_id),
         |scored AS (
         |  SELECT d.q_id, d.c_id, d.dot / (qn.c_norm * cn.c_norm) AS cos
         |  FROM dots d
         |  JOIN cn qn ON qn.c_id = d.q_id
         |  JOIN cn ON cn.c_id = d.c_id)
         |SELECT q_id, c_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS BIGINT) AS rank
         |FROM scored QUALIFY rank <= 3
         |ORDER BY q_id, rank""".stripMargin
    }) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val bk = Embeddings.rpLshBucketAuto(emb, col("vec_id"), col("embedding"))
      val withB = emb.join(bk, "vec_id")
        .withColumn("__n", Embeddings.normExact(col("embedding")))
      val q = withB.select(col("vec_id").as("qv_id"),
        col("embedding").as("q_emb"), col("__n").as("q_n"), col("bucket"))
      val c = withB.select(col("vec_id").as("cv_id"),
        col("embedding").as("c_emb"), col("__n").as("c_n"),
        col("bucket").as("bucket_c"))
      val pairs = q.join(c, col("bucket") === col("bucket_c") &&
        col("qv_id") =!= col("cv_id"))
      Embeddings.cosinePairsTopKNormed(pairs, col("qv_id"), col("cv_id"),
          col("q_emb"), col("c_emb"), col("q_n"), col("c_n"), 3)
        .orderBy(col("q_id"), col("rank"))
    },

    // ---- corpus-adaptive cosine near-dup DEDUP: same planesFor contract
    // wired through cosineNearDupDedupAuto (the library default path) ------
    QueryDef("q94b_cosine_dedup_adaptive", {
      val maxP = 12
      def sumsFor(t: Int) = (0 until maxP).map { p =>
        s"""SUM(CAST(CAST(v AS DOUBLE) * (CASE WHEN
           |    ('0x' || substr(md5('t${t}_p${p}_' || CAST(pos AS VARCHAR)), 1, 1))::BIGINT % 2 = 0
           |    THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)
           |    AS DECIMAL(30,12))) AS d${t}_$p""".stripMargin
      }.mkString(",\n  ")
      def bucketFor(t: Int) = (0 until maxP).map(p =>
        s"CASE WHEN $p < np AND d${t}_$p > 0 THEN ${1L << p} ELSE 0 END")
        .mkString(" + ")
      s"""WITH $VecCte,
         |cnt AS (SELECT COUNT(*) AS n FROM embeddings),
         |params AS (SELECT GREATEST(1, MIN(t.p)) AS np
         |  FROM range(0, 40) t(p), cnt
         |  WHERE 64 * (1::BIGINT << t.p) >= cnt.n),
         |ex AS (SELECT vec_id,
         |    UNNEST(embedding) AS v, UNNEST(range(64)) AS pos FROM embeddings),
         |s AS (SELECT vec_id,
         |  ${sumsFor(0)},
         |  ${sumsFor(1)}
         |  FROM ex GROUP BY vec_id),
         |bk AS (
         |  SELECT vec_id, 0 AS tbl, CAST(${bucketFor(0)} AS BIGINT) AS bucket
         |    FROM s, params
         |  UNION ALL
         |  SELECT vec_id, 1 AS tbl, CAST(${bucketFor(1)} AS BIGINT) AS bucket
         |    FROM s, params),
         |pairs AS (
         |  SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS c_id
         |  FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bucket = b.bucket
         |  WHERE a.vec_id > b.vec_id),
         |dots AS (
         |  SELECT p.q_id, p.c_id, CAST(SUM(CAST(
         |    CAST(qa.v AS DOUBLE) * CAST(ca.v AS DOUBLE) AS DECIMAL(30,12))) AS DOUBLE) AS dot
         |  FROM pairs p
         |  JOIN cx qa ON qa.c_id = p.q_id
         |  JOIN cx ca ON ca.c_id = p.c_id AND ca.pos = qa.pos
         |  GROUP BY p.q_id, p.c_id),
         |removed AS (
         |  SELECT DISTINCT d.q_id AS vec_id
         |  FROM dots d
         |  JOIN cn qn ON qn.c_id = d.q_id
         |  JOIN cn ON cn.c_id = d.c_id
         |  WHERE d.dot / (qn.c_norm * cn.c_norm) >= 0.25)
         |SELECT e.vec_id FROM embeddings e
         |WHERE e.vec_id NOT IN (SELECT vec_id FROM removed)
         |ORDER BY e.vec_id""".stripMargin
    }) { (s, dir) =>
      Embeddings.cosineNearDupDedupAuto(Tables.embeddings(s, dir),
          col("vec_id"), col("embedding"), tau = 0.25, numTables = 2)
        .select(col("vec_id"))
        .orderBy(col("vec_id"))
    },

    // ---- Std.BLAS: distributed GEMM (gram matrix of a vector slice) ------
    // A is the 40×64 slice in coordinate form; C = A·Aᵀ contracts over the
    // shared dimension with one equality join + hash aggregate (Blas
    // Scaladoc explains the 100 TB block variant). 6-dp rounding puts both
    // engines' float→double sums on the same grid.
    QueryDef("q160_blas_gemm",
      """WITH a AS (SELECT vec_id AS i, g.k AS k,
        |    CAST(embedding[g.k] AS DOUBLE) AS v
        |  FROM embeddings, generate_series(1, 64) g(k) WHERE vec_id < 40)
        |SELECT a.i, b.i AS j, round(sum(a.v * b.v), 6) AS c
        |FROM a JOIN a AS b ON a.k = b.k
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val e = Tables.embeddings(s, dir).filter(col("vec_id") < 40)
      val coord = e.select(col("vec_id").as("i"),
          posexplode(col("embedding")).as(Seq("__p", "__x")))
        .select(col("i"), (col("__p") + 1).cast("long").as("k"),
          col("__x").cast("double").as("v"))
      val at = coord.select(col("k"), col("i").as("j"), col("v"))
      graft.functions.Blas.dgemmCoord(coord, at)
        .select(col("i"), col("j"), round(col("c"), 6).as("c"))
        .orderBy(col("i"), col("j"))
    },

    // ---- Std.BLAS: per-row vector ops via codegen'd array HOFs -----------
    QueryDef("q161_blas_vector",
      """SELECT vec_id,
        |  round(CAST(list_sum(list_transform(embedding,
        |    x -> abs(CAST(x AS DOUBLE)))) AS DOUBLE), 6) AS asum,
        |  round(sqrt(CAST(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS DOUBLE)), 6)
        |    AS nrm2,
        |  round(2.0 * CAST(embedding[1] AS DOUBLE)
        |    + CAST(embedding[2] AS DOUBLE), 6) AS axpy1
        |FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""".stripMargin) {
      (s, dir) =>
      import graft.functions.Blas
      val e = Tables.embeddings(s, dir).filter(col("vec_id") < 100)
      e.select(col("vec_id"),
          round(Blas.dasum(col("embedding")), 6).as("asum"),
          round(Blas.dnrm2(col("embedding")), 6).as("nrm2"),
          round(element_at(
            Blas.daxpy(2.0, slice(col("embedding"), 1, 1),
              slice(col("embedding"), 2, 1)), 1), 6).as("axpy1"))
        .orderBy(col("vec_id"))
    }
  )
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. An untimed warmup first exercises the JVM/codegen/
  * parquet-footer paths so the first timed query isn't charged for session
  * startup (the reference's benchmarks do the same — `timeActivities` off,
  * CRC off: `testing/benchmarks/ecl/terasort.ecl:20-34`).
  *
  * The headline `value` excludes [[Contrast]]: deliberately-fixed-parameter
  * runs kept as documented counter-examples (q92/q94 pin 256 LSH buckets
  * regardless of corpus size to demonstrate WHY the adaptive variants
  * q92b/q94b are the default — SCALE_NOTES.md carries the contrast table).
  * They still run and appear in `queries` plus their own `contrast_total`,
  * so nothing is hidden — they just don't tax the default-path headline.
  */
object Bench {

  /** Fixed-parameter contrast runs (non-default paths by design): pinned
    * LSH geometry regardless of corpus size — quadratic candidate growth
    * that the adaptive defaults (q92b single-table, q94b multitable via
    * planesFor) exist to avoid. q93 joined the set after the sf10
    * rehearsal measured its pinned-8-plane occupancy trap (781
    * vectors/bucket at 200k corpus → 21×/10× warm); its oracle gate is
    * unaffected.
    */
  private val Contrast =
    Set("q92_ann_bucketed", "q94_cosine_dedup", "q93_ann_multitable")

  /** SF-independent calibration basket (r16 verdict #2): three synthetic
    * probes — codegen CPU, a wide hash shuffle, a range-exchange sort —
    * sized to ~1 s each on a healthy machine, with NO table inputs so the
    * same basket is comparable across SFs and rounds. The sweep runs it
    * timed at start/middle/end and emits every phase plus a normalized
    * headline (`value_norm = value / calib_total`), so a sweep taken in a
    * degraded VM window carries its own window evidence instead of reading
    * as a code regression (r16's committed sweeps landed ~2× vs r15 purely
    * from kernel-storm windows — adjudicated environmental, but only via
    * manual counter-experiments). `calib_version` pins the basket
    * definition: normalized values are only comparable within a version.
    */
  private[graft] val CalibVersion = "v2"

  private[graft] def calibBasket(spark: SparkSession): Seq[(String, Double)] = {
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    Seq(
      // pure codegen arithmetic over a range — CPU / JIT / scheduler probe
      "cpu" -> t {
        spark.range(768L << 20)
          .select(sum(hash(col("id")).cast("long"))).collect()
      },
      // 64k-key hash aggregate over 48M rows — shuffle write+read probe
      "shuffle" -> t {
        spark.range(48L << 20)
          .groupBy(pmod(hash(col("id")), lit(1 << 16)).as("k"))
          .agg(count(lit(1)).as("c"))
          .select(sum(col("c"))).collect()
      },
      // global sort of 64M hashed longs — range exchange + spill-path probe
      "sort" -> t {
        spark.range(64L << 20).select(hash(col("id")).as("h"))
          .orderBy(col("h")).select(sum(col("h"))).collect()
      },
      // buffered 256 MB file write + fsync + read-back (v2): the r17 sf0.1
      // sweep found the VM's I/O path degrades INDEPENDENTLY of CPU —
      // compute queries at 0.94-0.97x parity with r15 while spray/copy/
      // blob queries inflated 4-7x on an idle-CPU machine (fsync'd writes
      // measured 53 MB/s vs ~300 healthy). A CPU-only basket reads such a
      // window as clean; this phase makes I/O weather visible in the
      // artifact itself.
      "io" -> t {
        val p = java.nio.file.Paths.get("target/calib_io.tmp")
        val ch = java.nio.channels.FileChannel.open(p,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE,
          java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
        try {
          val buf = java.nio.ByteBuffer.allocate(4 << 20)
          var i = 0
          while (i < 64) { // 64 x 4 MB = 256 MB
            buf.clear()
            while (buf.hasRemaining) buf.putLong(i.toLong * buf.position())
            buf.flip()
            while (buf.hasRemaining) ch.write(buf)
            i += 1
          }
          ch.force(false)
        } finally ch.close()
        val in = java.nio.channels.FileChannel.open(p,
          java.nio.file.StandardOpenOption.READ)
        try {
          val buf = java.nio.ByteBuffer.allocate(4 << 20)
          var n = 0
          while ({ buf.clear(); n = in.read(buf); n > 0 }) ()
        } finally in.close()
        java.nio.file.Files.deleteIfExists(p)
        ()
      })
  }

  private def newSession(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      // a long-lived session accumulates status-listener state across 80+
      // queries; keep retention minimal so allocation-heavy queries late in
      // the run don't pay growing GC costs
      .config("spark.sql.ui.retainedExecutions", "2")
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Times one query `repeat` times → (name, min, median, firstError).
    * A crashed query must surface as an ERROR cell, never as a fast time
    * (r15 verdict #3: swallowing Throwable let a mid-sweep crash read as
    * a speedup); the wall time is still recorded for the log, but errored
    * queries are excluded from every headline total by [[renderLine]] and
    * carried in the artifact's "errors" map.
    */
  private[graft] def measure(spark: SparkSession, sfDir: String,
      name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      repeat: Int): (String, Double, Double, Option[String]) = {
    def once(): (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
      ((System.nanoTime() - t0) / 1e9, err)
    }
    val runs = (1 to repeat).map(_ => once())
    val err = runs.flatMap(_._2).headOption
    val times = runs.map(_._1).sorted
    val tMin = times.head
    val tMed = if (times.size % 2 == 1) times(times.size / 2)
      else (times(times.size / 2 - 1) + times(times.size / 2)) / 2.0
    (name, tMin, tMed, err)
  }

  /** The full machine-read JSON line (complete per-query map). Since ~r06
    * this line outgrew the driver's ~2000-char output tail (218 queries ≈
    * 11 KB), so the driver's `BENCH_r*.json` captured it clipped mid-JSON
    * and `parsed` has been null for every round since (r19 verdict,
    * "What's wrong" #1). The full line is still printed (it IS the
    * contract's per-query record and `BENCH_LAST.json` persists it), and a
    * compact <1.5 KB summary line — [[renderSummaryLine]] — now prints
    * AFTER it as the final stdout line, so a tail-window parser recovers a
    * complete JSON object with the headline totals. Locale.ROOT: the
    * f-interpolator uses the default locale, which in comma-decimal
    * locales would emit invalid JSON ("q01":1,234). "queries" stays the
    * headline estimator (per-query MIN over the repetitions) for
    * cross-round comparability; medians ride alongside.
    */
  private[graft] def renderLine(
      results: Seq[(String, Double, Double, Option[String])],
      repeat: Int, sfDir: String): String =
    renderLine(results, repeat, sfDir, Nil)

  /** `calib`: (phase → basket times) from start/middle/end of the sweep.
    * `calib_total` is the MEDIAN of the phase sums (one storm-hit phase
    * doesn't poison the estimator), and `value_norm = value/calib_total`
    * is the cross-round comparable headline — raw totals are only
    * comparable between equally-healthy windows (README "benchmarks").
    */
  private[graft] def renderLine(
      results: Seq[(String, Double, Double, Option[String])],
      repeat: Int, sfDir: String,
      calib: Seq[(String, Seq[(String, Double)])]): String = {
    def d3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v, _, _) => s""""$k":${d3(v)}""" }
      .mkString("{", ",", "}")
    val qMed = results.map { case (k, _, m, _) => s""""$k":${d3(m)}""" }
      .mkString("{", ",", "}")
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => " "; case c => c.toString
      } + "\""
    val errs = results.collect { case (k, _, _, Some(e)) =>
      s""""$k":${jstr(e)}""" }.mkString("{", ",", "}")
    val errCount = results.count(_._4.isDefined)
    // errored queries never contribute to a headline total: a crash that
    // returns quickly must not read as a speedup in cross-round ratios
    val (contrast, main) =
      results.filter(_._4.isEmpty).partition(r => Contrast(r._1))
    val total = main.map(_._2).sum
    val cTotal = contrast.map(_._2).sum
    val medTotal = main.map(_._3).sum
    val calibJson = calib.map { case (phase, times) =>
      s""""$phase":${times.map { case (k, v) => s""""$k":${d3(v)}""" }
        .mkString("{", ",", "}")}"""
    }.mkString("{", ",", "}")
    val phaseSums = calib.map(_._2.map(_._2).sum).sorted
    val calibTotal =
      if (phaseSums.isEmpty) 0.0
      else if (phaseSums.size % 2 == 1) phaseSums(phaseSums.size / 2)
      else (phaseSums(phaseSums.size / 2 - 1) + phaseSums(phaseSums.size / 2)) / 2.0
    val norm = if (calibTotal > 0) total / calibTotal else 0.0
    s"""{"metric":"total","value":${d3(total)},"unit":"sec","median_total":${d3(medTotal)},"repeat":$repeat,"contrast_total":${d3(cTotal)},"calib":$calibJson,"calib_total":${d3(calibTotal)},"value_norm":${d3(norm)},"calib_version":"$CalibVersion","error_count":$errCount,"errors":$errs,"queries":$qs,"queries_median":$qMed,"sf":"$sfDir"}"""
  }

  /** Compact summary line (< 1.5 KB — r19 verdict "Next round" #1): the
    * same headline fields as [[renderLine]] minus the per-query maps and
    * per-query errors, so the WHOLE object fits inside the driver's
    * ~2000-char output tail and parses. Printed as the FINAL stdout line.
    * The per-query map is NOT dropped from the contract: the full line
    * still prints immediately before this one and is persisted verbatim in
    * `BENCH_LAST.json` (committed per sweep as `BENCH_<sf>_r<N>*.json`).
    * Deliberately carries NO "queries" key: a partial map in a clipped
    * window must never be readable as "queries dropped from the bench".
    */
  private[graft] def renderSummaryLine(
      results: Seq[(String, Double, Double, Option[String])],
      repeat: Int, sfDir: String, cpus: String,
      calib: Seq[(String, Seq[(String, Double)])]): String = {
    def d3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val errCount = results.count(_._4.isDefined)
    val (contrast, main) =
      results.filter(_._4.isEmpty).partition(r => Contrast(r._1))
    val total = main.map(_._2).sum
    val cTotal = contrast.map(_._2).sum
    val medTotal = main.map(_._3).sum
    val phaseSums = calib.map(_._2.map(_._2).sum).sorted
    val calibTotal =
      if (phaseSums.isEmpty) 0.0
      else if (phaseSums.size % 2 == 1) phaseSums(phaseSums.size / 2)
      else (phaseSums(phaseSums.size / 2 - 1) + phaseSums(phaseSums.size / 2)) / 2.0
    val norm = if (calibTotal > 0) total / calibTotal else 0.0
    s"""{"metric":"total","value":${d3(total)},"unit":"sec","median_total":${d3(medTotal)},"repeat":$repeat,"n_queries":${results.size},"contrast_total":${d3(cTotal)},"calib_total":${d3(calibTotal)},"value_norm":${d3(norm)},"calib_version":"$CalibVersion","error_count":$errCount,"cpus":"$cpus","sf":"$sfDir","per_query_in":"BENCH_LAST.json"}"""
  }

  private def warmup(spark: SparkSession, sfDir: String): Unit = {
    // untimed: codegen + shuffle + window machinery + the parquet footers
    spark.range(1000000).groupBy((col("id") % 100).as("k"))
      .agg(sum(col("id"))).count()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      Tables.table(spark, sfDir, t).limit(1).count()
    }
    SparkEntry.queries.get("q01_agg").foreach(f => f(spark, sfDir).count())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // repetitions per query (arg 0 or SPARK_GRAFT_REPEAT, default 2): the
    // VM shows multi-minute noisy-neighbor windows that made committed
    // sweeps read 1.2× apart on identical code (r11 verdict #3); per-query
    // min over N runs is the session-noise estimator the cross-round
    // analysis used by hand — now emitted in the artifact itself.
    val repeat = args.headOption.orElse(sys.env.get("SPARK_GRAFT_REPEAT"))
      .map(_.toInt).getOrElse(2).max(1)
    val spark = newSession(cpus)

    // window-probe mode: run ONLY the calibration basket (one untimed JIT
    // pass + N timed) and print its JSON — tools/bench_sweep.sh gates sweep
    // launches on this reading vs the session floor, so headline artifacts
    // are only committed from representative windows (r16 verdict #1)
    if (sys.env.get("SPARK_GRAFT_CALIB_ONLY").exists(_ == "1")) {
      calibBasket(spark) // untimed: JIT + codegen
      val n = sys.env.get("SPARK_GRAFT_CALIB_RUNS").map(_.toInt).getOrElse(2)
      val runs = (1 to n).map(i => s"run$i" -> calibBasket(spark))
      def d3(v: Double) =
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      val best = runs.map(_._2.map(_._2).sum).min
      println(s"""{"metric":"calib","calib_version":"$CalibVersion","best_total":${d3(best)},"runs":${
        runs.map { case (k, ts) => s""""$k":${ts.map { case (p, v) =>
          s""""$p":${d3(v)}""" }.mkString("{", ",", "}")}""" }
          .mkString("{", ",", "}")}}""")
      spark.stop()
      return
    }

    warmup(spark, sfDir)

    // One session for the whole run (restarting contexts or clearing the
    // cache between queries benched consistently worse). Each query runs
    // twice back-to-back and reports the better time: with 80+ queries'
    // generated classes flooding the JIT queue, first executions can run
    // partially interpreted (25× observed) — the second run measures the
    // engine, not the JVM's compile backlog.
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    // segmented code cache names pools "CodeHeap '...'"; with
    // -XX:-SegmentedCodeCache there is a single "CodeCache" pool
    def poolUsage(nameFrags: String*): Long =
      ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(p => nameFrags.exists(p.getName.contains))
        .map(_.getUsage.getUsed).sum
    // optional subset (SPARK_GRAFT_ONLY=q215_semdedup,q92b_...): probe
    // runs at big synthetic SFs time a handful of queries, not the sweep.
    // SPARK_GRAFT_SKIP excludes named queries — the fixed-parameter
    // CONTRAST runs are deliberately quadratic past sf1 (they exist to
    // demonstrate the trap the adaptive defaults avoid), so sf10+ sweeps
    // skip them rather than burn an hour proving the documented point.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val skip = sys.env.get("SPARK_GRAFT_SKIP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) && !skip(n) }
    // calibration basket: one untimed JIT pass, then timed at start /
    // after half the queries / at the end — the sweep's own window record
    calibBasket(spark)
    def calibPhase(phase: String): (String, Seq[(String, Double)]) = {
      val ts = calibBasket(spark)
      System.err.println(f"[bench] calib/$phase%-17s total=${ts.map(_._2).sum}%8.2f s  ${ts.map { case (k, v) => f"$k=$v%.2f" }.mkString(" ")}")
      phase -> ts
    }
    val calibStart = calibPhase("start")
    // the mid basket runs INTERLEAVED, after the first half of the queries
    // — a storm that arrives mid-sweep shows up as start≈end≪mid or
    // start≪mid≈end in the committed artifact, not as a mystery 2× total
    val half = math.max(1, names.size / 2)
    var calibMid: Option[(String, Seq[(String, Double)])] = None
    val results = names.zipWithIndex.map { case ((name, fn), i) =>
      if (i == half && calibMid.isEmpty) calibMid = Some(calibPhase("mid"))
      val r = measure(spark, sfDir, name, fn, repeat)
      System.err.println(f"[bench] $name%-24s min=${r._2}%8.2f s med=${r._3}%8.2f s${r._4.fold("")(e => s"  ERROR=$e")}  codecache=${poolUsage("CodeHeap", "CodeCache") / (1 << 20)}%5d MB  meta=${poolUsage("Metaspace") / (1 << 20)}%5d MB")
      // generated classes are per-query garbage once the query completes;
      // collecting lets the JVM unload them and reclaim code cache before
      // it fills and flushing starts evicting HOT methods (25× observed
      // on late-alphabet queries in long runs)
      System.gc()
      r
    }
    val calibEnd = calibPhase("end")
    val calibAll = Seq(calibStart) ++ calibMid.toSeq ++ Seq(calibEnd)
    val line = renderLine(results, repeat, sfDir, calibAll)
    println(line)
    // compact summary LAST: the full line above exceeds the driver's
    // ~2000-char tail window (per-query map alone is ~5.4 KB for 218
    // queries), so the final printed line is a <1.5 KB object with the
    // headline totals that a tail parser can recover whole. The full
    // per-query record is the line above plus BENCH_LAST.json below.
    println(renderSummaryLine(results, repeat, sfDir, cpus, calibAll))
    // ALSO persist the full record: the driver's BENCH_r*.json tail
    // truncates at 2000 chars (r12 verdict "what's wrong" #4), so the
    // committed file — not the driver's clipped capture — is the
    // authoritative per-query artifact. Overwritten per run; sweeps
    // copy it to BENCH_<sf>_r<N>.json before committing.
    // best-effort: stdout above already carries the record — an
    // unwritable CWD must not turn a finished multi-hour sweep into a
    // nonzero exit
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out), line + "\n")
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] could not persist $out: ${e.getMessage}")
    }
    spark.stop()
  }
}

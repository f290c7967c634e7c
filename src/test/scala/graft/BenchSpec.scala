package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bench artifact contract (r15 verdict #3): a query that crashes
  * mid-sweep must be visibly RED in the artifact — an error marker in the
  * "errors" map, an error_count, and exclusion from every headline total —
  * never a fast-looking wall-time cell.
  */
class BenchSpec extends SparkSpec {

  private val ok: (SparkSession, String) => DataFrame =
    (s, _) => s.range(10).toDF("id")
  private val poisoned: (SparkSession, String) => DataFrame =
    (_, _) => throw new IllegalStateException("boom \"quoted\"\npath")

  test("a poisoned query shows up marked and excluded from totals") {
    val good = Bench.measure(spark, sf, "q_good", ok, 2)
    val bad = Bench.measure(spark, sf, "q_bad", poisoned, 2)
    assert(good._4.isEmpty)
    assert(bad._4.exists(_.startsWith("IllegalStateException")))
    val line = Bench.renderLine(Seq(good, bad), 2, sf)
    assert(line.contains(""""error_count":1"""), line)
    assert(line.contains(""""q_bad":"IllegalStateException"""), line)
    // the error message is JSON-safe (quotes escaped, newlines removed)
    assert(line.contains("""boom \"quoted\" path"""), line)
    // headline total excludes the poisoned query: equal to the good
    // query's min alone (3-decimal rendering)
    val total = """"value":([0-9.]+)""".r.findFirstMatchIn(line).get.group(1)
    assert(math.abs(total.toDouble - good._2) < 0.002, line)
    // but its wall time still appears in the per-query map for the log
    assert(line.contains(""""q_bad":0""") || line.contains(""""q_bad":"""),
      line)
  }

  test("a clean sweep renders error_count=0 and an empty errors map") {
    val line = Bench.renderLine(Seq(Bench.measure(spark, sf, "q_good", ok, 1)),
      1, sf)
    assert(line.contains(""""error_count":0"""), line)
    assert(line.contains(""""errors":{}"""), line)
  }

  // r16 verdict #2: the artifact must be noise-immune by construction —
  // the calibration basket's start/mid/end phases and the normalized
  // headline (value / median phase sum) ride in the JSON itself, so a
  // sweep taken in a degraded window carries its own window evidence
  test("calibration phases render and value_norm = value/median(calib)") {
    val good = Bench.measure(spark, sf, "q_good", ok, 1)
    val calib = Seq(
      "start" -> Seq("cpu" -> 1.0, "shuffle" -> 1.0, "sort" -> 1.0), // 3.0
      "mid" -> Seq("cpu" -> 2.0, "shuffle" -> 2.0, "sort" -> 2.0),   // 6.0
      "end" -> Seq("cpu" -> 1.0, "shuffle" -> 1.5, "sort" -> 1.5))   // 4.0
    val line = Bench.renderLine(Seq(good), 1, sf, calib)
    assert(line.contains(""""calib_total":4.000"""), line)
    assert(line.contains(s""""calib_version":"${Bench.CalibVersion}""""), line)
    assert(line.contains(""""start":{"cpu":1.000,"shuffle":1.000,"sort":1.000}"""), line)
    val norm = """"value_norm":([0-9.]+)""".r
      .findFirstMatchIn(line).get.group(1).toDouble
    assert(math.abs(norm - good._2 / 4.0) < 0.002, line)
    // without calib phases the normalized fields degrade to zero, never NaN
    val bare = Bench.renderLine(Seq(good), 1, sf)
    assert(bare.contains(""""calib_total":0.000"""), bare)
    assert(bare.contains(""""value_norm":0.000"""), bare)
  }

  // r19 verdict "Next round" #1: the driver keeps only the last ~2000
  // chars of bench output, and the full line's per-query map alone is
  // ~5.4 KB at 218 queries — so the FINAL printed line must be a compact
  // summary that fits the tail whole. The full line (with the map) still
  // prints before it and persists in BENCH_LAST.json.
  test("summary line stays under the driver's tail window at 218 queries") {
    val results = (1 to 218).map { i =>
      (f"q$i%03d_some_realistic_query_name", 1.234, 1.345,
        Option.empty[String])
    }
    val calib = Seq(
      "start" -> Seq("cpu" -> 1.0, "shuffle" -> 1.0, "sort" -> 1.0, "io" -> 1.0),
      "mid" -> Seq("cpu" -> 2.0, "shuffle" -> 2.0, "sort" -> 2.0, "io" -> 2.0),
      "end" -> Seq("cpu" -> 1.0, "shuffle" -> 1.5, "sort" -> 1.5, "io" -> 1.0))
    val line = Bench.renderSummaryLine(results, 2,
      "/root/testdata/sf0.1", "32", calib)
    assert(line.length < 1500, s"len=${line.length}: $line")
    assert(!line.contains("\n"))
    // same headline estimators as the full line
    val full = Bench.renderLine(results, 2, "/root/testdata/sf0.1", calib)
    def field(l: String, k: String): String =
      (s""""$k":([0-9.]+)""").r.findFirstMatchIn(l).get.group(1)
    for (k <- Seq("value", "median_total", "contrast_total", "calib_total",
        "value_norm"))
      assert(field(line, k) == field(full, k), k)
    assert(line.contains(""""n_queries":218"""), line)
    assert(line.contains(""""cpus":"32""""), line)
    // deliberately NO per-query map: a clipped partial map must never be
    // readable as dropped queries
    assert(!line.contains(""""queries""""), line)
  }

  test("summary line excludes errored queries from the headline total") {
    val good = Bench.measure(spark, sf, "q_good", ok, 1)
    val bad = Bench.measure(spark, sf, "q_bad", poisoned, 1)
    val line = Bench.renderSummaryLine(Seq(good, bad), 1, sf, "4", Nil)
    assert(line.contains(""""error_count":1"""), line)
    val total = """"value":([0-9.]+)""".r.findFirstMatchIn(line).get.group(1)
    assert(math.abs(total.toDouble - good._2) < 0.002, line)
  }

  test("the basket itself runs: four positive SF-independent phases") {
    val ts = Bench.calibBasket(spark)
    assert(ts.map(_._1) == Seq("cpu", "shuffle", "sort", "io"))
    assert(ts.forall(_._2 > 0), ts.toString)
    // the io probe cleans up after itself
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get("target/calib_io.tmp")))
  }
}

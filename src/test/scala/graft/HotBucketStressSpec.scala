package graft

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial memory gate for the LSH skew guard (TextOps.lshJaccardPairs).
  *
  * The guard's VALUE contract (both routes emit identical pairs, mixed
  * routing included) is pinned by TextOpsSpec. This spec pins the MEMORY
  * contract — "a hot bucket never concentrates its s payloads in one
  * task's heap" — as an observed fact rather than reasoning: each run
  * executes in a sacrificial forked JVM under a hard 640 MiB -Xmx cap
  * (the suite JVM must survive a probe OOM), over a corpus whose band
  * rows all share ONE bucket, the degenerate key that boilerplate and
  * template spam produce at crawl scale.
  *
  *  - guarded, default maxBucket, 3000-doc hot bucket (≫ 1024): the
  *    distributed-join route streams/spills and COMPLETES under the cap,
  *    emitting the closed-form pair stats for identical docs.
  *  - unguarded (maxBucket = Int.MaxValue), 5000 docs × 4000-shingle
  *    payloads (~0.5 GB of member payloads in ONE collect_list buffer):
  *    dies with java.lang.OutOfMemoryError under the SAME cap — the
  *    exact executor-killing failure the guard exists to prevent.
  *
  * The corpora differ in payload width because the demonstrations pull
  * in opposite directions: the OOM needs bucket-payload bytes to exceed
  * the heap, while any route's work on a hot bucket is quadratic in its
  * size (LSH's contract), so the completion run keeps payloads slim to
  * finish in test time. A 50 k-doc bucket would OOM the unguarded path
  * even sooner and is quadratic-infeasible to COMPLETE on any route.
  */
class HotBucketStressSpec extends AnyFunSuite {

  // mirrors build.sbt's JDK-17 module options (Spark outside spark-submit)
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Run HotBucketProbe in a fresh JVM; (exitCode, combined output). */
  private def fork(mode: String, docs: Int, shingles: Int): (Int, String) = {
    val java = s"${System.getProperty("java.home")}/bin/java"
    val cmd = Seq(java, "-Xmx640m", "-XX:+ExitOnOutOfMemoryError") ++
      addOpens ++ Seq(
        "-Dspark.ui.enabled=false",
        "-cp", System.getProperty("java.class.path"),
        "graft.tools.HotBucketProbe", mode, docs.toString, shingles.toString)
    val buf = new StringBuilder
    val logger = scala.sys.process.ProcessLogger(
      l => buf.append(l).append('\n'), l => buf.append(l).append('\n'))
    val exit = scala.sys.process.Process(cmd).!(logger)
    (exit, buf.toString)
  }

  test("guarded: a 3000-doc hot bucket (default maxBucket=1024) completes " +
      "under a 640 MiB heap with closed-form values") {
    val docs = 3000
    val (exit, out) = fork("guarded", docs, 8)
    val pairs = docs.toLong * (docs - 1) / 2
    assert(exit == 0, s"guarded probe failed (exit=$exit):\n${out.takeRight(2000)}")
    assert(out.contains(
      s"PROBE_OK pairs=$pairs inter_sum=${pairs * 8} jac_min=1.0"),
      s"guarded probe values wrong:\n${out.takeRight(2000)}")
  }

  test("unguarded (maxBucket=MaxValue): the same cap dies with " +
      "OutOfMemoryError on one ~0.5 GB bucket — the failure the guard " +
      "prevents") {
    val (exit, out) = fork("unguarded", 5000, 4000)
    assert(exit != 0, "unguarded probe unexpectedly completed under the cap")
    assert(out.contains("OutOfMemoryError"),
      s"expected an OOM death, got exit=$exit:\n${out.takeRight(2000)}")
  }
}

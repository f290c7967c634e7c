package graft

import graft.serve.Published
import org.apache.spark.sql.functions._

/** Minutes-long mixed-workload serving soak (r17 verdict #7). The standing
  * ServeSpec gates are storm-shaped — seconds of load proving one property
  * each. Roxie's production failure modes (the r15 dictionary permit leak,
  * stale responses after a catalog promote, queue-depth creep) only show
  * up under SUSTAINED mixed load, so this spec drives three 30-second
  * phases of cached + uncached + priority-mixed traffic with an atomic
  * generation promote between phases 1 and 2, then asserts the invariants
  * that leak-class bugs break:
  *
  *  - ZERO stale responses: every response completed after the promote's
  *    commit observes the new generation (the r17 data-version cache pin);
  *  - bounded p99 for accepted high-lane requests across the whole soak;
  *  - no permit/thread leak: after the pool quiesces, a full-width burst
  *    of `workers` concurrent uncached requests all admit (a leaked gate
  *    permit would 503 part of the burst), and a second burst confirms;
  *  - exact response accounting: accepted + shed == issued, and every
  *    accepted response parsed as a valid payload (no torn writes).
  */
class ServeSoakSpec extends SparkSpec {
  import spark.implicits._

  test("90-second mixed soak: promote mid-run, zero stale, bounded p99, " +
      "no permit leak (roxie ccdlistener posture under sustained load)") {
    val root = s"target/graft_io/serve_soak-${System.nanoTime()}"
    val cat = new graft.sources.FileCatalog(spark, root)
    cat.write("gen::one", Seq.tabulate(64)(i => (i.toLong, "v1"))
      .toDF("k", "gen"))
    cat.write("gen::two", Seq.tabulate(64)(i => (i.toLong, "v2"))
      .toDF("k", "gen"))
    cat.createSuperFile("live")
    cat.addSuperFile("live", "gen::one")

    val idx = s"$root/idx"
    graft.sources.IndexedTable.build(
      Tables.customer(spark, sf).select("c_custkey", "c_name"),
      Seq("c_custkey"), idx, numPartitions = 2)

    val pub = new Published(spark)
    // high lane: cached point lookups (the interactive class)
    pub.publish("soak_point") { (s, stored) =>
      graft.sources.IndexedTable.keyedRead(s, idx,
        col("c_custkey") === stored.long("key", -1L))
    }
    pub.setPriority("soak_point", "high")
    // low lane: deliberately cache-hostile (unique key each call) — keeps
    // real Spark evaluations flowing through the worker pool all soak
    pub.publish("soak_scan") { (s, stored) =>
      val salt = stored.long("salt", 0L)
      Tables.customer(s, sf).filter(col("c_custkey") % 97 === salt % 97)
        .agg(count(lit(1)).as("n"), lit(salt).as("salt"))
    }
    pub.setPriority("soak_scan", "low")
    // the promoted dataset: responses carry the live generation tag
    pub.publish("soak_live") { (s, _) =>
      cat.readSuper("live").groupBy(col("gen")).agg(count(lit(1)).as("n"))
    }
    pub.setPriority("soak_live", "high")
    pub.withDataVersion(() => cat.dataVersion.toString)

    val workers = 8
    val port = pub.servePrioritized(0, 100, cacheTtlMs = 600000,
      workers = workers, highQueue = 8, lowQueue = 16)

    // (status, body, seconds) — 503 is a legitimate shed, not a failure
    def get(path: String): (Int, String, Double) = {
      val t0 = System.nanoTime()
      val conn = new java.net.URI(s"http://127.0.0.1:$port$path").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(60000)
      val status = conn.getResponseCode
      val is = if (status >= 400) conn.getErrorStream else conn.getInputStream
      val body =
        if (is == null) ""
        else try scala.io.Source.fromInputStream(is, "UTF-8").mkString
        finally is.close()
      (status, body, (System.nanoTime() - t0) / 1e9)
    }

    val issued = new java.util.concurrent.atomic.AtomicLong(0)
    val accepted = new java.util.concurrent.atomic.AtomicLong(0)
    val shed = new java.util.concurrent.atomic.AtomicLong(0)
    val staleAfterPromote = new java.util.concurrent.atomic.AtomicLong(0)
    val torn = new java.util.concurrent.atomic.AtomicLong(0)
    val highLat = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
    // promoteNanos is set at the transaction's COMMIT; only requests that
    // STARTED after it must see v2 (an in-flight pre-promote request may
    // legitimately return v1)
    @volatile var promoteNanos = Long.MaxValue

    def phase(seconds: Int, clients: Int): Unit = {
      val deadline = System.nanoTime() + seconds * 1000000000L
      val pool = java.util.concurrent.Executors.newFixedThreadPool(clients)
      try {
        val fs = (0 until clients).map { c =>
          pool.submit(new Runnable {
            def run(): Unit = {
              var i = 0
              while (System.nanoTime() < deadline) {
                val started = System.nanoTime()
                val (status, body, sec) = (i % 4: @unchecked) match {
                  case 0 | 1 =>
                    val r = get(s"/query/soak_point?key=${(c * 7 + i) % 32 + 1}")
                    if (r._1 == 200) highLat.add(r._3)
                    r
                  case 2 =>
                    get(s"/query/soak_scan?salt=${c * 100000 + i}")
                  case 3 =>
                    val r = get("/query/soak_live")
                    if (r._1 == 200) {
                      highLat.add(r._3)
                      if (!r._2.contains("\"gen\"")) torn.incrementAndGet()
                      if (started > promoteNanos && r._2.contains("v1"))
                        staleAfterPromote.incrementAndGet()
                    }
                    r
                }
                issued.incrementAndGet()
                if (status == 200) {
                  accepted.incrementAndGet()
                  if (body.isEmpty) torn.incrementAndGet()
                } else if (status == 503) shed.incrementAndGet()
                else fail(s"unexpected status $status: $body")
                i += 1
              }
            }
          })
        }
        fs.foreach(_.get())
      } finally { pool.shutdown(); pool.awaitTermination(60,
        java.util.concurrent.TimeUnit.SECONDS); () }
    }

    try {
      phase(30, clients = 12) // phase 1: v1 live
      // atomic generation promote (ONE catalog version commit)
      cat.transaction(_.replaceSuperFile("live", "gen::one", "gen::two"))
      promoteNanos = System.nanoTime()
      phase(30, clients = 12) // phase 2: v2 live, data-version pin active
      phase(30, clients = 16) // phase 3: heavier mix, long-TTL cache warm
      assert(staleAfterPromote.get() == 0,
        s"${staleAfterPromote.get()} responses served stale v1 after the promote")
      assert(torn.get() == 0, s"${torn.get()} torn/empty 200 responses")
      assert(accepted.get() + shed.get() == issued.get(),
        "response accounting must be exact")
      assert(accepted.get() > 500,
        s"soak too idle to be meaningful: ${accepted.get()} accepted")
      val lats = highLat.toArray(Array.empty[java.lang.Double])
        .map(_.doubleValue).sorted
      val p99 = lats((lats.length * 99) / 100 min (lats.length - 1))
      info(f"soak: issued=${issued.get()} accepted=${accepted.get()} " +
        f"shed=${shed.get()} high-lane p99=${p99}%.3f s over ${lats.length} samples")
      assert(p99 < 5.0,
        f"high-lane p99 $p99%.2f s breaches the soak bound (permit " +
          "starvation or queue creep)")
      // permit-leak probe: the pool has quiesced; a full-width burst of
      // uncached evaluations must ALL admit — twice
      (1 to 2).foreach { round =>
        val pool = java.util.concurrent.Executors.newFixedThreadPool(workers)
        try {
          val fs = (0 until workers).map { c =>
            pool.submit(new java.util.concurrent.Callable[Int] {
              def call(): Int =
                get(s"/query/soak_scan?salt=${900000 + round * 1000 + c}")._1
            })
          }
          val codes = fs.map(_.get())
          assert(codes.forall(_ == 200),
            s"burst $round: leaked admission permits — got $codes")
        } finally pool.shutdown()
      }
    } finally pub.stopServing()
  }
}

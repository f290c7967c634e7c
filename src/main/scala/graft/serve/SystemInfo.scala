package graft.serve

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Std.System environment-introspection modules (reference
  * `ecllibrary/std/system/{Job,Thorlib,Log,Debug,Util}.ecl` — thin
  * SERVICE wrappers over engine context methods): the same surface
  * re-pointed at the Spark runtime. Cluster identity comes from the
  * SparkContext, per-node identity from the task context (exposed as a
  * COLUMN, since "which node am I on" is per-partition in a dataflow),
  * logical→physical mapping from the [[graft.sources.FileCatalog]].
  */
object SystemInfo {

  /** Std.System.Job (Job.ecl): whole-job identity. */
  object Job {
    /** CLUSTERSIZE — the parallelism the job actually schedules at. */
    def nodes(spark: SparkSession): Int =
      spark.sparkContext.defaultParallelism
    /** WORKUNIT — the engine's id for this run. */
    def wuid(spark: SparkSession): String =
      spark.sparkContext.applicationId
    def name(spark: SparkSession): String = spark.sparkContext.appName
    def user(spark: SparkSession): String = spark.sparkContext.sparkUser
    /** target()/cluster() — where the job is running. */
    def target(spark: SparkSession): String = spark.sparkContext.master
    /** daliServer() — the metadata/coordination endpoint; Spark's analog
      * is the master URL (standalone/yarn/k8s) that brokers the cluster.
      */
    def daliServer(spark: SparkSession): String = spark.sparkContext.master
    def platform(spark: SparkSession): String =
      s"spark ${spark.version}"
    def os(): String =
      s"${System.getProperty("os.name")} ${System.getProperty("os.version")}"
    /** logString — write into the job log (driver-side). */
    def logString(text: String): Int = {
      println(s"[job] $text")
      text.length
    }
  }

  /** Std.System.Thorlib (Thorlib.ecl): per-node context. The reference's
    * node() is meaningful only inside a slave activity, so here it is a
    * COLUMN (the partition executing each row), not a driver scalar.
    */
  object Thorlib {
    /** getNodeNum as a column — which partition/slot computed this row. */
    def node(): Column = spark_partition_id()
    def nodes(spark: SparkSession): Int =
      spark.sparkContext.defaultParallelism
    def group(spark: SparkSession): String =
      spark.sparkContext.getConf.get("spark.app.name", "thor")
    /** logicalToPhysical (l2p) via the file catalog. */
    def logicalToPhysical(cat: graft.sources.FileCatalog,
        name: String): String =
      cat.info(name).map(_._1).getOrElse(
        throw new NoSuchElementException(s"no such logical file: $name"))
    /** getExpandLogicalName — scope-qualify a bare name the way the
      * reference prefixes the current scope.
      */
    def getExpandLogicalName(scope: String, name: String): String =
      if (name.contains("::") || scope.isEmpty) name else s"$scope::$name"
  }

  /** Std.System.Log (Log.ecl / lib_logging): correlation ids + workunit
    * messages. Trace/span ids follow W3C trace-context shapes like the
    * reference's OTel-backed implementation.
    */
  object Log {
    private val startedAtMs = System.currentTimeMillis()
    private val rng = new java.security.SecureRandom()

    def dbglog(text: String): Unit = println(s"[dbglog] $text")

    /** getElapsedMs — ms since this process (the "workunit") started. */
    def getElapsedMs(): Long = System.currentTimeMillis() - startedAtMs

    private def hex(bytes: Int): String = {
      val b = new Array[Byte](bytes)
      rng.nextBytes(b)
      b.map(x => f"${x & 0xff}%02x").mkString
    }
    /** generateGloballyUniqueId — opaque, collision-resistant. */
    def generateGloballyUniqueId(): String = java.util.UUID.randomUUID().toString
    /** 16-byte trace id / 8-byte span id, W3C trace-context sized. */
    private lazy val traceId = hex(16)
    private lazy val spanId = hex(8)
    def getTraceID(): String = traceId
    def getSpanID(): String = spanId
    /** traceparent header (W3C trace-context §3.2). */
    def getTraceSpanHeader(): String = s"00-$traceId-$spanId-01"
    def getGlobalId(): String = traceId
    def getLocalId(): String = spanId
    def getCallerId(): String = ""

    /** addWorkunitInformation/Warning/Error → the run registry's message
      * stream (the reference writes workunit messages; [[Workunits]] is
      * that registry here).
      */
    def addWorkunitMessage(wu: Workunits, wuid: String, severity: String,
        text: String, code: Int = 0): Unit =
      wu.addMessage(wuid, severity, text, code)
  }

  /** Std.System.Debug (Debug.ecl). */
  object Debug {
    def sleep(millis: Long): Unit = Thread.sleep(millis)
    /** msTick — monotonic ms (jlib's tick counter). */
    def msTick(): Long = System.nanoTime() / 1000000L
    def printStackReport(): String = {
      val sb = new StringBuilder
      Thread.currentThread().getStackTrace.foreach(f => sb.append(f).append('\n'))
      sb.toString
    }
  }

  /** Std.System.Util (Util.ecl). */
  object Util {
    def getHostName(ipAddress: String): String =
      try java.net.InetAddress.getByName(ipAddress).getCanonicalHostName
      catch { case _: java.net.UnknownHostException => "" }
    def resolveHostName(hostname: String): String =
      try java.net.InetAddress.getByName(hostname).getHostAddress
      catch { case _: java.net.UnknownHostException => "" }

    private val uniqueCounter = new java.util.concurrent.atomic.AtomicLong(0L)
    /** getUniqueInteger — unique within the job (Dali hands out ranges;
      * here the app-start epoch seeds the high bits so restarts do not
      * collide, and the counter serializes within the JVM).
      */
    def getUniqueInteger(): Long =
      (startEpoch << 20) | uniqueCounter.incrementAndGet()
    private val startEpoch = System.currentTimeMillis() / 1000

    /** PlatformVersionCheck (Util.ecl:65): true iff the running platform
      * version is >= `v` ("x", "x.y" or "x.y.z"; trailing cruft ignored —
      * the reference's regex pulls leading integers only).
      */
    def platformVersionCheck(v: String, current: String): Boolean = {
      def parts(s: String): (Int, Int, Int) = {
        val m = "^(\\d+)(?:\\.(\\d+))?(?:\\.(\\d+))?".r.findFirstMatchIn(s)
        def g(i: Int): Int =
          m.flatMap(x => Option(x.group(i))).map(_.toInt).getOrElse(0)
        (g(1), g(2), g(3))
      }
      val (wj, wn, ws) = parts(v)
      val (cj, cn, cs) = parts(current)
      if (cj != wj) cj > wj
      else if (cn != wn) cn > wn
      else cs >= ws
    }
    def platformVersionCheck(v: String, spark: SparkSession): Boolean =
      platformVersionCheck(v, spark.version)
  }
}

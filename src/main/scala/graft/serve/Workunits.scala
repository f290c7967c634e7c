package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** workunitservices surface (ref `plugins/workunitservices/
  * workunitservices.hpp:45-72`: wsWorkunitExists / wsWorkunitList /
  * wsWorkunitTimeStamps / wsWorkunitMessages / wsWorkunitFilesRead):
  * query-execution metadata introspection. Each recorded run is a
  * "workunit": id, name, owner, state, wall-clock timing, result row
  * count, the parquet locations its plan actually scanned, and any
  * messages logged during the run.
  *
  * The registry is driver-side state (the reference keeps workunits in
  * Dali — also a metadata service); list results come back as DataFrames
  * so they compose with the engine like any other table, matching the
  * plugin's dataset-returning shape.
  */
final class Workunits(spark: SparkSession) {

  final case class WuRecord(wuid: String, name: String, owner: String,
      state: String, startMs: Long, endMs: Long, rows: Long,
      filesRead: Seq[String], messages: Seq[String])

  private val runs =
    scala.collection.concurrent.TrieMap.empty[String, WuRecord]
  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Paths the executed plan actually scanned (wsWorkunitFilesRead). */
  private def scannedPaths(df: DataFrame): Seq[String] = {
    def leaves(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
      case other => other +: other.children.flatMap(leaves)
    }
    leaves(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten.distinct.sorted
  }

  /** Execute a query as a workunit: runs `body`, counts the result, and
    * records timing + scanned files. Failures record a `failed` workunit
    * and rethrow (the reference keeps failed workunits inspectable).
    */
  def record(name: String, owner: String = "",
      messages: Seq[String] = Nil)(body: => DataFrame): String = {
    val wuid = f"W${seq.incrementAndGet()}%08d"
    val start = System.currentTimeMillis()
    try {
      val df = body
      val rows = df.count()
      runs(wuid) = WuRecord(wuid, name, owner, "completed", start,
        System.currentTimeMillis(), rows, scannedPaths(df), messages)
      wuid
    } catch {
      case t: Throwable =>
        runs(wuid) = WuRecord(wuid, name, owner, "failed", start,
          System.currentTimeMillis(), -1L, Nil,
          messages :+ String.valueOf(t.getMessage))
        throw t
    }
  }

  /** wsWorkunitExists. */
  def workunitExists(wuid: String): Boolean = runs.contains(wuid)

  /** Append a message to a recorded workunit — the write path behind
    * Std.System.Log's addWorkunitInformation/Warning/Error
    * ([[SystemInfo.Log.addWorkunitMessage]]). False when the wuid is
    * unknown (audit the miss, don't throw — the reference's services
    * return success flags).
    */
  def addMessage(wuid: String, severity: String, text: String,
      code: Int = 0): Boolean =
    runs.get(wuid) match {
      case Some(r) =>
        runs(wuid) = r.copy(messages = r.messages :+ s"$severity ($code): $text")
        true
      case None => false
    }

  /** wsWorkunitList with wildcard filters on name/owner/state
    * (lowerwuid/upperwuid analog: the id range).
    */
  def workunitList(namePattern: String = "*", ownerPattern: String = "*",
      statePattern: String = "*"): DataFrame = {
    import spark.implicits._
    import graft.workflow.Events.wildcardMatch
    runs.values.toSeq
      .filter(r => wildcardMatch(namePattern, r.name) &&
        wildcardMatch(ownerPattern, r.owner) &&
        wildcardMatch(statePattern, r.state))
      .sortBy(_.wuid)
      .map(r => (r.wuid, r.name, r.owner, r.state, r.startMs, r.endMs,
        r.endMs - r.startMs, r.rows))
      .toDF("wuid", "name", "owner", "state", "start_ms", "end_ms",
        "elapsed_ms", "rows")
  }

  /** wsWorkunitTimeStamps: one row per timing edge of a workunit. */
  def workunitTimeStamps(wuid: String): DataFrame = {
    import spark.implicits._
    runs.get(wuid).toSeq
      .flatMap(r => Seq((r.wuid, "started", r.startMs),
        (r.wuid, "finished", r.endMs)))
      .toDF("wuid", "event", "ts_ms")
  }

  /** wsWorkunitFilesRead: the parquet locations the plan scanned. */
  def workunitFilesRead(wuid: String): DataFrame = {
    import spark.implicits._
    runs.get(wuid).toSeq.flatMap(r => r.filesRead.map((r.wuid, _)))
      .toDF("wuid", "path")
  }

  /** wsWorkunitMessages. */
  def workunitMessages(wuid: String): DataFrame = {
    import spark.implicits._
    runs.get(wuid).toSeq.flatMap(r => r.messages.map((r.wuid, _)))
      .toDF("wuid", "message")
  }
}

package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Std.Audit (reference `ecllibrary/std/Audit.ecl:20` —
  * `lib_auditlib.AuditData`): write an audit entry, return true on
  * success. The reference writes to the OS event/system log; the
  * Spark-native analog is an append-only JSONL audit stream under a
  * configurable root (what a cluster's log aggregator ingests), one line
  * per event: epoch millis, type, message, base64 payload. `read`
  * surfaces the stream as a DataFrame so audit trails compose with the
  * engine like any other table.
  */
object Audit {

  /** The reference's audit_type vocabulary (Audit.ecl:15). */
  val Types: Set[String] = Set("DEBUG", "INFO", "ERROR",
    "ACCESS_FAILURE", "ACCESS_SUCCESS", "AUDIT_LOG_FAILURE")

  private def esc(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c    => c.toString
    }

  /** Append one audit entry; true iff durably written. Unknown types fail
    * loudly (the reference's enum is closed); write failures are FALSE,
    * not exceptions — audit failure must not fail the job (the reference
    * even has a type for it: AUDIT_LOG_FAILURE).
    */
  def audit(root: String, auditType: String, msg: String,
      data: Array[Byte] = Array.emptyByteArray): Boolean = {
    require(Types(auditType), s"unknown audit type: $auditType")
    val line = s"""{"at":${System.currentTimeMillis()},""" +
      s""""audit_type":"${esc(auditType)}","msg":"${esc(msg)}",""" +
      s""""data":"${java.util.Base64.getEncoder.encodeToString(data)}"}""" +
      "\n"
    try {
      val dir = java.nio.file.Paths.get(root)
      java.nio.file.Files.createDirectories(dir)
      synchronized {
        java.nio.file.Files.write(dir.resolve("audit.jsonl"),
          line.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      }
      true
    } catch { case _: java.io.IOException => false }
  }

  /** The audit trail as a DataFrame (at, audit_type, msg, data). An
    * empty trail (nothing audited yet) is an empty frame with the same
    * schema, not an error. Note [[audit]] serializes appends per-JVM
    * only — the driver is the intended writer; executor-side callers in
    * separate JVMs would interleave at OS append granularity.
    */
  def read(spark: SparkSession, root: String): DataFrame = {
    val schema = "at LONG, audit_type STRING, msg STRING, data STRING"
    val path = java.nio.file.Paths.get(root, "audit.jsonl")
    if (!java.nio.file.Files.exists(path))
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(schema))
    else spark.read.schema(schema).json(path.toString)
  }
}

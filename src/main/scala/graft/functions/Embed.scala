package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** EMBED(python) — the reference's foreign-language embedding surface
  * (`plugins/py3embed/py3embed.cpp`; the engine-side contract is
  * `IEmbedFunctionContext`, `rtl/eclrtl/eclrtl.hpp:864`), re-expressed
  * Spark-first.
  *
  * The reference binds an in-process CPython interpreter per engine
  * thread. A JVM has no such bridge in this environment, so the engine
  * ships the STREAMED form instead: rows cross the process boundary as
  * JSON lines through ONE long-lived `python3` worker per partition —
  * exactly the scale shape of PIPE (`TAKpipethrough`): O(rows) streaming,
  * no driver involvement, no shuffle, and the subprocess count is bounded
  * by the partition count, never the row count. This matches py3embed's
  * dataset-valued EMBED calls (STREAMED/dataset return,
  * `py3embed.cpp` result-iterator path); a naive per-row scalar EMBED
  * would round-trip the boundary once per row — the wrong shape at
  * 100 TB — so scalar embeds lower onto the same whole-dataset transform
  * and return a column of the declared output schema.
  */
object Embed {

  /** Run a Python row transform over every row of `df`.
    *
    * `pyBody` must define `transform(row: dict) -> dict | None` at top
    * level (plus any helpers/imports it needs). Each input row arrives as
    * a dict keyed by column name; returning a dict emits one output row,
    * returning None drops the row (the ECL SKIP analog). `out` is the
    * DECLARED result schema — schema-on-read stays declared, never
    * inferred (SURVEY §1.1), so a transform emitting the wrong shape
    * surfaces as nulls at the gate instead of silently reshaping the
    * relation.
    *
    * JSON is the interchange (the same framing py3embed uses for nested
    * datasets); binary columns would base64 through it. Worker stdout is
    * block-buffered and flushed by process exit at partition end, so the
    * boundary costs one pipe write per row, not one syscall per row.
    */
  def python(df: DataFrame, pyBody: String, out: StructType): DataFrame = {
    val harness =
      "import sys, json\n" +
        pyBody.stripMargin + "\n" +
        """|for _line in sys.stdin:
           |    _line = _line.strip()
           |    if not _line:
           |        continue
           |    _r = transform(json.loads(_line))
           |    if _r is not None:
           |        sys.stdout.write(json.dumps(_r))
           |        sys.stdout.write("\n")
           |""".stripMargin
    import df.sparkSession.implicits._
    // Both pipe directions are forced to pure ASCII so no platform/locale
    // charset can corrupt the boundary: outgoing JSON escapes every
    // non-ASCII UTF-16 unit to \uXXXX (valid JSON, surrogate pairs
    // included); python's json.dumps already emits \uXXXX (ensure_ascii
    // is its default), so the return path is ASCII by construction.
    // to_json with ignoreNullFields=false (not df.toJSON, which drops
    // null-valued fields): the documented contract says rows arrive as a
    // dict keyed by EVERY column name, so a transform doing row["col"] on
    // nullable data must see None, not raise KeyError.
    val jsonCol = org.apache.spark.sql.functions.to_json(
      org.apache.spark.sql.functions.struct(df.columns.map(df.col).toSeq: _*),
      java.util.Collections.singletonMap("ignoreNullFields", "false"))
    // one python worker per PARTITION: a small input (one parquet split)
    // would otherwise stream every row through a single worker while the
    // other cores idle — fan out to the session's parallelism first when
    // the scan is under-parallel (row-to-worker assignment is irrelevant
    // to the per-row transform, so results are unchanged). Scale-adaptive:
    // inputs already at/above core count keep their partitioning.
    val par = df.sparkSession.sparkContext.defaultParallelism
    val dfp = if (df.rdd.getNumPartitions < par) df.repartition(par) else df
    val lines = dfp.select(jsonCol.as("j")).as[String].rdd.map(asciiJson)
      // Seq-form pipe: no shell, no quoting hazards on the inline source
      .pipe(Seq("python3", "-c", harness))
    df.sparkSession.read.schema(out).json(lines.toDS())
  }

  /** Escape non-ASCII (and raw control) chars in a JSON line to \uXXXX.
    * toJSON output has only ASCII structure chars outside strings, so a
    * blanket per-char escape can only land inside string values, where
    * it is valid JSON.
    */
  private def asciiJson(s: String): String = {
    var i = 0
    var clean = true
    while (clean && i < s.length) {
      val c = s.charAt(i)
      if (c < 0x20 || c > 0x7e) clean = false else i += 1
    }
    if (clean) s
    else {
      val sb = new java.lang.StringBuilder(s.length + 16)
      i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c >= 0x20 && c <= 0x7e) sb.append(c)
        else sb.append(f"\\u${c.toInt}%04x")
        i += 1
      }
      sb.toString
    }
  }
}

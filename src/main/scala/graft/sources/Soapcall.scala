package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** SOAPCALL / HTTPCALL (SURVEY §2.10; TAKsoap_* `rtl/include/eclhelper.hpp
  * :2271` region; engine-common `common/thorhelper/thorsoapcall.cpp`):
  * per-row web-service calls from inside the dataflow, with bounded
  * parallelism, retry, and timeout — the reference's `WSCMode {SCrow,
  * SCdataset}` (`thorsoapcall.hpp:66`).
  *
  * Spark-first shape: `mapPartitions` with a bounded in-partition request
  * pool — the executor-side analog of the reference's parallel workers.
  * The transport is pluggable (and must be a serializable function) so
  * tests inject a deterministic stub; production passes a real HTTP client
  * factory. This container has zero egress — only the stub path is
  * exercised here.
  */
object Soapcall {

  /** One request: (url, payload) → response body. Implementations must be
    * serializable (constructed per executor, not captured state).
    */
  type Transport = (String, String) => String

  final case class Config(
      url: String,
      parallelism: Int = 4,
      retries: Int = 2,
      timeoutMs: Long = 30000)

  /** A REAL transport: POST the payload, return the response body. Plain
    * `HttpURLConnection` — no new dependencies, serializable (captures
    * only primitives), connection keep-alive via the JDK cache. Non-2xx
    * responses throw (feeding [[callPerRow]]'s retry/backoff), as do
    * connect/read timeouts — these bound each ATTEMPT below the pool's
    * own per-attempt deadline so a hung socket is surfaced as a retryable
    * failure, not a zombie worker.
    */
  def httpTransport(
      contentType: String = "application/x-www-form-urlencoded",
      connectTimeoutMs: Int = 5000,
      readTimeoutMs: Int = 25000): Transport = (url, payload) => {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setRequestMethod("POST")
    conn.setRequestProperty("Content-Type", contentType)
    conn.setDoOutput(true)
    val os = conn.getOutputStream
    try os.write(payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body =
      if (is == null) ""
      else try scala.io.Source.fromInputStream(is, "UTF-8").mkString
      finally is.close()
    if (code >= 400)
      throw new java.io.IOException(s"HTTP $code from $url: ${body.take(200)}")
    body
  }

  /** SOAPCALL(ds, url, svc, t) dataset→dataset: each row's `payload` column
    * is POSTed; the response lands in `responseCol`.
    *
    * Scale/robustness contract:
    *  - BOUNDED in-flight window: at most `cfg.parallelism` requests ahead
    *    of the consumer (never the whole partition buffered);
    *  - the pool is owned by the TASK (`TaskContext` completion listener),
    *    so a downstream `limit()` that stops consuming cannot leak threads;
    *  - `cfg.timeoutMs` bounds each ATTEMPT; retries each get a fresh
    *    deadline plus backoff (the reference's per-call timeout semantics,
    *    `thorsoapcall.cpp` WSCMode workers).
    */
  def callPerRow(df: DataFrame, cfg: Config, payloadCol: String,
      responseCol: String)(transport: Transport): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(responseCol, StringType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      import java.util.concurrent.{Callable, ExecutionException, Future => JFuture, TimeUnit}
      val pool = java.util.concurrent.Executors.newFixedThreadPool(cfg.parallelism)
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))

      def oneAttempt(payload: String): JFuture[String] =
        pool.submit(new Callable[String] {
          def call(): String = transport(cfg.url, payload)
        })
      // happy path is pipelined (first attempt pre-submitted); retries run
      // on the consumer thread with a fresh per-attempt deadline. A failed
      // or timed-out attempt is cancel(true)'d so a hung transport call is
      // interrupted and its pool thread freed — otherwise a few dead
      // endpoints would turn every worker into a zombie and starve retries
      // out of their own deadline while queued.
      def awaitWithRetry(payload: String, first: JFuture[String]): String = {
        var f = first
        var attempt = 0
        while (attempt < Int.MaxValue) {
          try return f.get(cfg.timeoutMs, TimeUnit.MILLISECONDS)
          catch { case t: Throwable =>
            f.cancel(true)
            if (attempt >= cfg.retries) throw (t match {
              case e: ExecutionException if e.getCause != null => e.getCause
              case e => e
            })
            attempt += 1
            Thread.sleep(math.min(250L << attempt, 4000L))
            f = oneAttempt(payload)
          }
        }
        throw new IllegalStateException("unreachable")
      }

      val inflight =
        scala.collection.mutable.Queue.empty[(Row, String, JFuture[String])]
      new Iterator[Row] {
        private def fill(): Unit =
          while (inflight.size < cfg.parallelism && rows.hasNext) {
            val r = rows.next()
            val p = r.getString(payloadIdx)
            inflight.enqueue((r, p, oneAttempt(p)))
          }
        def hasNext: Boolean = { fill(); inflight.nonEmpty }
        def next(): Row = {
          fill()
          val (r, p, f) = inflight.dequeue()
          Row.fromSeq(r.toSeq :+ awaitWithRetry(p, f))
        }
      }
    }(Encoders.row(outSchema))
  }
}

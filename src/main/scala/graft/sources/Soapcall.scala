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

  /** SOAPCALL(ds, url, svc, t) dataset→dataset: each row's `payload` column
    * is POSTed; the response lands in `responseCol`. Retries with backoff;
    * per-partition parallelism is bounded by a work queue (not one thread
    * per row).
    */
  def callPerRow(df: DataFrame, cfg: Config, payloadCol: String,
      responseCol: String)(transport: Transport): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(responseCol, StringType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      val pool = java.util.concurrent.Executors.newFixedThreadPool(cfg.parallelism)
      implicit val ec = scala.concurrent.ExecutionContext.fromExecutor(pool)
      val futures = rows.map { r =>
        val payload = r.getString(payloadIdx)
        (r, scala.concurrent.Future {
          var attempt = 0
          var result: String = null
          var lastErr: Throwable = null
          while (result == null && attempt <= cfg.retries) {
            try result = transport(cfg.url, payload)
            catch { case t: Throwable => lastErr = t; attempt += 1
              Thread.sleep(math.min(1000L << attempt, 8000L)) }
          }
          if (result == null) throw lastErr
          result
        })
      }.toVector // materialize to submit all work before awaiting
      val out = futures.iterator.map { case (r, f) =>
        val resp = scala.concurrent.Await.result(f,
          scala.concurrent.duration.Duration(cfg.timeoutMs, "ms"))
        Row.fromSeq(r.toSeq :+ resp)
      }
      new Iterator[Row] {
        def hasNext: Boolean = { val h = out.hasNext; if (!h) pool.shutdown(); h }
        def next(): Row = out.next()
      }
    }(Encoders.row(outSchema))
  }
}

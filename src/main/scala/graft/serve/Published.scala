package graft.serve

import graft.workflow.Workflow.Stored
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Published parameterized queries — the capability shape of Roxie's
  * pub/sub serving layer (SURVEY §3 entry point 3: queries are compiled,
  * published under a name, then invoked with parameters over SOAP/JSON;
  * `roxie/ccd/ccdprotocol.cpp:565-614`). Spark-side: a registry of
  * pre-built plan factories over a long-running SparkSession; a thin HTTP
  * front end would call [[run]]. STORED parameters (`no_stored`) arrive as
  * the `Stored` map exactly like Roxie request parameters.
  */
final class Published(spark: SparkSession) {

  private val registry =
    scala.collection.concurrent.TrieMap.empty[String, (SparkSession, Stored) => DataFrame]

  /** Publish a query under a name (idempotent redeploy like Roxie). */
  def publish(name: String)(fn: (SparkSession, Stored) => DataFrame): Unit =
    registry.put(name, fn)

  def unpublish(name: String): Unit = registry.remove(name)

  def list: Seq[String] = registry.keys.toSeq.sorted

  /** Invoke a published query with request parameters. */
  def run(name: String, params: Map[String, String] = Map.empty): DataFrame =
    registry.get(name) match {
      case Some(fn) => fn(spark, Stored(params))
      case None => throw new NoSuchElementException(s"query not published: $name")
    }

  // ---- HTTP/JSON protocol endpoint (ccdprotocol.cpp:565-614 JSON shape) --

  private var server: Option[com.sun.net.httpserver.HttpServer] = None

  /** Serve the registry over HTTP — the Roxie listener analog
    * (`roxie/ccd/ccdlistener.cpp` accept loop; JSON response envelope per
    * `ccdprotocol.cpp` `<query>Response/Results`). JDK built-in server, no
    * new dependencies:
    *
    *  - `GET /queries`                 → published names (JSON array)
    *  - `GET /query/<name>?p=v&…`      → run with STORED params, rows as
    *    `{"<name>Response":{"Results":{"rowCount":N,"rows":[…]}}}`
    *
    * `maxRows` caps the driver-side collect — a serving endpoint returns
    * answer-sized results (Roxie's mindset), not exports; bigger results
    * belong in OUTPUT/superfiles. Returns the bound port (pass 0 for an
    * ephemeral one).
    */
  def serve(port: Int = 0, maxRows: Int = 10000): Int = synchronized {
    require(server.isEmpty, "already serving")
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", port), 0)
    def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int,
        body: String): Unit = {
      val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length.toLong)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }
    def jsonStr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    srv.createContext("/queries",
      (ex: com.sun.net.httpserver.HttpExchange) =>
        respond(ex, 200, list.map(jsonStr).mkString("[", ",", "]")))
    srv.createContext("/query/",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val name = ex.getRequestURI.getPath.stripPrefix("/query/")
        val params = Option(ex.getRequestURI.getRawQuery).getOrElse("")
          .split('&').filter(_.contains('=')).map { kv =>
            val Array(k, v) = kv.split("=", 2)
            java.net.URLDecoder.decode(k, "UTF-8") ->
              java.net.URLDecoder.decode(v, "UTF-8")
          }.toMap
        try {
          // toJSON keeps the row serialization distributed; only the
          // capped, answer-sized strings reach the driver
          val rows = run(name, params).toJSON.take(maxRows)
          respond(ex, 200,
            s"""{${jsonStr(name + "Response")}:{"Results":{"rowCount":${rows.length},"rows":[${rows.mkString(",")}]}}}""")
        } catch {
          case _: NoSuchElementException =>
            respond(ex, 404, s"""{"error":${jsonStr(s"query not published: $name")}}""")
          case t: Throwable =>
            respond(ex, 500, s"""{"error":${jsonStr(String.valueOf(t.getMessage))}}""")
        }
      })
    srv.start()
    server = Some(srv)
    srv.getAddress.getPort
  }

  /** Stop the listener (published queries stay registered). */
  def stopServing(): Unit = synchronized {
    server.foreach(_.stop(0))
    server = None
  }
}

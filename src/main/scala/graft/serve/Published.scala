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
}

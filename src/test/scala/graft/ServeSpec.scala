package graft

import graft.agg.Aggregators
import graft.serve.Published
import org.apache.spark.sql.functions._

class ServeSpec extends SparkSpec {
  import spark.implicits._

  test("published queries: publish / run with STORED params / unpublish") {
    val pub = new Published(spark)
    pub.publish("top_customers") { (s, params) =>
      val n = params.long("limit", 3)
      Tables.customer(s, sf).orderBy(col("c_acctbal").desc).limit(n.toInt)
    }
    assert(pub.list == Seq("top_customers"))
    assert(pub.run("top_customers").count() == 3)
    assert(pub.run("top_customers", Map("limit" -> "7")).count() == 7)
    pub.unpublish("top_customers")
    intercept[NoSuchElementException] { pub.run("top_customers") }
  }

  test("WeightedAvgMicros matches the closed-form ratio exactly") {
    val df = Seq((10L, 2L), (30L, 4L), (20L, 4L)).toDF("pq", "q")
    val wavg = udaf(Aggregators.WeightedAvgMicros)
    val got = df.agg(wavg(col("pq"), col("q"))).head.getDouble(0)
    assert(got == 60.0 / 10.0)
  }

  test("BestByScore keeps the max-score id with deterministic ties") {
    val df = Seq((1.0, 5L), (3.0, 9L), (3.0, 2L), (2.0, 1L)).toDF("s", "id")
    val best = udaf(Aggregators.BestByScore)
    val got = df.agg(best(col("s"), col("id"))).head.getLong(0)
    assert(got == 2L) // score tie at 3.0 → smaller id wins
  }
}

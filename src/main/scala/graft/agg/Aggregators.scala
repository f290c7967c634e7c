package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed user aggregates (SURVEY §2.5, §2.11 UDAF surface). The reference's
  * aggregate contract `IHThorRowAggregator`
  * (`rtl/include/eclhelper.hpp:1549`: clearAggregate / processFirst /
  * processNext / mergeAggregate) maps 1:1 onto Spark's
  * `Aggregator[IN, BUF, OUT]`: zero ↔ clearAggregate, reduce ↔
  * processFirst/processNext, merge ↔ mergeAggregate, finish ↔ result
  * extraction — both are partial+final two-phase aggregation with map-side
  * combine.
  */
object Aggregators {

  /** Weighted average over exact integer micro-units: inputs are
    * (value·weight, weight) both pre-scaled to 1e-6 units (long), so the
    * aggregation is exact and order-independent; the single final division
    * happens in double. ECL analog: `SUM(w*x)/SUM(w)` via TRANSFORM
    * AGGREGATE.
    */
  object WeightedAvgMicros
      extends Aggregator[(Long, Long), (Long, Long), Double] {
    def zero: (Long, Long) = (0L, 0L)                       // clearAggregate
    def reduce(b: (Long, Long), in: (Long, Long)): (Long, Long) =
      (b._1 + in._1, b._2 + in._2)                          // processFirst/Next
    def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (a._1 + b._1, b._2 + a._2)                            // mergeAggregate
    def finish(b: (Long, Long)): Double =
      if (b._2 == 0) Double.NaN else b._1.toDouble / b._2.toDouble
    def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(
      Encoders.scalaLong, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** DEDUP BEST as an aggregate (HDFkeepbest :1532): keeps the (score, id)
    * pair with the highest score, ties broken by the smaller id.
    */
  object BestByScore
      extends Aggregator[(Double, Long), (Double, Long), Long] {
    def zero: (Double, Long) = (Double.NegativeInfinity, Long.MaxValue)
    def reduce(b: (Double, Long), in: (Double, Long)): (Double, Long) =
      merge(b, in)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      if (a._1 > b._1 || (a._1 == b._1 && a._2 <= b._2)) a else b
    def finish(b: (Double, Long)): Long = b._2
    def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(
      Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}

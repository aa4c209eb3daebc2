package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom aggregates (SURVEY.md §2.2k): the reference reaches UDAFs through
  * pandas GROUPED_AGG; the Spark-native equivalent is a typed `Aggregator`
  * registered with `functions.udaf` — codegen-adjacent, partial-aggregating
  * (map-side combine), and usable in any `agg(...)`. */
object Udafs {

  /** Weighted mean: sum(v*w)/sum(w), null on zero weight. Partial buffers
    * merge associatively so the aggregation stays one shuffle. */
  object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    override def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
      (b1._1 + b2._1, b1._2 + b2._2)
    override def finish(r: (Double, Double)): Double =
      if (r._2 == 0.0) Double.NaN else r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** `weighted_mean(value, weight)` as a Column function. */
  def weightedMean(value: Column, weight: Column): Column =
    udaf(WeightedMean).apply(value, weight)
}

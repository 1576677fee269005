package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** C06 — custom typed UDAF (SURVEY.md §2.4): product-aggregate computed in
  * log space, `exp(Σ ln x)`, so a 100 TB product of millions of factors
  * neither overflows nor underflows. The buffer is a single Double (the
  * running log-sum), so partial aggregation / map-side combine works exactly
  * like any built-in sum: merge = addition, commutative + associative.
  *
  * Hash-match contract: the declared query Q17b applies this Aggregator in
  * Spark while the DuckDB oracle computes the pure-SQL twin
  * `EXP(SUM(LN(x)))` — results must agree after ROUND(..., 4).
  */
object LogProduct extends Aggregator[Double, Double, Double] {
  def zero: Double = 0.0
  def reduce(b: Double, x: Double): Double = b + math.log(x)
  def merge(b1: Double, b2: Double): Double = b1 + b2
  def finish(b: Double): Double = math.exp(b)
  def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

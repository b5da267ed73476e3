package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2B "UDF/UDAF/UDTF"): weighted average
  * with exact decimal accumulation.
  *
  * The buffer keeps Σ(value·weight) and Σ(weight) as BigDecimal, so the
  * merge is associative+commutative over exact values — partition order
  * cannot change the result (the same determinism discipline as
  * graft.util.Det). Registered with `functions.udaf` so it is callable
  * from both the Dataset API and SQL.
  */
object WeightedAvg
  extends Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] {

  private def d2(x: Double): BigDecimal =
    BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)

  override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))

  override def reduce(b: (BigDecimal, BigDecimal),
                      in: (Double, Double)): (BigDecimal, BigDecimal) =
    (b._1 + d2(in._1) * d2(in._2), b._2 + d2(in._2))

  override def merge(x: (BigDecimal, BigDecimal),
                     y: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
    (x._1 + y._1, x._2 + y._2)

  /** Exact sums → double, divide in double — mirrors the oracle's
    * `CAST(SUM(..) AS DOUBLE) / CAST(SUM(..) AS DOUBLE)` bit-for-bit. */
  override def finish(b: (BigDecimal, BigDecimal)): Double =
    if (b._2.signum == 0) Double.NaN else b._1.toDouble / b._2.toDouble

  override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
    Encoders.product[(BigDecimal, BigDecimal)]

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

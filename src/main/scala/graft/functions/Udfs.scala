package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** User-defined aggregation (SURVEY.md §2.2 "UDF/UDAF/UDTF"): a typed
  * `Aggregator` registered via `functions.udaf`.
  *
  * Population variance with decimal-exact accumulation: inputs are rounded
  * to fixed decimal scales exactly like the SQL oracle's casts, sums are
  * exact (order-independent across partitions — the property a plain
  * double-sum UDAF would NOT have), and only the final variance formula
  * runs in double. Cross-engine bit-exact.
  */
object Udfs {

  case class VarBuf(n: Long, sum: BigDecimal, sumsq: BigDecimal)

  /** var_pop(x) = (Σx² − (Σx)²/n) / n with exact decimal sums. */
  object DecimalVarPop extends Aggregator[Double, VarBuf, Double] {
    override def zero: VarBuf = VarBuf(0L, BigDecimal(0), BigDecimal(0))

    override def reduce(b: VarBuf, x: Double): VarBuf = VarBuf(
      b.n + 1,
      b.sum + BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP),
      b.sumsq + BigDecimal(x * x).setScale(6, BigDecimal.RoundingMode.HALF_UP))

    override def merge(a: VarBuf, b: VarBuf): VarBuf =
      VarBuf(a.n + b.n, a.sum + b.sum, a.sumsq + b.sumsq)

    override def finish(b: VarBuf): Double =
      if (b.n == 0) 0.0
      else (b.sumsq.toDouble - (b.sum.toDouble * b.sum.toDouble) / b.n) / b.n

    override def bufferEncoder: Encoder[VarBuf] = Encoders.product[VarBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Scalar UDF demo (coverage): balance banding. Prefer built-in
    * functions / native expressions in hot paths — this exists to cover
    * the `udf()` registration surface with semantics a SQL CASE mirrors. */
  val balanceBand: Double => String = bal =>
    if (bal < 0) "negative"
    else if (bal < 5000) "low"
    else "high"
}

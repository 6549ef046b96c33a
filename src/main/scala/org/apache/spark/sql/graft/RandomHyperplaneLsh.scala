package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Multi-table random-hyperplane LSH buckets of an `array<double>` vector:
  * one packed sign-bit bucket per table, hyperplane component (p, j) drawn
  * deterministically from XXH64. Returns `array<long>` of length `tables`.
  *
  * Replaces the HOF formulation (interpreted lambda per element × plane —
  * the whole vector × plane product ran through the lambda interpreter).
  * Per-row CodegenFallback; the inner loops are plain JVM arithmetic.
  */
case class RandomHyperplaneLsh(child: Expression, tables: Int,
    bitsPerTable: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(tables * bitsPerTable <= 63, "total planes must fit a long")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rp_lsh_buckets"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bitsPerTable) {
        val p = t * bitsPerTable + b
        var d = 0.0
        var j = 0
        while (j < n) {
          // component (p, j) of plane p: uniform in [-1, 1], deterministic
          val h = XXH64.hashLong(p.toLong << 32 | j, seed)
          val u = ((h % 1000001L + 1000001L) % 1000001L).toDouble / 500000.0 - 1.0
          d += v.getDouble(j) * u
          j += 1
        }
        if (d >= 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): RandomHyperplaneLsh =
    copy(child = newChild)
}

object RandomHyperplaneLsh {
  def apply(v: Column, tables: Int, bitsPerTable: Int, seed: Long = 42L): Column =
    ExpressionUtils.column(new RandomHyperplaneLsh(
      ExpressionUtils.expression(v), tables, bitsPerTable, seed))
}

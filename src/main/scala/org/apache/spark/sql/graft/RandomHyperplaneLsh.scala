package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Multi-table random-hyperplane LSH keys of an `array<double>` vector,
  * emitted ready for `explode` + equi-join: an `array<long>` of packed
  * `(table << bitsPerTable) | bucket` keys — a primitive array (no struct
  * allocation on the 10⁶-row explode path) joining on ONE long column.
  *
  * Each table packs `bitsPerTable` sign bits against deterministic
  * pseudo-random hyperplanes (component (p, j) drawn from XXH64, uniform in
  * [-1, 1]). With `probeRadius = 0` the array has one entry per table (the
  * vector's own bucket). With `probeRadius = 1` it additionally contains
  * every bucket at Hamming distance 1 (each single sign bit flipped) —
  * multi-probe LSH: joining a radius-1 probe side against a radius-0 index
  * side makes a pair a candidate iff some table's signatures differ in at
  * most one bit, which multiplies per-table collision probability by
  * ~(1 + b·(1-p)/p) while the random-pair rate only grows (b+1)·2^-b —
  * a strictly better recall/candidate trade than adding tables.
  *
  * Replaces the HOF formulation (interpreted lambda per element × plane).
  * Per-row CodegenFallback; the inner loops are plain JVM arithmetic.
  */
case class RandomHyperplaneLshProbes(child: Expression, tables: Int,
    bitsPerTable: Int, seed: Long, probeRadius: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(bitsPerTable >= 1 &&
    bitsPerTable + (64 - java.lang.Long.numberOfLeadingZeros(tables - 1L)) <= 63,
    "packed table|bucket key must fit a long")
  require(probeRadius == 0 || probeRadius == 1, "only radius 0/1 supported")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rp_lsh_probes"

  // Hyperplane components are row-independent — materialize the whole
  // (tables·bits) × dim matrix once per task on first eval (the per-row
  // XXH64 recomputation was ~100× the dot-product cost). Published as one
  // immutable holder through a volatile field: a cross-thread reader sees
  // null or a fully-built matrix, never a partial one (value-identical
  // rebuilds are harmless).
  private final class Planes(val dim: Int, val m: Array[Double])
  @transient @volatile private var planesCache: Planes = _

  private def planesFor(n: Int): Array[Double] = {
    val cached = planesCache
    if (cached != null && cached.dim == n) return cached.m
    val nPlanes = tables * bitsPerTable
    val m = new Array[Double](nPlanes * n)
    var p = 0
    while (p < nPlanes) {
      var j = 0
      while (j < n) {
        // component (p, j) of plane p: uniform in [-1, 1], deterministic
        val h = XXH64.hashLong(p.toLong << 32 | j, seed)
        m(p * n + j) = ((h % 1000001L + 1000001L) % 1000001L).toDouble / 500000.0 - 1.0
        j += 1
      }
      p += 1
    }
    planesCache = new Planes(n, m)
    m
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val vec = v.toDoubleArray()
    val m = planesFor(n)
    val perTable = if (probeRadius == 0) 1 else bitsPerTable + 1
    val out = new Array[Long](tables * perTable)
    var t = 0
    var o = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bitsPerTable) {
        val base = (t * bitsPerTable + b) * n
        var d = 0.0
        var j = 0
        while (j < n) {
          d += vec(j) * m(base + j)
          j += 1
        }
        if (d >= 0) bucket |= (1L << b)
        b += 1
      }
      val packed = t.toLong << bitsPerTable
      out(o) = packed | bucket; o += 1
      if (probeRadius == 1) {
        var f = 0
        while (f < bitsPerTable) {
          out(o) = packed | (bucket ^ (1L << f)); o += 1
          f += 1
        }
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): RandomHyperplaneLshProbes =
    copy(child = newChild)
}

object RandomHyperplaneLshProbes {
  def apply(v: Column, tables: Int, bitsPerTable: Int, seed: Long,
      probeRadius: Int): Column =
    ExpressionUtils.column(new RandomHyperplaneLshProbes(
      ExpressionUtils.expression(v), tables, bitsPerTable, seed, probeRadius))
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** The `nprobe` nearest coarse-quantizer cells of an `array<double>`
  * vector, by cosine similarity against a FOLDABLE codebook
  * (`array<array<double>>`): returns the 0-based codebook positions,
  * nearest first (ties broken toward the lower position).
  *
  * This is the IVF assignment step as a pure per-row map: the codebook is
  * a trained model of k·dim doubles — independent of corpus size — so it
  * rides into every task as a literal, and cell assignment adds NO
  * exchange, NO row amplification, and no window to the plan (the
  * crossJoin(corpus × k) + row_number() formulation this replaces
  * shuffled corpus×k rows just to pick each row's argmax).
  *
  * Cell norms are precomputed once per task; the per-row score is
  * dot(v, cell)/|cell| — |v| > 0 scales every cell equally and is skipped.
  */
case class NearestCells(left: Expression, right: Expression, nprobe: Int)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  require(nprobe >= 1, "nprobe must be >= 1")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override def checkInputDataTypes() = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (!right.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "codebook must be foldable (a literal model, not a column)")
    else base
  }

  // materialized codebook + norms, built once per task from the literal.
  // Published as one immutable holder through a volatile field: even if an
  // instance were shared across threads, a reader sees either null or a
  // fully-built pair (value-identical rebuilds are harmless).
  private final class Codebook(val cells: Array[Array[Double]],
      val invNorms: Array[Double])
  @transient @volatile private var codebookCache: Codebook = _

  private def ensureCodebook(codebook: Any): Codebook = {
    val cached = codebookCache
    if (cached != null) return cached
    val arr = codebook.asInstanceOf[ArrayData]
    val k = arr.numElements()
    val cs = new Array[Array[Double]](k)
    val ns = new Array[Double](k)
    var i = 0
    while (i < k) {
      val c = arr.getArray(i).toDoubleArray()
      var s = 0.0
      var j = 0
      while (j < c.length) { s += c(j) * c(j); j += 1 }
      cs(i) = c
      ns(i) = if (s > 0) 1.0 / math.sqrt(s) else 0.0
      i += 1
    }
    val built = new Codebook(cs, ns)
    codebookCache = built
    built
  }

  override protected def nullSafeEval(vecAny: Any, codebook: Any): Any = {
    val cb = ensureCodebook(codebook)
    val cells = cb.cells
    val invNorms = cb.invNorms
    val v = vecAny.asInstanceOf[ArrayData].toDoubleArray()
    val k = cells.length
    val n = math.min(nprobe, k)
    // scores, then a tiny selection of the top-n positions (k is small —
    // a coarse quantizer has thousands of cells at most)
    val scores = new Array[Double](k)
    var i = 0
    while (i < k) {
      val c = cells(i)
      val m = math.min(v.length, c.length)
      var d = 0.0
      var j = 0
      while (j < m) { d += v(j) * c(j); j += 1 }
      scores(i) = d * invNorms(i)
      i += 1
    }
    val out = new Array[Int](n)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < n) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      i = 0
      while (i < k) {
        // `best == -1` seeds with the first untaken index, so NaN scores
        // (every comparison false) can never leave best at -1 — the
        // selection stays total and deterministic on adversarial input
        if (!taken(i) && (best == -1 || scores(i) > bestScore)) {
          best = i; bestScore = scores(i)
        }
        i += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): NearestCells =
    copy(left = newLeft, right = newRight)
}

object NearestCells {
  def apply(vec: Column, codebook: Column, nprobe: Int): Column =
    ExpressionUtils.column(new NearestCells(
      ExpressionUtils.expression(vec), ExpressionUtils.expression(codebook), nprobe))
}

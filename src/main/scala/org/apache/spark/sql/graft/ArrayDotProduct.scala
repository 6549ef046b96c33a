package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expression: dot product of two `array<double>` columns.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) evaluate their
  * lambdas interpreted, which makes per-pair vector math the bottleneck of
  * any O(pairs) similarity operator. This expression generates a tight Java
  * loop instead (`doGenCode`), keeping the similarity operators inside
  * whole-stage codegen — the "custom `Expression` beats a UDF" rung of the
  * extension ladder (SURVEY.md §7).
  *
  * Nulls: null if either side is null (default BinaryExpression behavior);
  * mismatched lengths dot the common prefix, mirroring `zip_with`'s
  * null-padding semantics minus the null products.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ArrayDotProduct = copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  /** Column wrapper: inputs must already be `array<double>`. */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(new ArrayDotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Jaccard similarity of two SORTED, DISTINCT `array<string>` columns via a
  * single merge walk — no hash sets, no allocation per pair.
  *
  * `array_intersect` builds a hash set per invocation; at millions of
  * candidate pairs the per-pair garbage dominates near-dup verification.
  * The caller guarantees both inputs are sorted ascending and duplicate-free
  * (`sort_array(array_distinct(...))`) — exactly the canonical form the
  * dedup pipeline already keys groups by.
  */
case class SortedArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "sorted_array_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = nx + ny - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val cmp = ctx.freshName("cmp")
      val union = ctx.freshName("union")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0, $j = 0, $inter = 0;
         |while ($i < $nx && $j < $ny) {
         |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $inter++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |int $union = $nx + $ny - $inter;
         |${ev.value} = ($union == 0) ? 1.0 : ((double) $inter) / $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedArrayJaccard = copy(left = newLeft, right = newRight)
}

object SortedArrayJaccard {
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(new SortedArrayJaccard(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** Jaccard over SORTED, DISTINCT `array<long>` (hashed token sets from
  * [[TokenSetHashes]]): the merge walk compares 8-byte longs — no string
  * byte-walks — which is what makes verifying millions of LSH candidate
  * pairs cheap. Same contract as [[SortedArrayJaccard]] otherwise. */
case class SortedLongArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "sorted_long_array_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    val union = nx + ny - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val union = ctx.freshName("union")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0, $j = 0, $inter = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $inter++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |int $union = $nx + $ny - $inter;
         |${ev.value} = ($union == 0) ? 1.0 : ((double) $inter) / $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedLongArrayJaccard = copy(left = newLeft, right = newRight)
}

object SortedLongArrayJaccard {
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(new SortedLongArrayJaccard(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

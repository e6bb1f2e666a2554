package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two numeric arrays — the hot inner
  * loop of every cosine-similarity operator.
  *
  * Rationale (the custom-Expression tier of the extension ladder): the
  * declarative `aggregate(zip_with(a, b, _*_), 0.0, _+_)` formulation is
  * correct but runs interpreted lambda calls per ELEMENT (higher-order
  * functions don't participate in whole-stage codegen) — measured as the
  * dominant cost of the candidate-verification stage over millions of
  * pairs. This expression generates a tight primitive loop instead, with
  * identical semantics: elements widened to double, summed left-to-right
  * (same IEEE result as the lambda form, so oracle hashes are unchanged).
  * Mismatched lengths yield NULL — exactly what the declarative form
  * produces (zip_with pads with nulls and null*x poisons the sum), so the
  * two formulations stay interchangeable on every input.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires array<float>/array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  // null on length mismatch, independent of input nullability
  override def nullable: Boolean = true

  override def prettyName: String = "dot_product"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var sum = 0.0
    var i = 0
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    while (i < n) {
      val x = if (lf) xs.getFloat(i).toDouble else xs.getDouble(i)
      val y = if (rf) ys.getFloat(i).toDouble else ys.getDouble(i)
      sum += x * y
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
      val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $sum += (double) $a.$lGet($i) * (double) $b.$rGet($i);
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    bridge.column(DotProduct(bridge.expression(a), bridge.expression(b)))
}

/** Native codegen'd SQUARED Euclidean distance — [[DotProduct]]'s
  * sibling for the distance-based selection operators (k-center
  * coreset). Same rationale and discipline: elements widened to double,
  * Σ(aᵢ−bᵢ)² accumulated left-to-right — the IDENTICAL fold the oracle's
  * `list_sum(list_transform(range(n), j -> (a[j+1]-b[j+1])*(a[j+1]-b[j+1])))`
  * performs, so distances hash-match bit-for-bit (the expanded
  * ‖a‖²−2⟨a,b⟩+‖b‖² form would round differently in the last ulp).
  * Mismatched lengths yield NULL, matching the zip_with form. */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sq_dist requires array<float>/array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sq_dist"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var sum = 0.0
    var i = 0
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    while (i < n) {
      val x = if (lf) xs.getFloat(i).toDouble else xs.getDouble(i)
      val y = if (rf) ys.getFloat(i).toDouble else ys.getDouble(i)
      val d = x - y
      sum += d * d
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
      val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = (double) $a.$lGet($i) - (double) $b.$rGet($i);
         |    $sum += $d * $d;
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}

object SqDist {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    bridge.column(SqDist(bridge.expression(a), bridge.expression(b)))
}

package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd array dot-product kernels for the similarity/dedup hot path.
  *
  * Spark's higher-order array functions (`zip_with`, `aggregate`) are
  * `CodegenFallback`: every invocation leaves whole-stage codegen, builds a
  * lambda-bound InternalRow per ELEMENT, and boxes each product — on the
  * ANN verify tail that is the per-candidate-pair inner loop, so the
  * fallback dominates the stage profile at any scale. These expressions
  * generate a tight primitive loop (`doGenCode`) instead, keeping the whole
  * scoring pipeline inside one WholeStageCodegen span.
  *
  * Null semantics REPLICATE the `aggregate(zip_with(a, b, _*_), 0, _+_)`
  * fold they substitute for, so swapping them in cannot change any oracle
  * result: a length mismatch yields NULL (zip_with pads the short side with
  * NULLs and the sum poisons), any NULL element yields NULL, and the
  * summation order is the element order (exact for longs; bit-identical
  * for doubles because the fold was sequential too).
  */
object VectorExpressions {

  /** Exact integer dot product of two quantized `array<long>` columns.
    * `longDot(a, a)` is the squared norm.
    */
  def longDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      LongArrayDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Double dot product; inputs of other numeric array types (float/long)
    * get ONE explicit whole-array cast — identical values to the previous
    * per-element `cast("double")` lambdas (element casts are the same
    * Cast expression either way).
    */
  def doubleDot(a: Column, b: Column): Column = {
    val at = ArrayType(DoubleType)
    GraftColumnBridge.column(DoubleArrayDot(
      GraftColumnBridge.expression(a.cast(at)), GraftColumnBridge.expression(b.cast(at))))
  }
}

/** Shared shape of the two dot kernels: null-safe on inputs via
  * [[BinaryExpression.nullSafeCodeGen]], NULL on length mismatch or NULL
  * element, tight primitive accumulation loop in generated code.
  */
sealed trait ArrayDotLike extends BinaryExpression {
  protected def elemType: DataType
  override def dataType: DataType = elemType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(l, _), ArrayType(r, _)) if l == elemType && r == elemType =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<${elemType.simpleString}> inputs, got ${l.simpleString} and ${r.simpleString}")
  }

  protected final def genLoop(ctx: CodegenContext, ev: ExprCode,
      a: String, b: String, javaType: String, getter: String): String = {
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    val sawNull = ctx.freshName("sawNull")
    s"""
       |final int $n = $a.numElements();
       |if ($n != $b.numElements()) {
       |  ${ev.isNull} = true;
       |} else {
       |  $javaType $acc = 0;
       |  boolean $sawNull = false;
       |  for (int $i = 0; $i < $n; $i++) {
       |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $sawNull = true; break; }
       |    $acc += $a.$getter($i) * $b.$getter($i);
       |  }
       |  if ($sawNull) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       |}
     """.stripMargin
  }
}

case class LongArrayDot(left: Expression, right: Expression) extends ArrayDotLike {
  override protected def elemType: DataType = LongType
  override def prettyName: String = "long_array_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => genLoop(ctx, ev, a, b, "long", "getLong"))

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class DoubleArrayDot(left: Expression, right: Expression) extends ArrayDotLike {
  override protected def elemType: DataType = DoubleType
  override def prettyName: String = "double_array_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => genLoop(ctx, ev, a, b, "double", "getDouble"))

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two `array<float>` columns — the
  * hot-loop scalar of every ANN / cosine-dedup operator (SURVEY.md §2's
  * LLM-pipeline additions; the pair join in Ann evaluates it once per
  * candidate pair).
  *
  * Semantics match the HOF formulation
  * `aggregate(zip_with(a,b,(x,y)=>x*y), 0.0, (acc,v)=>acc+v)` exactly,
  * including the left-to-right float→double accumulation order (bit-
  * identical doubles, so DuckDB oracle hashes are unchanged) and its null
  * behavior (null result on length mismatch or any null element). What
  * changes is the cost: one fused loop over the two arrays in generated
  * Java — no intermediate zipped array allocation, no per-element lambda
  * dispatch, no nested HOF eval.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires two array<float> arguments, got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      var anyNull = false
      while (i < n && !anyNull) {
        if (x.isNullAt(i) || y.isNullAt(i)) anyNull = true
        else acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      if (anyNull) null else acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          boolean $bad = false;
          for (int $i = 0; $i < $n && !$bad; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; }
            else { $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i); }
          }
          if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for word n-gram shingling — the unit of
  * every MinHash/Jaccard/novelty operator in the dedup family (t6, t13,
  * t31, t35/t36, t40, t41, j6, j13, ...).
  *
  * Replaces the Column composition
  * `array_distinct(transform(sequence(1, size(ws)-n+1), i =>
  * concat_ws(" ", element_at(ws, i), ..., element_at(ws, i+n-1))))`
  * which had two measured pathologies (t40 plan, r13):
  *
  *  1. Higher-order-function lambdas evaluate INTERPRETED (boxed
  *     per-element tree walks — the r12 JFR finding that motivated
  *     ClassBestScores), inside a Generate that is already outside
  *     whole-stage codegen;
  *  2. after projection collapse, the `ws` argument's defining
  *     expression (`split(text, ' ')`) is INLINED into every element_at
  *     and size() call of the lambda — the text is re-split once per
  *     shingle position per gram word (O(words²) splits per document),
  *     because interpreted lambda evaluation has no common-subexpression
  *     elimination.
  *
  * As a UnaryExpression the words array is evaluated exactly ONCE per
  * row regardless of projection collapse, and the gram loop is one
  * generated call into [[WordShinglesUtil]]. Semantics are pinned
  * bit-identical to the old composition by TextFunctionsSpec's
  * equivalence property (incl. null elements — concatWs skips them —
  * first-occurrence distinct order, and the empty-array result for
  * size < n or a NULL input array).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with Serializable {

  require(n >= 1, s"WordShingles: n must be >= 1, got $n")

  // analysis-time input validation (ADVICE r13): without it a
  // non-array<string> child fails deep inside codegen with a
  // ClassCastException instead of a readable analysis error
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"WordShingles requires array<string> input, got " +
            s"${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  // the old when(...).otherwise(array()) form mapped a NULL words array
  // to an EMPTY result, never to NULL — preserved here
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val ws = child.eval(input)
    WordShinglesUtil.eval(ws.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val value = ctx.freshName("shingles")
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData $value =
          graft.plans.WordShinglesUtil.eval(
            ${c.isNull} ? null : ${c.value}, $n);
      """,
      isNull = FalseLiteral,
      value = org.apache.spark.sql.catalyst.expressions.codegen
        .JavaCode.variable(value, dataType))
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Codegen-reachable helper (plain object → JVM static forwarder; see
  * ResidueKeyUtil's note on companion-name collisions).
  */
object WordShinglesUtil {

  private val Empty: ArrayData = new GenericArrayData(Array.empty[Any])
  private val Space: UTF8String = UTF8String.fromString(" ")

  /** Distinct word n-grams in first-occurrence order; empty for NULL or
    * shorter-than-n inputs. NULL elements are skipped inside a gram
    * (UTF8String.concatWs == concat_ws semantics).
    */
  def eval(ws: ArrayData, n: Int): ArrayData = {
    if (ws == null) return Empty
    val sz = ws.numElements()
    if (sz < n) return Empty
    val words = new Array[UTF8String](sz)
    var i = 0
    while (i < sz) {
      words(i) = if (ws.isNullAt(i)) null
        else ws.getUTF8String(i)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val gram = new Array[UTF8String](n)
    i = 0
    val last = sz - n
    while (i <= last) {
      var k = 0
      while (k < n) { gram(k) = words(i + k); k += 1 }
      seen.add(UTF8String.concatWs(Space, gram: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for POSITIONAL word k-grams — every k-word
  * window in order, NOT deduplicated — the anchor-gram unit of the
  * ExactSubstr span detector (operators/MinHashDedup.exactSubstringSpans,
  * queries t35/t36). `posexplode(WordGrams(w, k))` yields the same
  * (0-based position, gram) pairs as the previous SQL composition
  * `posexplode(transform(sequence(1, size(w)-k+1),
  *   i -> array_join(slice(w, i, k), ' ')))`.
  *
  * Replaced for the same two r13-measured reasons as [[WordShingles]]
  * (this is its non-distinct sibling; one row of code differs):
  * higher-order-function lambdas evaluate INTERPRETED, and after
  * projection collapse the words array's defining `split(text, ' ')` is
  * inlined into the lambda body, re-splitting the document once per gram
  * position — O(words²) splits per document with an extra per-position
  * `slice` array copy on top. As a UnaryExpression the words array is
  * evaluated exactly once per row and the gram loop is one generated
  * call into [[WordGramsUtil]]. Semantics pinned value-identical to the
  * old composition by TextFunctionsSpec (null elements are skipped
  * inside a gram — array_join == concatWs semantics — and inputs shorter
  * than k yield an empty array, as the callers' size(w) >= k filter
  * guaranteed upstream).
  */
case class WordGrams(child: Expression, k: Int)
    extends UnaryExpression with Serializable {

  require(k >= 1, s"WordGrams: k must be >= 1, got $k")

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"WordGrams requires array<string> input, got " +
            s"${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val ws = child.eval(input)
    WordGramsUtil.eval(ws.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val value = ctx.freshName("grams")
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData $value =
          graft.plans.WordGramsUtil.eval(
            ${c.isNull} ? null : ${c.value}, $k);
      """,
      isNull = FalseLiteral,
      value = org.apache.spark.sql.catalyst.expressions.codegen
        .JavaCode.variable(value, dataType))
  }

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
}

/** Codegen-reachable helper (plain object → JVM static forwarder; see
  * ResidueKeyUtil's note on companion-name collisions).
  */
object WordGramsUtil {

  private val Empty: ArrayData = new GenericArrayData(Array.empty[Any])
  private val Space: UTF8String = UTF8String.fromString(" ")

  /** All word k-grams in positional order (index i holds the gram
    * starting at word i); empty for NULL or shorter-than-k inputs. NULL
    * elements are skipped inside a gram (concatWs == array_join
    * semantics).
    */
  def eval(ws: ArrayData, k: Int): ArrayData = {
    if (ws == null) return Empty
    val sz = ws.numElements()
    if (sz < k) return Empty
    val words = new Array[UTF8String](sz)
    var i = 0
    while (i < sz) {
      words(i) = if (ws.isNullAt(i)) null
        else ws.getUTF8String(i)
      i += 1
    }
    val gram = new Array[UTF8String](k)
    val out = new Array[Any](sz - k + 1)
    i = 0
    val last = sz - k
    while (i <= last) {
      var j = 0
      while (j < k) { gram(j) = words(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Space, gram: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Identity-on-valid-input guard for the Neo4j TSV sinks (ADVICE r13,
  * medium): passes the string through unchanged, throws on \t / \n / \r —
  * the three bytes that would silently corrupt an unquoted TSV row at the
  * neo4j-admin import boundary.
  *
  * A native expression instead of `contains(\t) || contains(\n) ||
  * contains(\r) → raise_error` because the sinks evaluate it per string
  * column per row (the 78M-row has_similarity_rels sink measured the
  * three-scan Column form at ~20 executor-CPU-s): this is ONE byte scan,
  * inlined into the sink projection's whole-stage codegen.
  */
case class TsvSafe(child: Expression)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"TsvSafe requires string input, got ${other.catalogString}")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    TsvSafeUtil.check(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TsvSafeUtil.check($c)")

  override protected def withNewChildInternal(newChild: Expression): TsvSafe =
    copy(child = newChild)
}

/** Codegen-reachable helper (plain object → JVM static forwarder). */
object TsvSafeUtil {
  def check(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b == '\t' || b == '\n' || b == '\r')
        throw new IllegalArgumentException(
          s"Sinks TSV domain violation (tab/newline in value): $s")
      i += 1
    }
    s
  }
}

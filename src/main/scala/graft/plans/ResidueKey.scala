package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the F1 residue sort key
  * (process_pdb_contacts.py:41-44): parse `"<num>_<inscode>"` into one
  * orderable long — numeric part in the high bits, the first inscode
  * character in the low 16 — so a plain sort on the key reproduces
  * (numeric, inscode) order without a UDF, struct allocation, or regex.
  *
  * This is the one place SURVEY.md §4 flagged where a custom `Expression`
  * beats composition: the struct-sort formulation allocates a struct per
  * element inside array_sort comparators; this stays a single primitive
  * long through whole-stage codegen (`doGenCode` below) and ties into the
  * session via GraftExtensions (`SparkSessionExtensions.injectFunction`).
  */
case class ResidueKey(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    ResidueKeyUtil.eval(input.asInstanceOf[UTF8String].toString)

  // NB: the helper lives in ResidueKeyUtil, not the companion — scalac
  // emits no static forwarder for a companion method whose name collides
  // with an inherited member (Expression.eval), so a generated call to
  // `graft.plans.ResidueKey.eval` fails Janino compilation and silently
  // drops the stage to interpreted execution.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.ResidueKeyUtil.eval($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): ResidueKey =
    copy(child = newChild)
}

object ResidueKey {
  /** Convenience alias kept for callers/tests. */
  def eval(s: String): Long = ResidueKeyUtil.eval(s)
}

/** Codegen-reachable helper: a plain object with no class-side name
  * collision, so `ResidueKeyUtil.eval` exists as a JVM static forwarder
  * that generated Java can call directly.
  */
object ResidueKeyUtil {
  /** "123_A" → (123 << 16) | 'A'; no inscode → low bits 0. Shared by the
    * interpreted path and generated code.
    *
    * Signed numerics: PDB auth_seq_id can be NEGATIVE (His-tag residues)
    * and the reference parses signed ints — a digit-only scan would fold
    * "-5" to +5 and silently mis-sort it after residue 3. A leading '-'
    * negates; the shifted key stays a signed long, so negative residues
    * order before positives under the plain long sort. The inscode lives
    * in the low 16 bits unsigned, so within one negative residue number
    * a LOWER inscode still yields a SMALLER key (two's-complement low
    * bits are order-preserving within the same high bits).
    */
  def eval(s: String): Long = {
    val sep = s.indexOf('_')
    val (numPart, ins) =
      if (sep < 0) (s, 0L)
      else (s.substring(0, sep),
        if (sep + 1 < s.length) s.charAt(sep + 1).toLong else 0L)
    var num = 0L
    var neg = false
    var i = 0
    while (i < numPart.length) {
      val c = numPart.charAt(i)
      if (c == '-' && i == 0) neg = true
      else if (c >= '0' && c <= '9') num = num * 10 + (c - '0')
      i += 1
    }
    if (neg) num = -num
    (num << 16) | (ins & 0xffffL)
  }
}

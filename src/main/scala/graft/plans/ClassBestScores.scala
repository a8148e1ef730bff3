package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, SpecificInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd replacement for the hottest expression of the
  * registry build — `GraphTables.domainCognateFactorized`'s per-output-row
  * pair of higher-order transforms:
  *
  *   array_max(transform(cls, e => score(e.bsize, csize)))
  *   array_max(transform(cls, e => when(score(..) === e.bestScore,
  *                                      e.bestScore)))
  *
  * Spark's higher-order functions evaluate their LAMBDA BODIES
  * INTERPRETED — every element pays tree-walk dispatch plus Long/Double
  * boxing (`ArrayTransform.nullSafeEval` → `Greatest.eval` →
  * `Divide.eval`, JFR-measured as the dominant frames of the
  * domainCognate warmup; at 20M output rows × ~10-element class arrays ×
  * 3 score evaluations that interpretation tax IS the registry floor,
  * and it multiplies on a slow host — the r11 driver measured this one
  * table at 3,055 executor-seconds). This expression fuses both maxes
  * into ONE generated loop over the class array with primitive
  * arithmetic only: the toolkit's own score expression is compiled
  * INLINE, bound to the loop variables.
  *
  * Genericity: `score` is any ANALYZED, deterministic expression over
  * exactly two `BoundReference`s — ordinal 0 = the element's bsize
  * (long), ordinal 1 = csize (long) — which is precisely the
  * `ColumnChem.columnPure` contract the factorized path already
  * requires. GraphTables binds the toolkit's `parityScore` Column
  * through a one-row dummy plan, so ANY column-pure toolkit gets the
  * codegen'd loop, not just the fixture (DomainCognateSpec pins exact
  * equality against the HOF formulation for both the fixture and a
  * custom toolkit).
  *
  * Null semantics — exactly the HOF formulation's:
  *  - a null array or null csize ⇒ both fields null (transform over
  *    null / with a null operand yields null, array_max of null is null);
  *  - null elements and null scores are SKIPPED (array_max ignores
  *    nulls); a null bestScore skips only the best-side candidate;
  *  - empty array (or all skipped) ⇒ null field.
  *
  * Output: struct(maxAnyScore double, maxBestScore double).
  */
case class ClassBestScores(cls: Expression, csize: Expression,
                           score: Expression) extends Expression {

  // `score` is deliberately NOT a child (ADVICE r12): its BoundReferences
  // (ordinals 0/1) address the generated loop's locals, not the
  // operator's input schema. Exposed via children, operator-level
  // tree passes — notably whole-stage SUBEXPRESSION ELIMINATION in
  // ProjectExec — may hoist a non-leaf subtree of score that
  // structurally equals a sibling projection subtree and evaluate it
  // against the operator's INPUT row, silently corrupting scores
  // whenever a column-pure toolkit's expression shares subtrees with a
  // neighboring column (ClassBestScoresSpec pins exactly that shape).
  // Hiding it is sound because score is fully bound at construction
  // (GraphTables analyzes it through a dummy plan first): no analysis,
  // resolution, or column-pruning pass needs to rewrite inside it, and
  // case-class equality/canonicalization still compare it.
  override def children: Seq[Expression] = Seq(cls, csize)

  override lazy val resolved: Boolean =
    cls.resolved && csize.resolved && score.resolved &&
      checkInputDataTypes().isSuccess

  override lazy val deterministic: Boolean =
    cls.deterministic && csize.deterministic && score.deterministic

  override def checkInputDataTypes(): TypeCheckResult =
    (cls.dataType, csize.dataType, score.dataType) match {
      case (ArrayType(StructType(Array(b, s)), _), LongType, DoubleType)
          if (b.dataType == LongType || b.dataType == IntegerType) &&
            s.dataType == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case (c, z, sc) => TypeCheckResult.TypeCheckFailure(
        "class_best_scores requires (array<struct<int|long,double>>, " +
          s"long, double-typed score), got ($c, $z, $sc)")
    }

  /** Whether the element's bsize field is int (widened to long at read). */
  private def bsizeIsInt: Boolean = cls.dataType match {
    case ArrayType(StructType(Array(b, _)), _) => b.dataType == IntegerType
    case _ => false
  }

  override def dataType: DataType = StructType(Seq(
    StructField("maxAnyScore", DoubleType, nullable = true),
    StructField("maxBestScore", DoubleType, nullable = true)))

  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val arrRaw = cls.eval(input)
    val cRaw = csize.eval(input)
    if (arrRaw == null || cRaw == null) return null
    val arr = arrRaw.asInstanceOf[ArrayData]
    val c = cRaw.asInstanceOf[Long]
    // interpreted fallback (codegen-disabled sessions, ConstantFolding):
    // feed the bound score expression through a private two-long row —
    // its BoundReferences never see the operator's input row
    val row = new SpecificInternalRow(Seq(LongType, LongType))
    row.setLong(1, c)
    var maxAny: java.lang.Double = null
    var maxBest: java.lang.Double = null
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val st = arr.getStruct(i, 2)
        if (!st.isNullAt(0)) {
          row.setLong(0,
            if (bsizeIsInt) st.getInt(0).toLong else st.getLong(0))
          val sRaw = score.eval(row)
          if (sRaw != null) {
            val s = sRaw.asInstanceOf[Double]
            if (maxAny == null || s > maxAny) maxAny = s
            if (!st.isNullAt(1)) {
              val bs = st.getDouble(1)
              if (s == bs && (maxBest == null || bs > maxBest)) maxBest = bs
            }
          }
        }
      }
      i += 1
    }
    InternalRow(maxAny, maxBest)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val arrCode = cls.genCode(ctx)
    val cCode = csize.genCode(ctx)
    val b = ctx.freshName("bsz")
    val cv = ctx.freshName("csz")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val st = ctx.freshName("st")
    val maxAny = ctx.freshName("maxAny")
    val hasAny = ctx.freshName("hasAny")
    val maxBest = ctx.freshName("maxBest")
    val hasBest = ctx.freshName("hasBest")
    val vals = ctx.freshName("vals")
    val bsv = ctx.freshName("bsv")
    // bind the score expression's two BoundReferences to the loop
    // variables: ordinal 0 → the element's bsize, ordinal 1 → csize.
    // currentVars is saved/restored so sibling expressions of the
    // enclosing operator keep their own bindings.
    val bEv = ExprCode(code"", FalseLiteral,
      JavaCode.variable(b, LongType))
    val cEv = ExprCode(code"", FalseLiteral,
      JavaCode.variable(cv, LongType))
    val savedVars = ctx.currentVars
    val savedRow = ctx.INPUT_ROW
    ctx.currentVars = Seq(bEv, cEv)
    ctx.INPUT_ROW = null
    val scoreCode = score.genCode(ctx)
    ctx.currentVars = savedVars
    ctx.INPUT_ROW = savedRow
    val rowClass = classOf[org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow].getName
    val code =
      code"""
        ${arrCode.code}
        ${cCode.code}
        boolean ${ev.isNull} = true;
        InternalRow ${ev.value} = null;
        if (!${arrCode.isNull} && !${cCode.isNull}) {
          long $cv = ${cCode.value};
          double $maxAny = 0.0; boolean $hasAny = false;
          double $maxBest = 0.0; boolean $hasBest = false;
          int $n = ${arrCode.value}.numElements();
          for (int $i = 0; $i < $n; $i++) {
            if (${arrCode.value}.isNullAt($i)) continue;
            InternalRow $st = ${arrCode.value}.getStruct($i, 2);
            if ($st.isNullAt(0)) continue;
            long $b = ${if (bsizeIsInt) s"(long) $st.getInt(0)"
                        else s"$st.getLong(0)"};
            ${scoreCode.code}
            if (!${scoreCode.isNull}) {
              if (!$hasAny || ${scoreCode.value} > $maxAny) {
                $maxAny = ${scoreCode.value}; $hasAny = true;
              }
              if (!$st.isNullAt(1)) {
                double $bsv = $st.getDouble(1);
                if (${scoreCode.value} == $bsv && (!$hasBest || $bsv > $maxBest)) {
                  $maxBest = $bsv; $hasBest = true;
                }
              }
            }
          }
          Object[] $vals = new Object[2];
          if ($hasAny) $vals[0] = (Object) $maxAny;
          if ($hasBest) $vals[1] = (Object) $maxBest;
          ${ev.value} = new $rowClass($vals);
          ${ev.isNull} = false;
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ClassBestScores =
    copy(cls = newChildren(0), csize = newChildren(1))
}

object ClassBestScores {

  /** The two slots the bound score expression reads: element bsize and
    * row csize (the `ColumnChem.parityScore(b, c)` argument order).
    */
  val BoundB: BoundReference = BoundReference(0, LongType, nullable = false)
  val BoundC: BoundReference = BoundReference(1, LongType, nullable = false)
}

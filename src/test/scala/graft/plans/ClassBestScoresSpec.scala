package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.GraftPlanBridge
import org.scalatest.funspec.AnyFunSpec

import graft.SparkSpec

/** Pins ClassBestScores against the hazard its child list shape guards
  * (ADVICE r12): the bound `score` expression's subtrees address LOOP
  * LOCALS (BoundReference ordinals 0/1), so exposing them through
  * `children` lets ProjectExec's whole-stage subexpression elimination
  * hoist a subtree that structurally equals a SIBLING projection's bound
  * subtree and evaluate it against the operator's input row — silently
  * corrupting scores. The spec constructs exactly that collision: a
  * toolkit score containing `input1 * 2` next to a projected column that
  * binds to the same shape, then checks codegen output against the
  * interpreted `eval` path (which binds score privately and cannot be
  * CSE'd).
  */
class ClassBestScoresSpec extends AnyFunSpec with SparkSpec {

  /** The toolkit score (bsize, csize) => ((csize * 2) - bsize) / 100.0 —
    * analyzed through a dummy plan then rebound to the loop slots,
    * exactly GraphTables.boundScore's mechanism. The `csize * 2` subtree
    * is the deliberate CSE bait.
    */
  private def sharedSubtreeScore(bait: Column => Column)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val base = spark.range(1).select(col("id").as("b"), col("id").as("c"))
    val analyzed = base
      .select(((bait(col("c")) - col("b")).cast("double") / lit(100.0)).as("s"))
      .queryExecution.analyzed.asInstanceOf[Project]
    val expr = analyzed.projectList.head match {
      case a: Alias => a.child
      case e => e
    }
    val in = analyzed.child.output
    expr.transform {
      case a: AttributeReference if a.exprId == in(0).exprId =>
        ClassBestScores.BoundB
      case a: AttributeReference if a.exprId == in(1).exprId =>
        ClassBestScores.BoundC
    }
  }

  describe("ClassBestScores under operator-level CSE") {

    it("keeps scores correct when the score shares a subtree with an " +
       "adjacent projected column") {
      // rows: (cls array of (bsize, bestScore), csize long). csize is
      // ordinal 1 after the project binds, matching BoundC's ordinal —
      // the strongest structural-equality setup for the sibling column.
      val df = spark.range(0, 64)
        .select(
          transform(sequence(lit(1L), (col("id") % 5) + 1),
            i => struct((col("id") % 7 + i).as("bsize"),
              ((col("id") % 7 + i + i * 2 - (col("id") % 7 + i)).cast("double")
                / lit(100.0)).as("bestScore"))).as("cls"),
          (col("id") % 9 + 1).cast("long").as("csize"))
        .persist()
      df.count()

      val score = sharedSubtreeScore(c => c * lit(2L))
      val out = df.select(
        col("csize"),
        // the sibling bait: binds to Multiply(BoundReference(1), 2L)
        // in ProjectExec — structurally equal to score's subtree if
        // score's internals were visible to CSE
        (col("csize") * lit(2L)).as("bait"),
        GraftPlanBridge.columnOf(ClassBestScores(
          GraftPlanBridge.expressionOf(col("cls")),
          GraftPlanBridge.expressionOf(col("csize")),
          score)).as("sc"))

      val viaCodegen = out
        .select(col("csize"), col("bait"),
          col("sc.maxAnyScore"), col("sc.maxBestScore"))
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)

      // reference values: spark.sql.codegen.wholeStage=false forces the
      // interpreted eval path, whose private two-long row cannot collide
      val viaEval = {
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        try out
          .select(col("csize"), col("bait"),
            col("sc.maxAnyScore"), col("sc.maxBestScore"))
          .collect().map(_.toSeq).toSeq.sortBy(_.toString)
        finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
      }

      assert(viaCodegen == viaEval)
      // and the values are genuinely exercised (some non-null maxima)
      assert(viaCodegen.exists(_(2) != null))
      df.unpersist()
    }

    it("null semantics survive the hidden-child shape (null array, " +
       "null csize, empty array)") {
      val score = sharedSubtreeScore(c => c * lit(2L))
      val df = spark.sql(
        """SELECT * FROM VALUES
           (array(named_struct('bsize', 5L, 'bestScore', 0.1d)), CAST(NULL AS LONG)),
           (CAST(NULL AS ARRAY<STRUCT<bsize: LONG, bestScore: DOUBLE>>), 3L),
           (array(), 3L)
           AS t(cls, csize)""")
      val rows = df.select(GraftPlanBridge.columnOf(ClassBestScores(
          GraftPlanBridge.expressionOf(col("cls")),
          GraftPlanBridge.expressionOf(col("csize")),
          score)).as("sc"))
        .select(col("sc"), col("sc.maxAnyScore")).collect()
      assert(rows(0).isNullAt(0))      // null csize → null struct
      assert(rows(1).isNullAt(0))      // null array → null struct
      assert(!rows(2).isNullAt(0) && rows(2).isNullAt(1)) // empty → null max
    }
  }
}

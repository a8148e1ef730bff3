package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Session extension wiring (`spark.sql.extensions=graft.plans.
  * GraftExtensions` or programmatic `withExtensions`): registers the
  * engine's native expressions so they are usable from SQL
  * (`residue_key(col)`) as well as the typed API below.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.residueKeyDescriptor)
    ext.injectFunction(GraftExtensions.vecDotDescriptor)
    ext.injectOptimizerRule(_ =>
      AutoBroadcastDims(GraftExtensions.defaultDims))
  }
}

object GraftExtensions {

  /** The engine's known dimension tables (the reference's EC universe,
    * domain metadata, region/nation analogues).
    */
  val defaultDims: Seq[String] =
    Seq("region.parquet", "nation.parquet", "supplier.parquet")

  val residueKeyDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("residue_key"),
    new ExpressionInfo(classOf[ResidueKey].getName, "residue_key"),
    (children: Seq[Expression]) => children match {
      case Seq(c) => ResidueKey(c)
      case other => throw new IllegalArgumentException(
        s"residue_key requires exactly 1 argument, got ${other.length}")
    })

  val vecDotDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
    (children: Seq[Expression]) => children match {
      case Seq(a, b) => VectorDot(a, b)
      case other => throw new IllegalArgumentException(
        s"vec_dot requires exactly 2 arguments, got ${other.length}")
    })

  /** Typed-API entry: sortable long key for a "num_inscode" string
    * (requires install()/extensions wiring on the session).
    */
  def residueKey(c: Column): Column = call_function("residue_key", c)

  /** Register on an existing session (tests / mains that didn't pass
    * spark.sql.extensions at build time).
    */
  def install(s: SparkSession): Unit = {
    Seq(residueKeyDescriptor, vecDotDescriptor).foreach {
      case (id, info, builder) =>
        s.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
  }
}

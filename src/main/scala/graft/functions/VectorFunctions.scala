package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over `array<float>` embedding columns.
  *
  * All ops are codegen'd higher-order functions (`zip_with` / `aggregate`) —
  * no UDF, no driver round-trip. Elements are cast to double *before* the
  * multiply so every engine accumulates the same IEEE-754 sequence (the
  * fold is left-to-right in both Spark's `aggregate` and DuckDB's
  * `list_sum`, which keeps oracle comparisons exact to the ulp).
  */
object VectorFunctions {

  /** Fused native loop (plans/VectorDot, whole-stage codegen), resolved
    * through the session's function registry — sessions must carry
    * `GraftExtensions` (withExtensions / spark.sql.extensions) or call
    * `GraftExtensions.install(session)`. The HOF-composed equivalent is
    * kept as `dotHof`; both produce bit-identical doubles.
    */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Zero-norm (empty / all-zero) vectors yield NULL, never NaN: Spark
    * sorts NaN ABOVE every double and evaluates `NaN >= t` as true, so a
    * 0/0 cosine would rank a degenerate vector as everyone's nearest
    * neighbor; a null drops out of both ranking and threshold filters.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** Random-hyperplane LSH bucket key: `planes` sign bits concatenated to a
    * bit-string. Plane weights are a deterministic integer function of
    * (plane, dim): m = (p*31 + i*17) mod 6 mapped onto {-3,-2,-1,1,2,3}
    * (never 0 — a 0 weight would silently ignore that dimension), so the
    * bucketing is reproducible across engines and runs with zero stored
    * state. Integer weights also keep each product exact in double precision.
    */
  def rpLshBucket(v: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val dotP = aggregate(
        zip_with(v, sequence(lit(1), size(v)),
          (x, i) => {
            val m = (lit(p) * 31 + i * 17) % 6
            x.cast("double") * when(m < 3, m - 3).otherwise(m - 2).cast("double")
          }),
        lit(0.0), (acc, x) => acc + x)
      when(dotP >= 0.0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }
}

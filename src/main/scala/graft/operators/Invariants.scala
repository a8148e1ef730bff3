package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-cardinality and completeness invariants (SURVEY.md §4): the
  * reference peppers `validate="many_to_one"` (get_pdb_parity.py:160) and
  * `_merge == "both"` indicator asserts (≥15 sites, e.g.
  * process_pdb_structure.py:75) through the pipeline. Catalyst has no
  * equivalent, so these are cheap count-based checks — one aggregate
  * each — to run at stage boundaries (and in tests).
  */
object Invariants {

  /** Fails unless `keys` are unique in `dim` (the "one" side of a
    * many-to-one join). One countDistinct pass.
    */
  def requireUniqueKey(dim: DataFrame, keys: Seq[String], what: String): Unit = {
    // groupBy, not count-vs-countDistinct: countDistinct skips null-keyed
    // rows, so a single null key would false-positive as a "duplicate"
    val dups = dim.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).limit(1).count()
    require(dups == 0L,
      s"$what: duplicate ${keys.mkString(",")} key(s) in the dimension side")
  }

  /** Fails if an inner join on `keys` would drop probe rows — the
    * reference's `_merge == "both"` completeness assert, expressed as a
    * left_anti count (no materialization of the join itself).
    */
  def requireJoinComplete(probe: DataFrame, dim: DataFrame,
                          keys: Seq[String], what: String): Unit = {
    val missing = probe.join(dim, keys, "left_anti").count()
    require(missing == 0, s"$what: $missing probe rows have no match on ${keys.mkString(",")}")
  }
}

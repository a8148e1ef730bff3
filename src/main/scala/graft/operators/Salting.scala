package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY.md §4 — the reference isolates
  * heavy structures by hand, process_pdb_structure.py:195-209; on a
  * cluster the join-side equivalent is salting; AQE's skew-join covers
  * sort-merge cases, salting covers the rest).
  */
object Salting {

  /** Salted equi-join: the probe (large, possibly skewed) side gets a
    * deterministic salt in [0, n) derived from `saltSource` (any
    * fine-grained probe column — NOT the join key); the build side is
    * replicated n ways; the join runs on (key, salt). Result is exactly
    * the plain inner join, but a hot key's rows spread over n tasks.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 saltSource: Column, n: Int): DataFrame = {
    val salted = probe.withColumn("__salt", pmod(hash(saltSource), lit(n)))
    val replicated = build
      .withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}

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
    // collision-proof temp name (the WindowOps.preferenceFirst pattern):
    // a fixed "__salt" would silently REPLACE and then drop a caller's
    // column of that name
    val salt = Iterator.from(0).map(i => s"__graft_salt$i")
      .find(c => !probe.columns.contains(c) && !build.columns.contains(c)).get
    val salted = probe.withColumn(salt, pmod(hash(saltSource), lit(n)))
    val replicated = build
      .withColumn(salt, explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, Seq(key, salt)).drop(salt)
  }
}

/** The adaptive complement: AQE's OptimizeSkewedJoin splits oversized
  * shuffle partitions at runtime from map-output statistics. ONE
  * definition of the demo conf scope, shared by the s8 registered query
  * and SkewJoinSpec so the spec proves exactly the scope the query runs.
  *
  * These thresholds are FORCED-DEMO values: test-SF shuffles are a few
  * hundred KB, far below the production defaults (factor 5, 256 MB
  * partition threshold, 64 MB advisory target) — under defaults nothing
  * at test scale ever qualifies as skewed. A production deployment keeps
  * the defaults (or tunes them to executor memory); the mechanism the
  * demo exercises is identical, only the thresholds differ.
  */
object AqeSkew {

  val demoConfs: Seq[(String, String)] = Seq(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
    // keep the sort-merge path so the skew optimizer applies
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  /** Save/set/restore the demo confs around an EAGER body (plans finalize
    * at runtime under AQE, so the work must execute while the confs hold).
    */
  def withDemoConfs[A](s: org.apache.spark.sql.SparkSession)(body: => A): A = {
    val prev = demoConfs.map { case (k, _) => k -> s.conf.getOption(k) }
    demoConfs.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}

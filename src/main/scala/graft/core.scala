package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A query registered with the driver's correctness harness.
  *
  * `build` produces the Spark result for a scale-factor directory; `oracle`
  * is the equivalent DuckDB SQL over the same parquet tables (omitted for
  * shapes DuckDB can't express — the driver then records a rows-only check).
  *
  * Contract notes (see /root/repo/SURVEY.md §5 and the driver prompt):
  *  - output column names must match the oracle exactly;
  *  - results are totally ordered on both sides so the compare is stable
  *    regardless of whether the driver sorts rows before hashing;
  *  - output columns are limited to BIGINT / DOUBLE / VARCHAR so Spark and
  *    DuckDB physical types line up (no raw timestamps, no int32 vs int64
  *    drift, no decimal surprises).
  */
final case class RQ(name: String, oracle: Option[String])(
    val build: (SparkSession, String) => DataFrame)

/** Loaders for the driver-generated test tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(s: SparkSession, dir: String, name: String): DataFrame = {
    require(names.contains(name),
      s"unknown table '$name' — expected one of: ${names.mkString(", ")}")
    s.read.parquet(s"$dir/$name.parquet")
  }
}

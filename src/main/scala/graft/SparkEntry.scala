package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{EtlQueries, EventQueries, ExtraQueries, GraphQueryDefs, HierarchyQueries, MultimodalQueries, ProCogQueryDefs, RelationalQueries, ScaleQueries, SourceQueries, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator claimed in SURVEY.md §2 is registered here as a named
  * query plus a DuckDB oracle (core.RQ carries the pair).
  */
object SparkEntry {

  /** The full registered-query inventory. */
  val all: Seq[RQ] =
    RelationalQueries.defs ++ TextQueries.defs ++ VectorQueries.defs ++
      EventQueries.defs ++ SourceQueries.defs ++ ProCogQueryDefs.defs ++
      ExtraQueries.defs ++ GraphQueryDefs.defs ++ MultimodalQueries.defs ++
      ScaleQueries.defs ++ HierarchyQueries.defs ++ EtlQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The C14 star join: region-nation-customer-orders-lineitem with
    * broadcast dims and exact-cents revenue.
    */
  def entry(spark: SparkSession): DataFrame =
    all.find(_.name == "c14_star_join").get
      .build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(r => r.name -> r.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(r => r.oracle.map(sql => r.name -> sql)).toMap
}

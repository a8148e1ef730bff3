package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Export sinks mirroring the reference's output layer (SURVEY.md §2.A).
  */
object Sinks {

  /** A10 — Neo4j bulk-import TSV+gzip sink (produce_neo4j_files.py:83-562;
    * header contract consumed by import_neo4j_data.sh:3-78).
    *
    * Array columns stay `ArrayType` until this boundary and are serialized
    * with the `|` delimiter here (`--array-delimiter="|"`); headers are
    * rewritten to the `name:TYPE` / `:ID(space)` / `:START_ID` forms.
    *
    * `headerFor` maps plain column names to Neo4j header names, e.g.
    * `Map("uniqueID" -> "uniqueID:ID(be-id)", "score" -> "score:float")`;
    * unmapped columns derive a typed header from their Spark type.
    */
  def neo4jTsv(df: DataFrame, path: String,
               headerFor: Map[String, String] = Map.empty): Unit = {
    val cols: Seq[Column] = df.schema.fields.toSeq.map { f =>
      val header = headerFor.getOrElse(f.name, f.dataType match {
        case LongType | IntegerType => s"${f.name}:long"
        case DoubleType | FloatType => s"${f.name}:float"
        case ArrayType(_, _)        => s"${f.name}:string[]"
        case _                      => f.name
      })
      f.dataType match {
        case ArrayType(_, _) => concat_ws("|", col(f.name)).as(header)
        case _               => col(f.name).as(header)
      }
    }
    df.select(cols: _*)
      .write.mode("overwrite")
      .option("sep", "\t").option("header", "true")
      .option("compression", "gzip")
      .option("emptyValue", "")
      .csv(path)
  }

  /** A11 — skew-aware chunked repartition (molwt 80th-percentile split,
    * process_pdb_structure.py:195-209): rows above the `pctl` quantile of
    * `weightCol` are isolated one-per-partition (the reference's
    * single-row manifest files for huge structures); the rest are packed
    * `chunkSize` rows per partition. Returns (heavy, light) ready to write.
    *
    * The quantile comes from `approxQuantile` (a single pass, no global
    * sort) — the 100-TB-safe way to derive a data-dependent threshold.
    */
  def skewSplit(df: DataFrame, weightCol: String, pctl: Double = 0.8,
                chunkSize: Int = 100): (DataFrame, DataFrame) = {
    val Array(threshold) = df.stat.approxQuantile(weightCol, Array(pctl), 0.001)
    skewSplitAt(df, weightCol, threshold, chunkSize)
  }

  /** A11 with an externally supplied threshold (exact-percentile callers,
    * tests, and the oracle-checked a11 query use this so both engines
    * agree on the split point bit-for-bit).
    */
  def skewSplitAt(df: DataFrame, weightCol: String, threshold: Double,
                  chunkSize: Int = 100): (DataFrame, DataFrame) = {
    val heavy = df.filter(col(weightCol) > threshold)
    val light = df.filter(col(weightCol) <= threshold)
    val heavyParts = math.max(1, heavy.count().toInt)
    val lightParts =
      math.max(1, math.ceil(light.count().toDouble / chunkSize).toInt)
    (heavy.repartition(heavyParts), light.repartition(lightParts))
  }
}

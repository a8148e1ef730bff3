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
  /** neo4j-admin honors a header only in the FIRST file of a group, so a
    * multi-partition write with per-part headers would feed later files'
    * header lines in as data. The layout here is the tool's own contract
    * for that: one driver-written `header.tsv` plus headerless gzip data
    * parts under `data/` — imported as `--nodes=header.tsv,data/part-.*`.
    */
  /** BEST_SPEED deflate for this session's gzip sinks: the Neo4j export
    * writes ~70 gzip files and default-level deflate made the full
    * inventory the most CPU/IO-bound query in the bench (etl3 73.9 s on
    * the round-7 driver record). Level 1 keeps the .gz import contract
    * (neo4j-admin only needs a valid gzip stream) at a fraction of the
    * compression CPU.
    *
    * Two mechanisms, because Hadoop's GzipCodec has two codec paths:
    * the conf key below configures the NATIVE zlib compressor (when
    * `NativeCodeLoader.isNativeCodeLoaded`), and [[FastGzipCodec]] —
    * which `neo4jTsv` now passes as the writer's compression codec —
    * pins BEST_SPEED on the JDK `GZIPOutputStream` fallback too, where
    * the conf key is silently ignored (the round-7/8 driver records
    * measured etl3 at ~74 s unchanged because of exactly that gap).
    * SESSION-SCOPED and idempotent; call from a single-threaded setup
    * point, never from concurrent sink threads: per-job Configuration
    * cloning races with a mid-flight mutation.
    */
  def ensureFastDeflate(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.hadoopConfiguration
      .set("zlib.compress.level", "BEST_SPEED")

  def neo4jTsv(df: DataFrame, path: String,
               headerFor: Map[String, String] = Map.empty): Unit = {
    val headers: Seq[String] = df.schema.fields.toSeq.map { f =>
      headerFor.getOrElse(f.name, f.dataType match {
        case LongType | IntegerType => s"${f.name}:long"
        case DoubleType | FloatType => s"${f.name}:float"
        case ArrayType(_, _)        => s"${f.name}:string[]"
        case _                      => f.name
      })
    }
    val cols: Seq[Column] = df.schema.fields.toSeq.map { f =>
      f.dataType match {
        case ArrayType(_, _) => concat_ws("|", col(f.name)).as(f.name)
        case _               => col(f.name)
      }
    }
    df.select(cols: _*)
      .write.mode("overwrite")
      .option("sep", "\t").option("header", "false")
      // FastGzipCodec, not "gzip": BEST_SPEED on both the native-zlib and
      // JDK-Deflater codec paths (plain GzipCodec ignores the level conf
      // on hosts without native Hadoop libs — see FastGzipCodec.scala)
      .option("compression", FastGzipCodec.name)
      .option("emptyValue", "")
      .csv(s"$path/data")
    // header goes through the HADOOP filesystem of the output path, not
    // java.nio: the data parts above land wherever the path's scheme says
    // (hdfs://, s3a://, file://), and a local-FS header write would leave
    // the neo4j-admin contract (--nodes=header.tsv,data/part-.*) with no
    // header next to cluster-resident data
    val hPath = new org.apache.hadoop.fs.Path(path, "header.tsv")
    val fs = hPath.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(hPath, true)
    try out.write((headers.mkString("\t") + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read back a `neo4jTsv` table (tests / the a10 roundtrip query). */
  def readNeo4jTsv(s: org.apache.spark.sql.SparkSession,
                   path: String): DataFrame = {
    val hPath = new org.apache.hadoop.fs.Path(path, "header.tsv")
    val fs = hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val in = fs.open(hPath)
    val headerLine =
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    val headers = headerLine.trim.split("\t").toSeq
    s.read.option("sep", "\t").option("header", "false")
      .option("emptyValue", "").csv(s"$path/data")
      .toDF(headers: _*)
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
    // approxQuantile ignores null/NaN and returns an EMPTY array when no
    // values remain (empty df, all-null weight column) — destructuring
    // unconditionally would MatchError on exactly the degenerate inputs
    // skewSplitAt below is hardened for. No threshold → nothing is
    // "heavy": every row (all null-weighted) belongs on the light side.
    df.stat.approxQuantile(weightCol, Array(pctl), 0.001) match {
      case Array(threshold) => skewSplitAt(df, weightCol, threshold, chunkSize)
      case _ => skewSplitAt(df, weightCol, Double.PositiveInfinity, chunkSize)
    }
  }

  /** A11 with an externally supplied threshold (exact-percentile callers,
    * tests, and the oracle-checked a11 query use this so both engines
    * agree on the split point bit-for-bit).
    */
  def skewSplitAt(df: DataFrame, weightCol: String, threshold: Double,
                  chunkSize: Int = 100): (DataFrame, DataFrame) = {
    // NULL weights (unweighable rows) must not vanish: they join the light
    // side, so heavy ∪ light == df always. Both counts come from ONE
    // aggregation pass (two filtered count() jobs would scan df twice),
    // and stay Long until clamped — a .toInt on a >2^31 count would go
    // negative and collapse the heavy side to one partition.
    val isHeavy = col(weightCol) > threshold
    val row = df.agg(
      sum(when(isHeavy, 1L).otherwise(0L)).as("h"),
      sum(when(isHeavy.isNull || !isHeavy, 1L).otherwise(0L)).as("l")).head()
    val h = if (row.isNullAt(0)) 0L else row.getLong(0)
    val l = if (row.isNullAt(1)) 0L else row.getLong(1)
    val heavy = df.filter(isHeavy)
    val light = df.filter(isHeavy.isNull || !isHeavy)
    def clamp(n: Long): Int = math.max(1L, math.min(n, Int.MaxValue.toLong)).toInt
    val lightParts = clamp((l + chunkSize - 1) / chunkSize)
    (heavy.repartition(clamp(h)), light.repartition(lightParts))
  }
}

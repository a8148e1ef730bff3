package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated name filter for fast local
    // iteration on a few queries (the driver always runs the full set)
    val keep: String => Boolean =
      if (args.length > 2) args(2).split(",").toSet else (_ => true)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // single-digit-MB test parquet would otherwise scan as ONE input
      // partition (default split 128 MB) — size the split to the SF so
      // scan+map stages use the cores; at production SF the default holds
      .config("spark.sql.files.maxPartitionBytes", 2097152L)
      .config("spark.sql.files.openCostInBytes", 262144L)
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.GraftSession.IcuCaseMappingsKey, "false") // JVM case mapping; see GraftSession scaladoc
      .config(graft.sources.FastLocalFileSystem.confKey,
        graft.sources.FastLocalFileSystem.confValue) // in-process chmod; see its scaladoc
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // build the graph registry BEFORE the cache-hygiene baseline so the
    // between-family sweeps never evict it (Bench does the same; the
    // dashboard families query it like the bulk-imported reference DB).
    // Skipped for filtered dev runs: iterating on one non-graph query
    // must not pay the full registry build — a kept query that does need
    // it builds it lazily through GraphTables.cached
    if (args.length <= 2) try {
      graft.graph.GraphTables.cached(spark, sfDir)
        .registryTables.foreach(_.queryExecution.toRdd.count())
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[verify] graph warmup failed: ${e.getMessage}")
    }
    val baseline = CacheHygiene.snapshot(spark.sparkContext)
    // family-contiguous order (registration alone interleaves j-queries
    // into the t-block), so the sweep below fires exactly once per
    // family and never splits a family's legitimate cache reuse.
    // Filtered dev runs skip the sweeps entirely: the warmup above was
    // skipped too, so a lazily-built graph registry is NOT in the
    // baseline and a sweep would evict it mid-run — and a handful of
    // kept queries can't accumulate the session state the sweep exists
    // to control anyway
    val sweeping = args.length <= 2
    var prevFamily = ""
    CacheHygiene.familyContiguous(SparkEntry.all)(_.name)
      .filter(rq => keep(rq.name)).foreach { rq =>
      val fam = CacheHygiene.family(rq.name)
      if (sweeping && prevFamily.nonEmpty && fam != prevFamily)
        CacheHygiene.sweep(spark.sparkContext, baseline)
      prevFamily = fam
      try rq.build(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/${rq.name}")
      catch { case e: Throwable =>
        System.err.println(s"[verify] ${rq.name} failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

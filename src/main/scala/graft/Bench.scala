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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT + codegen + parquet footer caches, so the first
    // measured query doesn't carry session start-up cost
    spark.range(1000).selectExpr("sum(id)").queryExecution.toRdd.count()
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .limit(10).queryExecution.toRdd.count()
    // a failed query is recorded with a NEGATIVE elapsed time, listed in
    // "failed", excluded from the total, and fails the run's exit code —
    // a broken query must never masquerade as a fast one
    val results = SparkEntry.all.map { rq =>
      val t0 = System.nanoTime()
      val ok =
        try { rq.build(spark, sfDir).queryExecution.toRdd.count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${rq.name} failed: ${e.getMessage}")
          false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      (rq.name, if (ok) sec else -sec)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => k }
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}

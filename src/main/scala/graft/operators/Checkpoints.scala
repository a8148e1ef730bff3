package graft.operators

import org.apache.spark.sql.Dataset

/** Lineage truncation for iterative DataFrame loops (DataFrameCC,
  * GraphAnalytics.pagerankIntOn / labelPropagation) — the deployment
  * switch the r9 scaladoc comments promised, as a conf (VERDICT r9
  * item 5).
  *
  * Default (conf unset): `localCheckpoint(eager = true)` — blocks on the
  * executors, no lineage, fastest, and exactly right for local[N] where
  * "executor loss" is process death anyway.
  *
  * With `spark.graft.checkpoint.dir` set: RELIABLE `checkpoint(eager =
  * true)` to that directory (HDFS/S3 on a cluster) — a lost executor
  * recomputes from the checkpoint files instead of failing the job,
  * which is the contract a 1000-executor iterative job needs: without
  * it, one preempted container after round k of a 30-round loop kills
  * the whole computation (the truncated lineage cannot recompute).
  *
  * The SparkContext checkpoint dir is set lazily from the conf the first
  * time a truncation needs it (idempotent — `setCheckpointDir` creates a
  * run-unique subdirectory, so concurrent callers just create siblings).
  * Superseded rounds' reliable checkpoint directories are reclaimed by
  * the ContextCleaner when `spark.cleaner.referenceTracking.cleanCheckpoints`
  * is enabled; otherwise they are garbage a cluster job cleans at exit
  * (standard Spark checkpoint hygiene — noted, not hidden).
  */
object Checkpoints {

  /** Session conf key: empty/unset = localCheckpoint; a path = reliable
    * checkpoint rooted there.
    */
  val DirConf = "spark.graft.checkpoint.dir"

  /** Eagerly materialize `ds` with truncated lineage, per the conf. */
  def truncate[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    spark.conf.getOption(DirConf).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // setCheckpointDir appends a context-unique UUID subdir AND
        // resolves the path to a qualified URI (file:/... for a local
        // dir). Idempotence test: the current checkpoint dir's PARENT
        // must equal the qualified form of the conf dir. (Equality of the
        // full path would re-set — and re-create a sibling UUID dir — on
        // every round of every loop; the previous substring containment
        // silently skipped the re-set when the conf changed mid-session
        // to a path that happened to be a substring of the old qualified
        // dir, e.g. /data/ckpt → /data — ADVICE r10.)
        val p = new org.apache.hadoop.fs.Path(dir)
        val qualified =
          p.getFileSystem(sc.hadoopConfiguration).makeQualified(p).toString
        val already = sc.getCheckpointDir.exists { cur =>
          val parent = new org.apache.hadoop.fs.Path(cur).getParent
          parent != null && parent.toString == qualified
        }
        if (!already) sc.setCheckpointDir(dir)
        ds.checkpoint(eager = true)
      case None => ds.localCheckpoint(eager = true)
    }
  }
}

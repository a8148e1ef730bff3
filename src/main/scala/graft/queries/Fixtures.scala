package graft.queries

/** Shared /tmp fixture lifecycle helpers for queries that materialize
  * side tables (s4 partitioned copy, s5 bucketed tables, j5 stream
  * cache). ONE definition of the sweep-safety policy so a fix cannot
  * silently miss a copy.
  */
private[queries] object Fixtures {

  /** Recursive delete. */
  def rm(f: java.io.File): Unit = {
    Option(f.listFiles).getOrElse(Array.empty).foreach(rm)
    f.delete()
  }

  /** True when a fixture dir owned by `pid` is safe to sweep: ONLY when
    * the owning process is gone. No age-based escape hatch — a long-lived
    * JVM legitimately owns day-old fixtures (its catalog still points at
    * them), and deleting them under it trades a bounded leak for a live
    * FileNotFoundException. The cost: OS pid reuse can keep one dead
    * process's fixture alive until the impostor pid also exits — bounded
    * by /tmp's own lifecycle, accepted.
    */
  def sweepable(pid: Long): Boolean =
    !java.lang.ProcessHandle.of(pid).isPresent
}

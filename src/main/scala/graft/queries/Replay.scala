package graft.queries

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** The MemoryStream chunked-replay harness shared by every streaming
  * replay query (j1-j7) and the streaming specs: feed `data` in `chunks`
  * micro-batches through the query built by `mkQuery`, drain each batch
  * fully, and always stop the query. ONE definition of the replay
  * protocol (chunk sizing, per-batch drain, stop-on-error) — a fix to it
  * cannot silently miss one of the replay sites.
  */
private[graft] object Replay {

  /** `statePartitions`: shuffle-partition override while the streaming
    * query plans and runs. A keyed-state stream allocates one state-store
    * instance per shuffle partition PER MICRO-BATCH; with ~20 distinct
    * keys (sources/users) the session's fact-sized 32 is pure overhead —
    * sizing state partitions to key cardinality is the same
    * dimension-vs-fact decision as GraphAnalytics.GraphParts. The
    * session's setting is restored after the replay.
    */
  def chunked[A: Encoder](s: SparkSession, data: Seq[A], chunks: Int,
                          statePartitions: Option[Int] = None)(
      mkQuery: Dataset[A] => StreamingQuery): Unit = {
    implicit val sqlCtx = s.sqlContext
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(n =>
      s.conf.set("spark.sql.shuffle.partitions", n.toString))
    try {
      val mem = MemoryStream[A]
      val q = mkQuery(mem.toDS())
      try {
        data.grouped(data.length / chunks + 1).foreach { chunk =>
          mem.addData(chunk: _*)
          q.processAllAvailable()
        }
      } finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Two-stream variant for stream-stream joins: feed both sides in
    * LOCKSTEP (chunk i of each, then drain) so the two watermarks advance
    * together — each side is time-ordered, so no row is ever late
    * relative to its own stream and the join state holds rows exactly
    * until the global watermark proves them unmatchable.
    */
  def chunked2[A: Encoder, B: Encoder](s: SparkSession, a: Seq[A], b: Seq[B],
                                       chunks: Int,
                                       statePartitions: Option[Int] = None)(
      mkQuery: (Dataset[A], Dataset[B]) => StreamingQuery): Unit = {
    implicit val sqlCtx = s.sqlContext
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(n =>
      s.conf.set("spark.sql.shuffle.partitions", n.toString))
    try {
      val memA = MemoryStream[A]
      val memB = MemoryStream[B]
      val q = mkQuery(memA.toDS(), memB.toDS())
      try {
        val ca = a.grouped(a.length / chunks + 1).toSeq
        val cb = b.grouped(b.length / chunks + 1).toSeq
        (0 until math.max(ca.length, cb.length)).foreach { i =>
          if (i < ca.length) memA.addData(ca(i): _*)
          if (i < cb.length) memB.addData(cb(i): _*)
          q.processAllAvailable()
        }
      } finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }
}

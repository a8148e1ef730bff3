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

  def chunked[A: Encoder](s: SparkSession, data: Seq[A], chunks: Int)(
      mkQuery: Dataset[A] => StreamingQuery): Unit = {
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[A]
    val q = mkQuery(mem.toDS())
    try {
      data.grouped(data.length / chunks + 1).foreach { chunk =>
        mem.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators (SURVEY.md §2.J).
  *
  * The reference is strictly batch; its incremental behavior is cache
  * tables (get_pdb_parity.py:157-196). The natural streaming extension —
  * new PDB releases / new events arriving continuously — is expressed
  * here as plan-builders that work identically on a batch DataFrame and a
  * streaming one (`readStream`): the same code path, which is how the
  * engine keeps batch/stream parity testable.
  */
object StreamingOps {

  /** Tumbling-window aggregation with a watermark: the streaming form of
    * e2_hourly_agg. On a batch input the watermark is a no-op and the
    * result equals the batch groupBy — asserted in StreamingSpec.
    */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 1000).cast("long")).as("val_milli"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("val_milli"))
  }

  /** Incremental cache upsert (the C11 parity-cache pattern as a stream):
    * per micro-batch, left-anti against the cache to find new pairs —
    * the shape a `foreachBatch` sink runs to maintain the parity cache.
    */
  def newPairsAgainstCache(batch: DataFrame, cache: DataFrame): DataFrame =
    batch.join(cache, Seq("pair_key"), "left_anti")

  /** Per-user session state for sessionizeByGap. */
  final case class SessionState(lastUs: Long, nSessions: Long, nEvents: Long)
  final case class SessionCount(user_id: Long, n_sessions: Long,
                                n_events: Long)

  /** Custom-state sessionization via flatMapGroupsWithState: counts
    * 30-minute-gap sessions per user. The streaming form of the
    * e3_sessionize lag-window query — on a fully-ingested in-order stream
    * the outputs agree (asserted in StreamingSpec; e5's oracle gate runs
    * it cross-batch). Out-of-order arrival INSIDE a batch is handled by
    * sorting the group iterator; an event older than the state's
    * watermark-equivalent (`lastUs`) arriving in a LATER batch is late
    * data and is dropped — processing it would move `lastUs` backwards
    * and corrupt every subsequent gap computation.
    *
    * State lifecycle: pass `stateTtlMs > 0` to evict idle users via
    * ProcessingTimeTimeout — on an unbounded key space the default
    * NoTimeout grows state forever; a production deployment sets a TTL
    * comfortably above the session gap.
    */
  def sessionizeByGap(events: Dataset[(Long, Long)],
                      gapUs: Long = 1800000000L,
                      stateTtlMs: Long = 0L): Dataset[SessionCount] = {
    import events.sparkSession.implicits._
    val timeout =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionCount](
        OutputMode.Update(), timeout) {
        (user: Long, rows: Iterator[(Long, Long)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
            // drop late events (older than anything already processed)
            val sorted = rows.map(_._2).filter(_ >= st.lastUs).toSeq.sorted
            sorted.foreach { us =>
              val newSession = st.lastUs == Long.MinValue || us - st.lastUs > gapUs
              st = SessionState(us,
                st.nSessions + (if (newSession) 1L else 0L), st.nEvents + 1L)
            }
            state.update(st)
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            Iterator(SessionCount(user, st.nSessions, st.nEvents))
          }
      }
  }

  /** An admitted (source, doc) row from quotaAdmit. */
  final case class Admitted(source: String, doc_id: Long)

  /** Streaming per-key admission control — the t27 domain cap at
    * ingestion time: each source admits at most `cap` documents over the
    * stream's lifetime, in doc-id order (micro-batch groups are sorted,
    * so an in-order feed admits exactly the first `cap` ids per source).
    * State is ONE counter per source — constant-size regardless of
    * corpus, the only state shape that survives an unbounded crawl.
    * Deliberately NO state TTL, unlike sessionizeByGap: evicting an idle
    * source's counter would re-open its lifetime cap when it resumes;
    * bounding the key space is upstream source-normalization's job, and
    * a long per key costs nothing to keep.
    * Emitted in Append mode: an admitted doc is final, never revised.
    */
  def quotaAdmit(docs: Dataset[(Long, String)], cap: Int): Dataset[Admitted] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_._2)
      .flatMapGroupsWithState[Long, Admitted](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (src: String, rows: Iterator[(Long, String)],
         state: GroupState[Long]) =>
          val admitted = state.getOption.getOrElse(0L)
          val room = math.max(0L, cap - admitted).toInt
          // capped sources skip the sort/buffer entirely — on a crawl
          // whose traffic is dominated by over-quota domains, this is
          // the hot path
          if (room == 0) Iterator.empty
          else {
            val take = rows.map(_._1).toSeq.sorted.take(room)
            if (take.nonEmpty) state.update(admitted + take.length)
            take.iterator.map(Admitted(src, _))
          }
      }
  }
}
